"""Ring attention (sequence/context parallel) on the 8-virtual-device CPU
mesh: parity with single-device attention, frame-causal segments, and
gradient flow through the ring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.core.mesh import MeshConfig, make_mesh
from vjepa2_tpu.ops.attention import sdpa
from vjepa2_tpu.ops.ring_attention import seq_sharded_attention


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 devices")
    return make_mesh(MeshConfig(data=jax.device_count() // 4, fsdp=1, model=4))


def _qkv(B=2, N=64, H=2, D=16, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(B, N, H, D), jnp.float32) for _ in range(3))


def test_ring_matches_full_attention(mesh):
    q, k, v = _qkv()
    ref = sdpa(q, k, v)
    apply = seq_sharded_attention(mesh, "model")
    out = jax.jit(apply)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_frame_causal_segments(mesh):
    B, N, H, D = 2, 64, 2, 16
    q, k, v = _qkv(B, N, H, D, seed=1)
    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 16)  # 4 frames x 16 tokens
    mask = seg[None, None, :, None] >= seg[None, None, None, :]
    ref = sdpa(q, k, v, attn_mask=mask)
    apply = seq_sharded_attention(mesh, "model")
    out = jax.jit(lambda a, b, c: apply(a, b, c, seg))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_gradients(mesh):
    q, k, v = _qkv(N=32, seed=2)
    w = jnp.asarray(np.random.RandomState(3).randn(*q.shape), jnp.float32)
    apply = seq_sharded_attention(mesh, "model")

    g_ring = jax.grad(lambda a, b, c: jnp.sum(apply(a, b, c) * w), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda a, b, c: jnp.sum(sdpa(a, b, c) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3, err_msg=f"d{name}"
        )
