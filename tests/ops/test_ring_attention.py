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


def test_ring_pads_non_divisible(mesh):
    """r3: sequences that don't divide the ring are padded ONTO it (not
    silently replicated as local attention). N=60 on a 4-ring pads to 64."""
    B, N, H, D = 2, 60, 2, 16
    q, k, v = _qkv(B, N, H, D, seed=4)
    ref = sdpa(q, k, v)
    apply = seq_sharded_attention(mesh, "model")
    out = jax.jit(apply)(q, k, v)
    assert out.shape == (B, N, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    w = jnp.asarray(np.random.RandomState(5).randn(B, N, H, D), jnp.float32)
    g_ring = jax.grad(lambda a: jnp.sum(apply(a, k, v) * w))(q)
    g_ref = jax.grad(lambda a: jnp.sum(sdpa(a, k, v) * w))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=1e-4, rtol=1e-3)


def test_ring_flash_hops_interpret(mesh):
    """r3: each hop runs the Pallas flash kernel when supported — verified in
    interpret mode on the CPU mesh, fwd and bwd, vs the XLA reference."""
    from jax.experimental.pallas import tpu as pltpu

    B, N, H, D = 2, 64, 2, 16
    q, k, v = _qkv(B, N, H, D, seed=6)
    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 16)
    mask = seg[None, None, :, None] >= seg[None, None, None, :]
    ref = sdpa(q, k, v, attn_mask=mask)
    # kernel hops are opt-in off-TPU (the default falls back to XLA so
    # interpret mode doesn't crawl through whole-model rings)
    apply = seq_sharded_attention(mesh, "model", use_kernel=True)
    with pltpu.force_tpu_interpret_mode():
        from vjepa2_tpu.ops.ring_attention import _hop_supported

        assert _hop_supported(N // 4, D)  # kernel path engaged
        out = jax.jit(lambda a, b, c: apply(a, b, c, seg))(q, k, v)
        w = jnp.asarray(np.random.RandomState(7).randn(B, N, H, D), jnp.float32)
        g_ring = jax.grad(lambda a: jnp.sum(apply(a, k, v, seg) * w))(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    g_ref = jax.grad(lambda a: jnp.sum(sdpa(a, k, v, attn_mask=mask) * w))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref), atol=1e-4, rtol=1e-3)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]


def test_ring_attach_structure_parity(mesh):
    """Saveable-residual ring structure == fused-custom-vjp ring grads, and
    policy remat around the ring changes scheduling, not math."""
    import vjepa2_tpu.ops.flash_attention as fa
    from vjepa2_tpu.models.modules import resolve_remat_policy

    q, k, v = _qkv(N=32, seed=8)
    w = jnp.asarray(np.random.RandomState(9).randn(*q.shape), jnp.float32)
    apply = seq_sharded_attention(mesh, "model")

    def loss(a, b, c):
        return jnp.sum(apply(a, b, c) * w)

    old = fa.SAVEABLE_RESIDUALS
    try:
        fa.SAVEABLE_RESIDUALS = False
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        fa.SAVEABLE_RESIDUALS = True
        g_new = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_new, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6,
                                       err_msg=f"d{name}")
        ck = jax.checkpoint(loss, policy=resolve_remat_policy("save_attn"))
        g_ck = jax.grad(ck, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_ck, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"remat d{name}")
    finally:
        fa.SAVEABLE_RESIDUALS = old
