"""Pallas attention kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.ops.attention import sdpa
from vjepa2_tpu.ops.flash_attention import flash_attention, supports


def test_flash_matches_xla():
    rng = np.random.RandomState(0)
    B, N, H, D = 2, 256, 3, 64
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_supports_gates():
    assert supports(2048, 64, has_mask=False, is_causal=False)
    assert not supports(2048, 64, has_mask=True, is_causal=False)
    assert not supports(2048, 64, has_mask=False, is_causal=True)
    assert not supports(18432 * 4, 128, has_mask=False, is_causal=False)  # KV too big for VMEM
