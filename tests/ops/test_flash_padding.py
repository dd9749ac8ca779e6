"""Unaligned sequence lengths ride the flash kernel via segment-id padding
(`ops/attention.attend`): pad keys get seg=INT32_MAX so no real query sees
them, pad rows are sliced off, and gradients flow through the pad/slice.
578 is the real masked-context length of the 8-block pretrain mask config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vjepa2_tpu.ops.attention import attend
from vjepa2_tpu.ops.rope import build_rope_cache

B, N, H, D = 2, 578, 2, 64  # N % 8 != 0 -> padded to 584 inside attend


def _qkv(seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(B, N, H, D), jnp.float32)
    return mk(), mk(), mk()


def test_padded_flash_matches_xla():
    q, k, v = _qkv()
    pos = jnp.asarray(np.sort(np.random.RandomState(1).choice(2048, N, False)))
    cache = build_rope_cache(pos.astype(jnp.int32), D, 16, 16)
    ref = attend(q, k, v, rope_cache=cache, use_flash=False)
    with pltpu.force_tpu_interpret_mode():
        got = attend(q, k, v, rope_cache=cache, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_padded_flash_with_segments():
    q, k, v = _qkv(seed=2)
    seg = jnp.asarray(np.repeat(np.arange(2), [289, 289]), jnp.int32)
    ref = attend(q, k, v, segment_ids=seg, use_flash=False)
    with pltpu.force_tpu_interpret_mode():
        got = attend(q, k, v, segment_ids=seg, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)


def test_padded_flash_grads():
    q, k, v = _qkv(seed=3)
    w = jnp.asarray(np.random.RandomState(4).randn(B, N, H, D), jnp.float32)

    def loss(use_flash):
        def f(q, k, v):
            return jnp.sum(attend(q, k, v, use_flash=use_flash) * w)
        return f

    g_ref = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   err_msg=f"d{name}")


def test_small_unaligned_stays_on_xla():
    """Below MIN_FLASH_PAD_N the padded path must not engage (XLA is cheap
    there) — identical outputs prove the dispatch fell through."""
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(1, 173, 2, 64), jnp.float32)
    k = jnp.asarray(rs.randn(1, 173, 2, 64), jnp.float32)
    v = jnp.asarray(rs.randn(1, 173, 2, 64), jnp.float32)
    ref = attend(q, k, v, use_flash=False)
    with pltpu.force_tpu_interpret_mode():
        got = attend(q, k, v, use_flash=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
