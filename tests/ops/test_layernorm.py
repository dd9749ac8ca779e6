"""Fused LayerNorm kernel vs the plain fp32 formula (interpret mode) —
forward, gradients (dx, dgamma, dbeta), and the off-kernel fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops.layernorm import layer_norm


def _ref_ln(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((2, 64, 128), jnp.float32),
    ((2, 24, 256), jnp.bfloat16),
])
def test_forward_parity(shape, dtype):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), dtype)
    g = jnp.asarray(rs.rand(shape[-1]) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(shape[-1]) * 0.1, jnp.float32)
    got = layer_norm(x, g, b, interpret=True)
    ref = _ref_ln(x, g, b)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2)


def test_grad_parity():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 32, 128), jnp.float32)
    g = jnp.asarray(rs.rand(128) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    w = jnp.asarray(rs.randn(4, 32, 128), jnp.float32)

    def loss_fused(x, g, b):
        return jnp.sum(layer_norm(x, g, b, interpret=True) * w)

    def loss_ref(x, g, b):
        return jnp.sum(_ref_ln(x, g, b) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, r, name in zip(gf, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-3, err_msg=name)


def test_fallback_off_kernel():
    # C not a multiple of 128 -> XLA fallback, still correct + differentiable
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 96), jnp.float32)
    g = jnp.ones(96, jnp.float32)
    b = jnp.zeros(96, jnp.float32)
    got = layer_norm(x, g, b)
    ref = _ref_ln(x, g, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    jax.grad(lambda x: layer_norm(x, g, b).sum())(x)  # no error


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
