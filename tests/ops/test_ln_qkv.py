"""Fused LN+QKV(+RoPE) prologue kernel (`ops/ln_qkv.py`) vs its unfused XLA
reference — forward, full VJP (dx, dgamma, dbeta, dW, dbias), and the
off-kernel fallback. Reference neighborhood: `src/models/utils/modules.py`
Block.forward (``x + attn(norm1(x))`` with qkv projection + rotary)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops import ln_qkv as lq


def _args(B=2, N=64, C=128, H=4, D=16, dtype=jnp.float32, rope=True, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, N, C), dtype)
    gamma = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
    beta = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    w = jnp.asarray(rs.randn(C, 3 * H * D) * 0.05, dtype)
    bias = jnp.asarray(rs.randn(3 * H * D) * 0.02, jnp.float32)
    rp = None
    if rope:
        ang = rs.rand(1, N, D) * 6.28
        rp = (jnp.asarray(np.cos(ang), jnp.float32),
              jnp.asarray(np.sin(ang), jnp.float32))
    return x, gamma, beta, w, bias, rp, H, D


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rope", [False, True])
def test_forward_parity(dtype, rope):
    x, gamma, beta, w, bias, rp, H, D = _args(dtype=dtype, rope=rope)
    got = lq.ln_qkv(x, gamma, beta, w, bias, rope=rp, num_heads=H, head_dim=D,
                    interpret=True)
    ref = lq._xla_reference(x, gamma, beta, w, bias, rp, 1e-6, H, D)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    for g, r in zip(got, ref):
        assert g.shape == r.shape == (2, H, 64, D)
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32), atol=tol, rtol=tol)


def test_grad_parity():
    x, gamma, beta, w, bias, rp, H, D = _args(rope=True, seed=1)
    rs = np.random.RandomState(2)
    gq = jnp.asarray(rs.randn(2, H, 64, D), jnp.float32)
    gk = jnp.asarray(rs.randn(2, H, 64, D), jnp.float32)
    gv = jnp.asarray(rs.randn(2, H, 64, D), jnp.float32)

    def loss(fn):
        def f(x, gamma, beta, w, bias):
            q, k, v = fn(x, gamma, beta, w, bias)
            return (jnp.sum(q * gq) + jnp.sum(k * gk) + jnp.sum(v * gv))
        return f

    fused = loss(lambda *a: lq.ln_qkv(*a, rope=rp, num_heads=H, head_dim=D,
                                      interpret=True))
    ref = loss(lambda *a: lq._xla_reference(*a, rp, 1e-6, H, D))
    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, bias)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, bias)
    names = ["dx", "dgamma", "dbeta", "dW", "dbias"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-4, rtol=5e-4, err_msg=n)


def test_pick_block_hardware_legal():
    """Mosaic tiles the last two block dims only when (8k, 128k)-divisible
    or array-equal; the picker must never emit anything else (the old
    version returned 34 for n=306, which interpret mode accepts but the
    hardware compiler rejects)."""
    # sublane picker: multiples of 8, else array-equal, else 0
    assert lq._pick_block(256, 256) == 256
    assert lq._pick_block(304, 256) == 152      # 8*19 divides 304
    assert lq._pick_block(306, 256) == 0        # no 8-multiple divisor
    assert lq._pick_block(6, 256) == 6          # block == array is legal
    # lane picker: multiples of 128, else array-equal, else 0
    assert lq._pick_block_lane(512, 512) == 512
    assert lq._pick_block_lane(640, 512) == 128
    assert lq._pick_block_lane(306, 512) == 306  # array-equal
    assert lq._pick_block_lane(306 * 3, 512) == 0
    # supports() turns a 0 into the XLA fallback
    assert not lq.supports(2, 306, 128, 4, 16)
    # interpret mode still runs irregular N (block falls back to full axis)
    x, gamma, beta, w, bias, rp, H, D = _args(N=306, rope=False)
    q, k, v = lq.ln_qkv(x, gamma, beta, w, bias, num_heads=H, head_dim=D,
                        interpret=True)
    ref = lq._xla_reference(x, gamma, beta, w, bias, None, 1e-6, H, D)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref[0]), atol=2e-5)


def test_fallback_off_kernel():
    # N not block-decomposable / C not lane-aligned -> falls back to the
    # unfused formulation without error
    x, gamma, beta, w, bias, rp, H, D = _args(N=60, C=120, H=4, D=30,
                                              rope=False)
    q, k, v = lq.ln_qkv(x, gamma, beta, w, bias, num_heads=H, head_dim=D)
    ref = lq._xla_reference(x, gamma, beta, w, bias, None, 1e-6, H, D)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref[2]), atol=1e-5)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
