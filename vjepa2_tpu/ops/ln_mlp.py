"""Fused LayerNorm + MLP-in projection + exact GELU prologue.

Reference neighborhood: `src/models/utils/modules.py` Block.forward —
``x + mlp(norm2(x))`` with ``Mlp.fc1`` and ``nn.GELU()`` (exact, erf-based).
Sibling of `ops/ln_qkv.py` (the pre-attention LN+QKV+RoPE prologue): the r3
device trace put the LayerNorm family at ~110 ms of a 557 ms ViT-L pretrain
step, split across the two per-block LN instances. ln_qkv covers norm1;
this kernel covers norm2's neighborhood:

    x (bf16, pre-LN) -> [pallas] LN (fp32 stats) -> y @ W_fc1 + b
                      -> gelu_exact -> h [B, N, hidden]

so the LN intermediate AND the pre-GELU activation never exist in HBM (the
pre-GELU z is hidden-dim wide — 4x the residual stream — so skipping its
round trip is most of the win). The hidden dim is tiled onto the grid
(W_fc1 for ViT-g is [1408, 6144] ~ 17 MB bf16, over the 16 MB scoped-VMEM
budget in one piece); LN stats are recomputed per hidden block — VPU work
that overlaps the weight DMA.

The backward (custom VJP) is plain XLA like ln_qkv's: dW/dy matmuls are
MXU-friendly there, z is recomputed from the saved LN stats (one extra
matmul, standard flash-style rematerialization), and the LN backward
reduces run once per instance.

STATUS: wired behind `models.modules.FUSE_LN_MLP` (default off) pending the
step-level A/B on hardware (`scripts/probe_ln_qkv_step.py` sweeps both
fusion flags) — the standalone pallas LayerNorm (`ops/layernorm.py`) LOST
step time to fusion breakage, so no prologue ships without a measured win.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vjepa2_tpu.ops.layernorm import (
    _pick_block, _pick_block_lane, ln_backward_f32, ln_forward_f32,
)

DEFAULT_BLOCK_N = 256
DEFAULT_BLOCK_H = 512

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_exact(z):
    """0.5 * z * (1 + erf(z / sqrt(2))) on fp32 — `nn.gelu(approximate=False)`."""
    return 0.5 * z * (1.0 + jax.lax.erf(z * _INV_SQRT2))


def _erf_poly(x):
    """Abramowitz–Stegun 7.1.26 rational-polynomial erf, |err| <= 1.5e-7.

    Mosaic has no `erf` lowering (NotImplementedError on real TPU; interpret
    mode never catches it), so the kernel computes erf from exp + arithmetic.
    The 1.5e-7 absolute error is ~50x below fp32 GELU round-off at |z|~1 and
    vanishes entirely under the kernel's bf16 output cast.
    """
    s = jnp.where(x < 0.0, -1.0, 1.0)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
             + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact_mosaic(z):
    """Kernel-side `_gelu_exact` via `_erf_poly` (see its docstring)."""
    return 0.5 * z * (1.0 + _erf_poly(z * _INV_SQRT2))


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref,
                   h_ref, mean_ref, rstd_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # [BLK_N, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    # same (bi, ni) stats are rewritten identically per hidden block — the
    # block stays resident in VMEM across the consecutive hi steps
    mean_ref[0] = mean
    rstd_ref[0] = rstd

    z = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_N, BLK_H]
    z = z + bias_ref[0]
    h_ref[0] = _gelu_exact_mosaic(z).astype(h_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_n", "block_h", "interpret")
)
def _ln_mlp_fwd(x, gamma, beta, w, bias, eps, block_n, block_h, interpret):
    B, N, C = x.shape
    hidden = w.shape[1]
    grid = (B, N // block_n, hidden // block_h)
    h, mean, rstd = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda bi, ni, hi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ni, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block_h), lambda bi, ni, hi: (0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda bi, ni, hi: (0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, block_h), lambda bi, ni, hi: (bi, ni, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, 1), lambda bi, ni, hi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, 1), lambda bi, ni, hi: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, hidden), x.dtype),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, gamma[None], beta[None], w, bias[None])
    return h, mean, rstd


def _xla_reference(x, gamma, beta, w, bias, eps):
    """Unfused formulation (identical math) for off-TPU and small shapes."""
    y = ln_forward_f32(x, gamma, beta, eps)[0].astype(x.dtype)
    z = jnp.einsum("bnc,ck->bnk", y, w,
                   preferred_element_type=jnp.float32) + bias
    return _gelu_exact(z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_mlp_core(x, gamma, beta, w, bias, eps, block_n, block_h, interpret):
    h, _, _ = _ln_mlp_fwd(x, gamma, beta, w, bias, eps, block_n, block_h,
                          interpret)
    return h


def _core_fwd(x, gamma, beta, w, bias, eps, block_n, block_h, interpret):
    h, mean, rstd = _ln_mlp_fwd(x, gamma, beta, w, bias, eps, block_n,
                                block_h, interpret)
    return h, (x, gamma, beta, w, bias, mean, rstd)


def _core_bwd(eps, block_n, block_h, interpret, res, dh):
    x, gamma, beta, w, bias, mean, rstd = res
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * rstd  # recomputed from the tiny saved stats
    gf = gamma.astype(jnp.float32)
    y = (xhat * gf + beta.astype(jnp.float32)).astype(x.dtype)

    # recompute z exactly as the kernel produced it (bf16 MXU, fp32 out)
    z = jnp.einsum("bnc,ck->bnk", y, w,
                   preferred_element_type=jnp.float32) + bias
    # d/dz gelu_exact = Phi(z) + z * phi(z)
    dgelu = (0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT2))
             + z * jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI)
    dz = dh.astype(jnp.float32) * dgelu

    dbias = dz.sum((0, 1))
    dw = jnp.einsum("bnc,bnk->ck", y, dz.astype(x.dtype)).astype(w.dtype)
    dy = jnp.einsum("bnk,ck->bnc", dz.astype(x.dtype), w).astype(jnp.float32)

    dx, dgamma, dbeta = ln_backward_f32(x, dy, gamma, mean, rstd)
    return (dx.astype(x.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw, dbias.astype(jnp.float32))


_ln_mlp_core.defvjp(_core_fwd, _core_bwd)


def supports(batch: int, n: int, c: int, hidden: int) -> bool:
    from vjepa2_tpu.ops.flash_attention import _mosaic_available

    if not _mosaic_available():
        return False
    if c % 128 != 0 or hidden % 128 != 0:
        return False
    return (_pick_block(n, DEFAULT_BLOCK_N) >= 8
            and _pick_block_lane(hidden, DEFAULT_BLOCK_H) >= 128)


def ln_mlp(x, gamma, beta, w, bias, eps: float = 1e-6,
           block_n: int = DEFAULT_BLOCK_N, block_h: int = DEFAULT_BLOCK_H,
           interpret: bool = False):
    """gelu_exact(LN(x) @ W_fc1 + b) with LN stats in fp32.

    x: [B, N, C] (any float dtype); gamma/beta: [C] fp32; w: [C, hidden]
    (matmul runs in w.dtype — pass bf16 for the MXU path); bias: [hidden]
    fp32. Returns h: [B, N, hidden] in x.dtype. Differentiable.
    """
    B, N, C = x.shape
    hidden = w.shape[1]
    if (not supports(B, N, C, hidden)) and not interpret:
        return _xla_reference(x, gamma, beta, w, bias, eps)
    # `or N`/`or hidden`: interpret mode bypasses supports(); 0 means "no
    # hardware-legal block", but any block is legal interpreted.
    bn = _pick_block(N, block_n) or N
    bh = _pick_block_lane(hidden, block_h) or hidden
    return _ln_mlp_core(
        x, gamma.astype(jnp.float32), beta.astype(jnp.float32), w,
        bias.astype(jnp.float32), eps, bn, bh, interpret,
    )
