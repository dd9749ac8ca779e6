"""Pallas fused LayerNorm (fp32 math, bf16 in/out, one HBM pass).

The model's LayerNorms compute in fp32 for parity with the reference
(eps 1e-6, `src/models/utils/modules.py`), which under XLA costs ~4x the
HBM floor: the bf16->fp32 materialization plus separate mean/var/normalize
passes measure ~0.31 ms per [8, 2048, 1024] call — 69 ms of a 537 ms
ViT-L pretrain step across ~224 instances (device trace, r3). This kernel
reads x once (bf16), does mean/var/normalize/affine in registers, writes
once.

Forward saves (mean, rstd) per row; the backward recomputes xhat from x
and emits dx in one pass plus per-grid-cell fp32 dgamma/dbeta partials
([cells, C]) that XLA sums — the same partial-accumulation trick as the
fused flash backward (dgamma needs a cross-row reduction that scratch
can't hold across a 1D grid).

Falls back to the plain XLA formula off-TPU (same `supports` gate as the
flash kernel).

STATUS: available but NOT wired into the models — measured on v5e, the
isolated op is ~2x faster than XLA's lowering, yet swapping it into every
model LayerNorm made the full ViT-L pretrain step ~6% slower (537 ->
569 ms): the custom call is an optimization barrier that breaks the
residual-add/convert fusions XLA builds around its own LN reduce. Kept
(with tests) for call sites where the LN does NOT sit inside a fusable
elementwise neighborhood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 512


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of ``n`` <= ``target`` that Mosaic can tile as a
    SUBLANE dim: a multiple of 8, or ``n`` itself (block == array is always
    legal). Returns 0 when neither exists — callers' ``supports()`` gates
    turn that into the XLA fallback. (An earlier picker could return e.g. 34
    for n=306 — a divisor that is neither 8-aligned nor array-equal, which
    interpret mode accepts but the hardware compiler rejects.) Canonical
    home of the helper; `ln_qkv`/`ln_mlp` import it from here."""
    best = 0
    for b in range(8, min(n, target) + 1, 8):
        if n % b == 0:
            best = b
    if best:
        return best
    return n if n <= target else 0


def _pick_block_lane(n: int, target: int) -> int:
    """Same for a LANE dim: a multiple of 128, or ``n`` itself."""
    best = 0
    for b in range(128, min(n, target) + 1, 128):
        if n % b == 0:
            best = b
    if best:
        return best
    return n if n <= target else 0


def _pick_rows(r: int, target: int = DEFAULT_BLOCK_ROWS) -> int:
    return _pick_block(r, target)


def ln_forward_f32(x, gamma, beta, eps):
    """The one fp32 LayerNorm forward formula (stats + affine) shared by the
    XLA fallbacks of `layer_norm`, `ln_qkv`, and `ln_mlp`.

    Returns (y_f32, mean, rstd) — y unconverted so callers pick the output
    dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y, mean, rstd


def ln_backward_f32(x, dy, gamma, mean, rstd):
    """The one LayerNorm backward formula given saved (mean, rstd) and an
    fp32 upstream cotangent ``dy`` w.r.t. LN's affine output.

    Returns fp32 (dx, dgamma, dbeta) with dgamma/dbeta reduced over all
    leading axes; callers cast to their param dtypes."""
    xhat = (x.astype(jnp.float32) - mean) * rstd
    wdy = dy * gamma.astype(jnp.float32)
    c1 = wdy.mean(-1, keepdims=True)
    c2 = (wdy * xhat).mean(-1, keepdims=True)
    dx = (wdy - c1 - xhat * c2) * rstd
    red = tuple(range(x.ndim - 1))
    return dx, (dy * xhat).sum(red), dy.sum(red)


def _ln_fwd_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [R, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _ln_bwd_kernel(x_ref, dy_ref, g_ref, mean_ref, rstd_ref,
                   dx_ref, dg_ref, db_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]
    xhat = (x - mean_ref[...]) * rstd
    wdy = dy * g
    c1 = jnp.mean(wdy, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    dx_ref[...] = ((wdy - c1 - xhat * c2) * rstd).astype(dx_ref.dtype)
    # partials ride in 8-row blocks (sublane tile; a (1, C) block is not a
    # legal Mosaic tiling — interpret mode does not enforce this): the sum
    # lands in row 0, rows 1-7 are zero and wash out in the XLA sum
    dg_ref[...] = jnp.pad(jnp.sum(dy * xhat, axis=0, keepdims=True), ((0, 7), (0, 0)))
    db_ref[...] = jnp.pad(jnp.sum(dy, axis=0, keepdims=True), ((0, 7), (0, 0)))


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def _ln_fwd(x2, gamma, beta, eps, block_rows, interpret):
    R, C = x2.shape
    grid = (R // block_rows,)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), x2.dtype),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2, gamma[None], beta[None])
    return out, mean, rstd


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def _ln_bwd(x2, dy2, gamma, mean, rstd, eps, block_rows, interpret):
    R, C = x2.shape
    cells = R // block_rows
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, C), x2.dtype),
            jax.ShapeDtypeStruct((cells * 8, C), jnp.float32),
            jax.ShapeDtypeStruct((cells * 8, C), jnp.float32),
        ],
        interpret=interpret,
    )(x2, dy2, gamma[None], mean, rstd)
    return dx, dgp.sum(0), dbp.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_core(x2, gamma, beta, eps, block_rows, interpret):
    out, _, _ = _ln_fwd(x2, gamma, beta, eps, block_rows, interpret)
    return out


def _ln_core_fwd(x2, gamma, beta, eps, block_rows, interpret):
    out, mean, rstd = _ln_fwd(x2, gamma, beta, eps, block_rows, interpret)
    return out, (x2, gamma, mean, rstd)


def _ln_core_bwd(eps, block_rows, interpret, res, dy):
    x2, gamma, mean, rstd = res
    dx, dg, db = _ln_bwd(x2, dy, gamma, mean, rstd, eps, block_rows, interpret)
    return dx, dg.astype(gamma.dtype), db.astype(gamma.dtype)


_ln_core.defvjp(_ln_core_fwd, _ln_core_bwd)


def supports(r: int, c: int) -> bool:
    from vjepa2_tpu.ops.flash_attention import _mosaic_available

    if not _mosaic_available():
        return False
    if c % 128 != 0:  # lane tile; the model dims (384..1664) all qualify
        return False
    return _pick_rows(r) >= 8


def layer_norm(x, gamma, beta, eps: float = 1e-6, interpret: bool = False):
    """Fused LayerNorm over the last axis. x [..., C]; gamma/beta [C].

    fp32 statistics and affine regardless of x.dtype (output in x.dtype),
    matching the model's fp32-LayerNorm convention. Differentiable; falls
    back to the plain XLA formula when the kernel can't run.
    """
    C = x.shape[-1]
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    if not supports(R, C) and not interpret:
        y, _, _ = ln_forward_f32(x, gamma, beta, eps)
        return y.astype(x.dtype)
    # `or R`: interpret mode bypasses supports(), and _pick_rows returns 0
    # when no hardware-legal block exists — any block is legal interpreted.
    block_rows = _pick_rows(R) or R
    out = _ln_core(x.reshape(R, C), gamma, beta, eps, block_rows, interpret)
    return out.reshape(*lead, C)
