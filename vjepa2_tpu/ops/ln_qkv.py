"""Fused LayerNorm + QKV projection (+ RoPE) prologue for flash attention.

Reference neighborhood: `src/models/utils/modules.py` Block.forward —
``x + attn(norm1(x))`` with attention's qkv projection and rotary embedding.
Under XLA the pre-attention LayerNorm costs ~4x its HBM floor and its
backward adds two more big reduces per instance; across the ViT-L pretrain
step the LN family measured ~110 ms of a 557 ms step (r3 device trace:
70 ms `convert_reduce_fusion` fwd + 40 ms `reduce_sum` bwd). A standalone
pallas LN LOST time end-to-end (ops/layernorm.py STATUS note): the custom
call breaks the fusions XLA builds around its own LN. This kernel moves the
whole neighborhood instead:

    x (bf16, pre-LN) -> [pallas] LN (fp32 stats) -> y @ W_qkv + b
                       -> split-half RoPE on q/k -> q, k, v [B, H, N, D]

so the boundary is clean: XLA sees one opaque producer of q/k/v (exactly
what the flash kernel consumes) and the LN intermediate never exists in
HBM. With rotation done here, the flash kernel runs rope-free, which also
lifts its in-kernel table cost and VMEM cap.

The backward (custom VJP) is plain XLA: matmuls (dW, dy) are MXU-friendly
there, and the LN backward reduces run once per layer instead of being
re-fused badly. `w`/`b` arrive pre-concatenated [C, 3*H*D] / [3*H*D] with
any head permutation already folded in (the caller's split-half rope
layout), so dW flows back through the same static permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vjepa2_tpu.ops.flash_attention import _rope_rotate, _rope_rotate_t

DEFAULT_BLOCK_N = 256


# Canonical implementations live in ops/layernorm.py (shared with ln_mlp);
# re-exported here because tests and ln_mlp historically import them from
# this module.
from vjepa2_tpu.ops.layernorm import (  # noqa: E402
    _pick_block, _pick_block_lane, ln_backward_f32, ln_forward_f32,
)


def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, cos_ref, sin_ref,
                   q_ref, k_ref, v_ref, mean_ref, rstd_ref,
                   *, eps: float, num_heads: int, head_dim: int,
                   use_rope: bool):
    x = x_ref[0].astype(jnp.float32)  # [BLK_N, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    mean_ref[0] = mean
    rstd_ref[0] = rstd

    qkv = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BLK_N, 3*H*D]
    qkv = qkv + bias_ref[0]

    hd = num_heads * head_dim
    if use_rope:
        cos = cos_ref[0]  # [BLK_N, D]
        sin = sin_ref[0]

    # Per-head lane slices instead of a [BLK_N, 3HD] -> [BLK_N, H, D]
    # reshape: Mosaic's infer-vector-layout rejects lane-splitting shape
    # casts ("unsupported shape cast" on real TPU; interpret mode accepts
    # them), but static lane slices at sub-128 offsets lower fine — the
    # flash kernel's in-kernel split-half RoPE relies on the same pattern.
    for i, ref in enumerate((q_ref, k_ref, v_ref)):
        for h in range(num_heads):
            off = i * hd + h * head_dim
            part = qkv[:, off:off + head_dim]  # [BLK_N, D]
            if use_rope and i < 2:
                part = _rope_rotate(part, cos, sin)
            ref[0, h] = part.astype(ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "num_heads", "head_dim", "block_n", "interpret"),
)
def _ln_qkv_fwd(x, gamma, beta, w, bias, cos, sin,
                eps, num_heads, head_dim, block_n, interpret):
    B, N, C = x.shape
    H, D = num_heads, head_dim
    use_rope = cos is not None
    if cos is None:
        cos = sin = jnp.zeros((1, N, D), jnp.float32)
    # a [1, N, D] table broadcasts over batch via the `bi % tb` index map
    tb = cos.shape[0]

    grid = (B, N // block_n)
    qkv_specs = [
        pl.BlockSpec((1, H, block_n, D), lambda bi, ni: (bi, 0, ni, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    out, outk, outv, mean, rstd = pl.pallas_call(
        functools.partial(
            _ln_qkv_kernel, eps=eps, num_heads=H, head_dim=D,
            use_rope=use_rope,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, C), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bi, ni: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * H * D), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H * D), lambda bi, ni: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, D), lambda bi, ni, tb=tb: (bi % tb, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, D), lambda bi, ni, tb=tb: (bi % tb, ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_specs + [
            pl.BlockSpec((1, block_n, 1), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, 1), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, gamma[None], beta[None], w, bias[None], cos, sin)
    return out, outk, outv, mean, rstd


def _xla_reference(x, gamma, beta, w, bias, rope, eps, num_heads, head_dim):
    """Unfused formulation (identical math) for off-TPU and the VJP."""
    B, N, C = x.shape
    H, D = num_heads, head_dim
    y = ln_forward_f32(x, gamma, beta, eps)[0].astype(x.dtype)
    # fp32 accumulation to match the kernel's dot_general
    # (preferred_element_type), not a bf16 round-trip before the upcast
    qkv = jnp.einsum("bnc,ck->bnk", y, w,
                     preferred_element_type=jnp.float32) + bias
    q, k, v = (
        qkv[..., i * H * D:(i + 1) * H * D].reshape(B, N, H, D).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    if rope is not None:
        cos, sin = rope
        q = _rope_rotate(q, cos[:, None], sin[:, None])
        k = _rope_rotate(k, cos[:, None], sin[:, None])
    return q.astype(x.dtype), k.astype(x.dtype), v.astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def _ln_qkv_core(x, gamma, beta, w, bias, cos, sin,
                 eps, num_heads, head_dim, block_n, interpret):
    q, k, v, _, _ = _ln_qkv_fwd(x, gamma, beta, w, bias, cos, sin,
                                eps, num_heads, head_dim, block_n, interpret)
    return q, k, v


def _core_fwd(x, gamma, beta, w, bias, cos, sin,
              eps, num_heads, head_dim, block_n, interpret):
    q, k, v, mean, rstd = _ln_qkv_fwd(x, gamma, beta, w, bias, cos, sin,
                                      eps, num_heads, head_dim, block_n,
                                      interpret)
    return (q, k, v), (x, gamma, beta, w, cos, sin, mean, rstd)


def _core_bwd(eps, num_heads, head_dim, block_n, interpret, res, grads):
    x, gamma, beta, w, cos, sin, mean, rstd = res
    dq, dk, dv = grads
    B, N, C = x.shape
    H, D = num_heads, head_dim
    use_rope = cos is not None

    if use_rope:
        # adjoint of the split-half rotation (the pair slots carry different
        # angles under the reference's tiled-frequency quirk: see
        # `flash_attention._rope_rotate_t`)
        dq = _rope_rotate_t(dq.astype(jnp.float32), cos[:, None], sin[:, None])
        dk = _rope_rotate_t(dk.astype(jnp.float32), cos[:, None], sin[:, None])

    def flat(g):  # [B, H, N, D] -> [B, N, H*D]
        return g.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    dqkv = jnp.concatenate(
        [flat(dq).astype(jnp.float32), flat(dk).astype(jnp.float32),
         flat(dv).astype(jnp.float32)], axis=-1
    )  # [B, N, 3HD] fp32

    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * rstd  # recomputed from the tiny saved stats
    gf = gamma.astype(jnp.float32)
    y = xhat * gf + beta.astype(jnp.float32)

    dbias = dqkv.sum((0, 1))
    dw = jnp.einsum("bnc,bnk->ck", y.astype(x.dtype),
                    dqkv.astype(x.dtype)).astype(w.dtype)
    dy = jnp.einsum("bnk,ck->bnc", dqkv.astype(x.dtype), w).astype(jnp.float32)

    dx, dgamma, dbeta = ln_backward_f32(x, dy, gamma, mean, rstd)
    dx = dx.astype(x.dtype)
    dgamma = dgamma.astype(gamma.dtype)
    dbeta = dbeta.astype(beta.dtype)

    zc = jnp.zeros_like(cos) if cos is not None else None
    zs = jnp.zeros_like(sin) if sin is not None else None
    return dx, dgamma, dbeta, dw, dbias.astype(jnp.float32), zc, zs


_ln_qkv_core.defvjp(_core_fwd, _core_bwd)


def supports(batch: int, n: int, c: int, num_heads: int, head_dim: int) -> bool:
    from vjepa2_tpu.ops.flash_attention import _mosaic_available

    if not _mosaic_available():
        return False
    if c % 128 != 0 or (3 * num_heads * head_dim) % 128 != 0:
        return False
    if head_dim % 8 != 0:
        return False
    return _pick_block(n, DEFAULT_BLOCK_N) >= 8


def ln_qkv(x, gamma, beta, w, bias, rope=None, eps: float = 1e-6,
           num_heads: int | None = None, head_dim: int | None = None,
           block_n: int = DEFAULT_BLOCK_N, interpret: bool = False):
    """LN(x) @ W_qkv + b, split into per-head q/k/v with optional RoPE.

    x: [B, N, C] (any float dtype; LN stats in fp32); gamma/beta: [C] fp32;
    w: [C, 3*H*D] (columns ordered [q | k | v], head-permuted by the caller
    if rope uses the split-half layout); bias: [3*H*D] fp32;
    rope: (cos, sin) split-half tables [B|1, N, D] fp32 (pre-expanded, see
    `flash_attention.expand_rope_cache`) — q/k are returned ROTATED.

    Returns q, k, v: [B, H, N, D] in x.dtype. Differentiable.
    """
    B, N, C = x.shape
    assert num_heads is not None and head_dim is not None
    cos, sin = (None, None) if rope is None else rope
    if cos is not None and cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    if (not supports(B, N, C, num_heads, head_dim)) and not interpret:
        return _xla_reference(x, gamma, beta, w, bias,
                              None if cos is None else (cos, sin),
                              eps, num_heads, head_dim)
    # `or N`: interpret mode bypasses supports(), and _pick_block returns 0
    # when no hardware-legal block exists — any block is legal interpreted.
    bn = _pick_block(N, block_n) or N
    return _ln_qkv_core(
        x, gamma.astype(jnp.float32), beta.astype(jnp.float32), w,
        bias.astype(jnp.float32), cos, sin,
        eps, num_heads, head_dim, bn, interpret,
    )
