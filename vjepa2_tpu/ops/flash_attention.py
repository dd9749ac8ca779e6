"""Pallas TPU attention kernel (forward).

For V-JEPA 2 sequence lengths (<= ~8k tokens: 16f@256px -> 2048, 64f@384px
-> 18k handled by the XLA fallback until the streaming variant lands), K and
V for one (batch, head) fit in VMEM, so each program computes one Q tile
against the *full* K/V: scores and softmax never touch HBM — the win over
XLA SDPA, which materializes the [N, N] probabilities per head.

Layout: q, k, v as [B, H, N, D] (transposed from the model's BNHD outside).
fp32 accumulation on the MXU, output in the input dtype.

Used on the no-gradient paths (target encoder, frozen evals, planning
rollouts, bench encode); the training path keeps XLA SDPA until the custom
VJP lands (see `sdpa`'s ``implementation`` arg in `ops.attention`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q_ref: [BLK_Q, D]; k_ref/v_ref: [N, D]; o_ref: [BLK_Q, D]
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BLK_Q, N]
    scores = scores * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: [B, H, N, D] -> [B, H, N, D]."""
    B, H, N, D = q.shape
    scale = 1.0 / (D**0.5)
    block_q = min(block_q, N)
    assert N % block_q == 0, f"N={N} not divisible by block_q={block_q}"

    q3 = q.reshape(B * H, N, D)
    k3 = k.reshape(B * H, N, D)
    v3 = v.reshape(B * H, N, D)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H, N // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        interpret=interpret,
    )(q3, k3, v3)
    return out.reshape(B, H, N, D)


def flash_attention(q, k, v, block_q: int = 256, interpret: bool = False):
    """BNHD convenience wrapper: q, k, v [B, N, H, D] -> [B, N, H, D]."""
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = flash_attention_bhnd(qt, kt, vt, block_q=block_q, interpret=interpret)
    return out.transpose(0, 2, 1, 3)


def supports(n: int, d: int, has_mask: bool, is_causal: bool, block_q: int = 256) -> bool:
    """Shapes/features the kernel currently handles."""
    if has_mask or is_causal:
        return False
    if n % min(block_q, n) != 0:
        return False
    # full-K/V-in-VMEM budget (~16MB/core; keep headroom)
    kv_bytes = 2 * n * d * 4
    return kv_bytes < 6 * 1024 * 1024
