"""Attention dispatch: XLA fused SDPA now, Pallas flash-RoPE kernel optional.

Layout convention is BNHD ([batch, seq, heads, head_dim]) throughout — the
layout ``jax.nn.dot_product_attention`` consumes natively and the one that
keeps the MXU-facing matmuls contiguous on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: jnp.ndarray | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, N, H, Dh] tensors.

    attn_mask: broadcastable boolean mask, True = attend. Accepts [N, N],
    [B, N, N] or [B, H, N, N].

    use_flash: route through the Pallas kernel (forward-only — no VJP yet;
    safe on stop-gradient / inference paths). Falls back to XLA when the
    shape/mask isn't supported.
    """
    if use_flash and scale is None:
        from vjepa2_tpu.ops import flash_attention as fa

        n, d = q.shape[1], q.shape[-1]
        if fa.supports(n, d, attn_mask is not None, is_causal):
            return fa.flash_attention(q, k, v)
    if attn_mask is not None:
        while attn_mask.ndim < 4:
            attn_mask = attn_mask[None]
    return jax.nn.dot_product_attention(
        q, k, v, mask=attn_mask, is_causal=is_causal, scale=scale, implementation="xla"
    )
