"""Attention dispatch: manual fused XLA path (default), Pallas kernel optional.

Layout convention is BNHD ([batch, seq, heads, head_dim]) throughout.

The default path computes scores with fp32 accumulation, a numerically
stable softmax in fp32, and casts the probabilities to the compute dtype
before the value matmul — measured ~4x faster than
``jax.nn.dot_product_attention(implementation="xla")`` at V-JEPA shapes on
v5e (the library path materializes fp32 probabilities and extra layout
transposes), with identical outputs at bf16 resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _manual_sdpa(q, k, v, attn_mask, is_causal, scale):
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    if is_causal:
        causal = jnp.tril(jnp.ones((N, M), bool))
        attn_mask = causal if attn_mask is None else jnp.logical_and(attn_mask, causal)
    if attn_mask is not None:
        while attn_mask.ndim < 4:
            attn_mask = attn_mask[None]
        s = jnp.where(attn_mask, s, jnp.float32(-1e30))
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: jnp.ndarray | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    use_flash: bool = False,
    implementation: str = "fused",
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, N, H, Dh] tensors.

    attn_mask: broadcastable boolean mask, True = attend. Accepts [N, N],
    [B, N, N] or [B, H, N, N].

    use_flash: route through the Pallas kernel (streaming forward + custom
    flash VJP). Falls back when the shape/mask isn't supported.
    implementation="library" selects jax.nn.dot_product_attention instead
    of the fused manual path.
    """
    if use_flash and scale is None and attn_mask is None and not is_causal:
        from vjepa2_tpu.ops import flash_attention as fa

        n, d = q.shape[1], q.shape[-1]
        if fa.supports(n, d, False, False):
            return fa.flash_attention(q, k, v)
    if implementation == "library":
        if attn_mask is not None:
            while attn_mask.ndim < 4:
                attn_mask = attn_mask[None]
        return jax.nn.dot_product_attention(
            q, k, v, mask=attn_mask, is_causal=is_causal, scale=scale, implementation="xla"
        )
    return _manual_sdpa(q, k, v, attn_mask, is_causal, scale)


MIN_FLASH_PAD_N = 512  # below this the N^2 matrices are cheap; skip padding


def _flash_pad_plan(n: int, d: int, has_seg: bool, dn_caller: bool = False):
    """Shared pad/dispatch decision for `attend`/`attend_bhnd` and the
    model-level stack-pad sizing.

    Padding amount is a free choice: more pad can buy a much better block
    factorization (1623 -> 1624 only factors as 232-wide blocks and LOSES to
    XLA; 1623 -> 1664 runs 832-wide blocks and wins by ~25%). Take the
    smallest pad whose padded length admits a >=512 block, searching up to
    +128 extra rows (<8% waste at these sizes). Returns (use_kernel, pad).

    dn_caller: True only for callers whose attention will route the
    DN-layout kernel when eligible (the model stack-pad sizing in
    `vision_transformer`/`predictor`, whose Attention modules carry the DN
    gate). DN puts N in the LANE dim, where blocks must be x128 or
    array-equal — so the pad target there is the x8 sublane step only while
    the full-N plan fits the score cap, else the next multiple of 128
    (1623 -> 1664, 2.5% waste). `attend`/`attend_bhnd` always run the BHND
    kernels and must NOT take this shortcut: an x8/x128 pad skips the
    block-factorization search their blocks need.
    """
    from vjepa2_tpu.ops import flash_attention as fa

    from vjepa2_tpu.ops import flash_attention_dn as fdn

    if dn_caller and fdn.dn_head_eligible(d) and not has_seg:
        from vjepa2_tpu.models.modules import NARROW_DN  # the A/B knob

        if NARROW_DN and fdn._mosaic_available():
            pad = (-n) % 8
            if not fdn.supports_dn(n + pad, d):
                pad = (-n) % 128
            if (
                fdn.supports_dn(n + pad, d)
                # callers that stay on the BHND kernel (attend/attend_bhnd
                # with this plan) must also be shape-supported there
                and fa.supports(n + pad, d, has_seg or pad > 0, False)
                and (pad == 0 or n >= MIN_FLASH_PAD_N)
            ):
                return True, pad

    pad = (-n) % 8
    if pad or fa.pick_block(n, fa.DEFAULT_BLOCK_Q) < 512:
        best = (pad, fa.pick_block(n + pad, fa.DEFAULT_BLOCK_Q))
        for extra in range(pad, pad + 129, 8):
            blk = fa.pick_block(n + extra, fa.DEFAULT_BLOCK_Q)
            if blk > best[1]:
                best = (extra, blk)
            if best[1] >= 512:
                break
        pad = best[0]
    use_kernel = fa.supports(n + pad, d, has_seg or pad > 0, False) and (
        pad == 0 or n >= MIN_FLASH_PAD_N
    )
    return use_kernel, pad


def _pad_flash_operands(q, k, v, segment_ids, rope_cache, pad: int, seq_axis: int):
    """Pad q/k/v (along ``seq_axis``), segment ids and rope tables for the
    kernel; callers slice the pad rows off the output.

    Pad-only calls (no real segment ids) return seg=None and rely on the
    kernel's static ``kv_valid_len`` tail mask — masking work only in the
    boundary kv block, and no fp32 segment side-inputs (r3: the segment
    machinery cost +0.85 ms/call at the encoder shape). With real segment
    ids, pad keys get int32-max so no real query attends to them."""
    B = q.shape[0]
    n = q.shape[seq_axis]
    seg = segment_ids
    if seg is not None:
        if seg.ndim == 1:
            seg = jnp.broadcast_to(seg[None], (B, n))
        seg = seg.astype(jnp.int32)
    rc = rope_cache
    if pad:
        widths = [(0, 0)] * q.ndim
        widths[seq_axis] = (0, pad)
        zpad = lambda x: jnp.pad(x, widths)
        q, k, v = zpad(q), zpad(k), zpad(v)
        if seg is not None:
            seg = jnp.pad(seg, ((0, 0), (0, pad)),
                          constant_values=jnp.iinfo(jnp.int32).max)
        if rc is not None:
            cos, sin = rc
            w = ((0, pad), (0, 0)) if cos.ndim == 2 else ((0, 0), (0, pad), (0, 0))
            rc = (jnp.pad(cos, w), jnp.pad(sin, w))
    return q, k, v, seg, rc


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rope_cache=None,
    segment_ids: jnp.ndarray | None = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """RoPE + (frame-)causal attention with kernel dispatch.

    q, k, v: [B, N, H, D] UNROTATED. rope_cache: (cos, sin) in the model's
    interleaved-pair convention ([N, rot] or [B, N, rot]). segment_ids:
    [N] or [B, N] int; token i attends to j iff seg[i] >= seg[j].

    With ``use_flash`` and a supported shape this runs the Pallas streaming
    kernel (RoPE fused, O(N) mask, custom VJP). Unaligned sequence lengths
    (masked context forwards, predictor ctx+pred concats) are padded to the
    sublane tile with segment-id masking — pad keys get segment max+1 so no
    real query attends to them, and the pad rows are sliced off after —
    which keeps the whole training step on the kernel. Otherwise RoPE is
    applied in XLA and the fused-softmax sdpa handles the boolean mask.
    """
    from vjepa2_tpu.ops.rope import apply_rope_cache

    B, n, _, d = q.shape
    if use_flash:
        from vjepa2_tpu.ops import flash_attention as fa

        use_kernel, pad = _flash_pad_plan(n, d, segment_ids is not None)
        if use_kernel:
            q, k, v, seg, rc = _pad_flash_operands(
                q, k, v, segment_ids, rope_cache, pad, seq_axis=1
            )
            kv_valid = n if (pad and seg is None) else None
            out = fa.flash_attention(q, k, v, segment_ids=seg, rope_tables=rc,
                                     kv_valid_len=kv_valid)
            return out[:, :n] if pad else out
    if rope_cache is not None:
        q = apply_rope_cache(q, rope_cache)
        k = apply_rope_cache(k, rope_cache)
    attn_mask = None
    if segment_ids is not None:
        seg_q = segment_ids if segment_ids.ndim > 1 else segment_ids[None]
        attn_mask = seg_q[:, None, :, None] >= seg_q[:, None, None, :]  # [B|1,1,N,N]
    return _manual_sdpa(q, k, v, attn_mask, False, None)


def _apply_rope_cache_bhnd(x, cache):
    """RoPE over [B, H, N, D] (cache [N, rot] or [B, N, rot])."""
    from vjepa2_tpu.ops.rope import rotate_pairs

    cos, sin = cache
    if cos.ndim == 3:  # [B, N, rot] -> [B, 1, N, rot]
        cos, sin = cos[:, None], sin[:, None]
    rot = cos.shape[-1]
    sub = x[..., :rot]
    rotated = (sub * cos + rotate_pairs(sub) * sin).astype(x.dtype)
    if rot < x.shape[-1]:
        return jnp.concatenate([rotated, x[..., rot:]], axis=-1)
    return rotated


def attend_bhdn(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rope_expanded=None,
    use_flash: bool = False,
    kv_valid: int | None = None,
    segment_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """`attend_bhnd` for narrow-head [B, H, D, N] operands (DN layout,
    `ops/flash_attention_dn.py`) — the (D=32, N) minor dims tile HBM
    exactly, where BHND pads D to 128 lanes (4x for the predictor).

    q/k arrive ALREADY split-half-permuted (the projection folded the
    permutation into its weights); ``rope_expanded`` is the standard
    [B|1, N, D] split-half pair. segment_ids ([N] or [B, N] int, attend iff
    seg_q >= seg_k — the AC predictor's frame-causal rule) ride the DN
    kernel as fp32 side inputs; lane-illegal lengths (N not x128, e.g. the
    AC teacher-forcing 7*(256+2)=1806) are zero-padded here to the next
    x128 with pad keys at segment int32-max (never attended) and the pad
    columns sliced off the output. The XLA fallback transposes to BHND and
    mirrors `attend_bhnd`'s fallback math exactly.
    """
    from vjepa2_tpu.ops import flash_attention as fa
    from vjepa2_tpu.ops import flash_attention_dn as fdn

    B, H, d, n = q.shape
    if use_flash and fdn.supports_dn(n, d) and segment_ids is None:
        return fdn.flash_attention_bhdn(
            q, k, v, rope_expanded=rope_expanded, kv_valid_len=kv_valid)
    if use_flash and segment_ids is not None and kv_valid is None:
        pad = (-n) % 128
        if fdn.supports_dn(n + pad, d):
            seg = segment_ids if segment_ids.ndim > 1 else segment_ids[None]
            seg = seg.astype(jnp.int32)
            rc = rope_expanded
            if pad:
                zpad = lambda t: jnp.pad(t, [(0, 0)] * 3 + [(0, pad)])
                q, k, v = zpad(q), zpad(k), zpad(v)
                # pad keys: id int32-max so no real query attends them; the
                # pad QUERY columns compute garbage and are sliced off below
                seg = jnp.pad(seg, ((0, 0), (0, pad)),
                              constant_values=jnp.iinfo(jnp.int32).max)
                if rc is not None:
                    cos, sin = rc  # [B|1, N, D] split-half
                    w = ((0, 0), (0, pad), (0, 0))
                    rc = (jnp.pad(cos, w), jnp.pad(sin, w))
            out = fdn.flash_attention_bhdn(
                q, k, v, rope_expanded=rc, segment_ids=seg)
            return out[..., :n] if pad else out
    qn, kn, vn = (jnp.swapaxes(t, 2, 3) for t in (q, k, v))
    if rope_expanded is not None:
        cos, sin = rope_expanded  # [B|1, N, D] split-half
        qn = fa._rope_rotate(qn.astype(jnp.float32), cos[:, None], sin[:, None]).astype(q.dtype)
        kn = fa._rope_rotate(kn.astype(jnp.float32), cos[:, None], sin[:, None]).astype(k.dtype)
    scale = 1.0 / (d**0.5)
    s = jnp.einsum("bhnd,bhmd->bhnm", qn, kn,
                   preferred_element_type=jnp.float32) * scale
    if kv_valid is not None and kv_valid < n:
        s = jnp.where(jnp.arange(n)[None, None, None, :] < kv_valid, s,
                      jnp.float32(-1e30))
    if segment_ids is not None:
        seg_q = segment_ids if segment_ids.ndim > 1 else segment_ids[None]
        s = jnp.where((seg_q[:, None, :, None] >= seg_q[:, None, None, :]), s,
                      jnp.float32(-1e30))
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, vn,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.swapaxes(out, 2, 3)


def attend_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rope_cache=None,
    segment_ids: jnp.ndarray | None = None,
    use_flash: bool = False,
    rope_expanded=None,
    head_perm=None,
    kv_valid: int | None = None,
) -> jnp.ndarray:
    """`attend` for [B, H, N, D] operands, returning [B, H, N, D].

    The flash custom-call wants exactly this layout — feeding it from a
    'bnc,chd->bhnd' qkv einsum (and consuming the output with a
    'bhnd,hdc->bnc' projection) removes the per-layer relayout copies the
    BNHD wrapper pays (~0.3 ms/layer at ViT-L shapes, device-trace r3;
    stack probe: -8% fwd / -11% grad, `scripts/probe_attn_layout.py`).

    rope_expanded: pre-expanded split-half tables from
    `flash_attention.expand_rope_cache`; ``head_perm`` is the matching
    static head-dim permutation, applied here to the q/k ACTIVATIONS (a
    permutation applied to both q and k leaves q·kᵀ invariant, so v and the
    output stay canonical). Folding it into the qkv weights instead sends a
    scatter through dW every step: +26 ms/step at ViT-L (r3 bisect,
    `scripts/probe_regress.py`). The XLA fallback applies the same
    split-half rotation, so both routes agree numerically.
    """
    from vjepa2_tpu.ops import flash_attention as fa

    B, H, n, d = q.shape
    if rope_expanded is not None and head_perm is not None:
        perm = list(head_perm)
        q = q[..., perm]
        k = k[..., perm]
    if use_flash:
        if kv_valid is not None:
            # the model already stack-padded the sequence; no per-call pads.
            # The kernel path below carries NO segment mask — combining the
            # two would silently diverge from the XLA fallback.
            if segment_ids is not None:
                raise ValueError(
                    "attend_bhnd: segment_ids + kv_valid is unsupported on "
                    "the flash path (fold the tail into the segment ids "
                    "instead)")
            use_kernel = fa.supports(n, d, False, False)
            if use_kernel:
                if rope_expanded is not None:
                    return fa.flash_attention_bhnd(
                        q, k, v, rope_expanded=rope_expanded,
                        kv_valid_len=kv_valid)
                return fa.flash_attention_bhnd(
                    q, k, v, rope_tables=rope_cache, kv_valid_len=kv_valid)
        else:
            use_kernel, pad = _flash_pad_plan(n, d, segment_ids is not None)
            if use_kernel:
                q, k, v, seg, rc = _pad_flash_operands(
                    q, k, v, segment_ids, rope_expanded or rope_cache, pad,
                    seq_axis=2
                )
                kvl = n if (pad and seg is None) else None
                if rope_expanded is not None:
                    out = fa.flash_attention_bhnd(q, k, v, segment_ids=seg,
                                                  rope_expanded=rc,
                                                  kv_valid_len=kvl)
                else:
                    out = fa.flash_attention_bhnd(q, k, v, segment_ids=seg,
                                                  rope_tables=rc,
                                                  kv_valid_len=kvl)
                return out[:, :, :n] if pad else out
    if rope_expanded is not None:
        cos, sin = rope_expanded  # [B|1, N, D] split-half
        q = fa._rope_rotate(q.astype(jnp.float32), cos[:, None], sin[:, None]).astype(q.dtype)
        k = fa._rope_rotate(k.astype(jnp.float32), cos[:, None], sin[:, None]).astype(k.dtype)
    elif rope_cache is not None:
        q = _apply_rope_cache_bhnd(q, rope_cache)
        k = _apply_rope_cache_bhnd(k, rope_cache)
    scale = 1.0 / (d**0.5)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if segment_ids is not None:
        seg_q = segment_ids if segment_ids.ndim > 1 else segment_ids[None]
        mask = seg_q[:, None, :, None] >= seg_q[:, None, None, :]
        s = jnp.where(mask, s, jnp.float32(-1e30))
    if kv_valid is not None and kv_valid < n:
        # stack-level tail padding: exclude pad key columns (defensive — the
        # kernel path normally handles this via kv_valid_len)
        s = jnp.where(jnp.arange(n)[None, None, None, :] < kv_valid, s,
                      jnp.float32(-1e30))
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
