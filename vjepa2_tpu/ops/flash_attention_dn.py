"""Flash attention over [B, H, D, N] ("DN") operands — the narrow-head family.

Why a second layout: TPU HBM tiles the two MINOR dims of every array at
(8, 128). The predictor's heads are 32-wide (reference
`src/models/predictor.py`: predictor_embed_dim 384, 12 heads), so every
[B, H, N, 32] tensor the BHND kernels touch occupies 4x its logical HBM —
q/k/v projections, saved-for-backward residuals, dq/dk/dv, and the fp32
dk/dv partial sums (16x logical!). Transposing the head plane to
[B, H, D, N] puts (D=32, N) on the minor dims: 32 is a sublane multiple and
N is lane-tiled, so storage is EXACT. The qkv projection emits this layout
directly ('bnc,chd->bhdn') and the out-projection consumes it
('bhdn,hdc->bnc'), so no relayout copies appear at the kernel edges.

In-kernel, everything is the transpose of the BHND math, and every dot
lands on a Mosaic-supported dot_general form (all three forms already lower
in `flash_attention.py`'s kernels):

    sT  [bk, bq] = kT . qT   contracting D  (((0,), (0,)))
    oT  [D,  bq] = vT . p                    (((1,), (0,)))
    dvT [D,  bk] = doT . pT                  (((1,), (1,)))
    dpT [bk, bq] = vT . doT  contracting D   (((0,), (0,)))
    dqT [D,  bq] = kT . ds                   (((1,), (0,)))
    dkT [D,  bk] = qT . dsT                  (((1,), (1,)))

The online softmax reduces over dim0 (sublanes); running stats are [1, bq]
rows. Split-half RoPE becomes two contiguous SUBLANE-half slices (D/2 = 16
rows for the predictor, 8-aligned at D >= 16).

Production callers (all Dh <= `DN_MAX_D`): the pretrain predictor (Dh=32),
the ViT-L/g encoders (Dh=64, `models/modules.py:Attention`'s DN gate), and
the AC predictor (Dh=64, frame-causal via ``segment_ids``). Feature surface:
RoPE (pre-expanded split-half tables), ``kv_valid_len`` tail masking, and
segment-id masking (attend iff seg_q >= seg_k — the frame-causal rule,
reference `src/models/utils/modules.py` build_action_block_causal_attention_mask
re-expressed as O(N) per-token ids). Segments ride as TWO fp32 side inputs
in the layouts the [bk, bq] transposed scores want: a [S, 1, N] lane ROW for
queries and a [S, M, 1] sublane COLUMN for keys — so the in-kernel mask is a
plain broadcast compare, no transpose and no outer-product tricks (contrast
`flash_attention._seg_mask`, where both operands are columns). NO token-level
causal (encode it in the segment ids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vjepa2_tpu.ops.flash_attention import (
    LOG2E,
    NEG_INF,
    _mosaic_available,
)

# In this layout N sits in the LANE dim, so Mosaic only accepts N-blocks
# that are multiples of 128 — or the whole array (array-equal blocks are
# always legal, at any size). That rules out the sublane-style "largest
# divisor that's a multiple of 8" policy the BHND family uses (an 816- or
# 832-wide lane block is an illegal tile and fails to lower on hardware;
# interpret mode never enforces this). The plan below maximizes the joint
# score-block area on the (x128 | array-equal) divisor lattice under a
# footprint cap sized for the fused backward's ~4 live fp32 score buffers
# (512*1024*4 B * 4 = 8 MB against the 16.00 MB scoped-VMEM cliff),
# preferring a large q block: q stays resident across the k stream, so at
# predictor lengths (1623/1662 -> padded 1664 = 2^7*13) the plan lands
# (bq=N, bk=128) and the backward's dk/dv partials collapse to nq=1.
DN_SCORE_CAP = 512 * 1024


def pick_block_lane(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= target and a multiple of 128
    (the lane tile), falling back to ``n`` itself (array-equal)."""
    best = 0
    for b in range(128, min(n, target) + 1, 128):
        if n % b == 0:
            best = b
    return best if best else n


def _dn_block_plan(N: int, M: int):
    """(block_q, block_k) legal in the lane dim, or None if nothing fits
    under the score-footprint cap (e.g. a large N with no x128 divisor,
    where the only legal block is the whole array)."""
    def cands(n):
        c = [b for b in range(128, n, 128) if n % b == 0]
        c.append(n)
        return c

    best = None
    for bq in cands(N):
        for bk in cands(M):
            if bq * bk > DN_SCORE_CAP:
                continue
            if best is None or (bq * bk, bq) > (best[0] * best[1], best[0]):
                best = (bq, bk)
    return best


def _rope_rotate_dn(x, cos, sin):
    """Split-half rotation over dim -2 (the head dim): x*cos + [-hi, lo]*sin."""
    d = x.shape[-2] // 2
    rot = jnp.concatenate([-x[..., d:, :], x[..., :d, :]], axis=-2)
    return x * cos + rot * sin


def _rope_rotate_dn_t(g, cos, sin):
    """Adjoint of `_rope_rotate_dn` (pairs may carry different angles under
    the reference's tiled-frequency quirk, so R^T != R(-theta))."""
    d = g.shape[-2] // 2
    w = g * sin
    inv = jnp.concatenate([w[..., d:, :], -w[..., :d, :]], axis=-2)
    return g * cos + inv


def _mask_pad_rows(s, kv_i, nk, block_k: int, block_q: int, kv_valid: int):
    """Mask pad KEY rows (dim0 of the transposed scores) in the LAST block."""
    lim = kv_valid - (nk - 1) * block_k

    def masked(sv):
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
        return jnp.where(rows < lim, sv, NEG_INF)

    return jax.lax.cond(kv_i == nk - 1, masked, lambda sv: sv, s)


def _fwd_kernel_dn(
    segq_ref, segk_ref, q_ref, k_ref, v_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    """Grid (B*H/bh, nq, nk), k innermost; scratch persists across k."""
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    mask = None
    if use_segments:
        # [bk, bq] = seg_q row [1, bq] >= seg_k column [bk, 1]: the two
        # operands arrive in exactly the layouts the broadcast wants
        mask = segq_ref[0] >= segk_ref[0]

    for h in range(block_h):
        q = q_ref[0, h]  # [D, BLK_Q]
        k = k_ref[0, h]  # [D, BLK_K]
        if use_rope:
            q = _rope_rotate_dn(q.astype(jnp.float32), qcos_ref[0], qsin_ref[0])
            k = _rope_rotate_dn(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        # fold the scale and the base-2 conversion into q (see BHND kernel)
        q = (q * (scale * LOG2E)).astype(q_ref.dtype)

        s = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLK_K, BLK_Q] fp32, base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_rows(s, kv_i, nk, block_k, block_q, kv_valid)

        m_prev = m_scr[h]  # [1, BLK_Q]
        m_cur = jnp.max(s, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)  # masked entries -> 0
        corr = jnp.exp2(m_prev - m_new)
        l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=0, keepdims=True)
        acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
            v_ref[0, h], p.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, BLK_Q]
        m_scr[h] = m_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])  # [bh, 1, BQ]
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] * (1.0 / LOG2E) + jnp.log(denom)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "block_h", "interpret",
                     "kv_valid"),
)
def _flash_fwd_bhdn(
    q, k, v, segq, segk, qcos, qsin, kcos, ksin,
    scale=None, block_q=None, block_k=None, block_h=1,
    interpret=False, kv_valid=None,
):
    """q, k, v: [B, H, D, N] (+ optional rope tables [B|1, D, N]; optional
    fp32 segment ids segq [S, 1, N] / segk [S, M, 1], S in {1, B}).

    Returns (out [B, H, D, N], lse [B, H, 1, N] fp32, natural-log scale).
    """
    B, H, D, N = q.shape
    M = k.shape[3]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    if block_q is None or block_k is None:
        plan = _dn_block_plan(N, M)
        assert plan is not None, (N, M)
        block_q, block_k = plan
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    assert N % block_q == 0 and M % block_k == 0, (N, M, block_q, block_k)
    if not interpret:
        # lane-dim tiling rule (Mosaic enforces it only on hardware)
        assert block_q % 128 == 0 or block_q == N, (block_q, N)
        assert block_k % 128 == 0 or block_k == M, (block_k, M)
    assert H % block_h == 0, (H, block_h)
    hb = H // block_h
    use_rope = qcos is not None
    if qcos is None:
        qcos = qsin = jnp.zeros((1, D, N), q.dtype)
        kcos = ksin = jnp.zeros((1, D, M), k.dtype)
    tb = qcos.shape[0]
    use_segments = segq is not None
    if segq is None:
        segq = jnp.zeros((1, 1, N), jnp.float32)
        segk = jnp.zeros((1, M, 1), jnp.float32)
    sb = segq.shape[0]

    if kv_valid is not None:
        assert M - kv_valid < block_k, (M, kv_valid, block_k)

    grid = (B * hb, N // block_q, M // block_k)
    kernel = functools.partial(
        _fwd_kernel_dn, scale=scale, block_q=block_q, block_k=block_k,
        block_h=block_h, use_rope=use_rope, use_segments=use_segments,
        kv_valid=kv_valid,
    )

    def spec_q(g, i, j, hb=hb):
        return (g // hb, g % hb, 0, i)

    def spec_k(g, i, j, hb=hb):
        return (g // hb, g % hb, 0, j)

    seg_specs = [
        pl.BlockSpec((1, 1, block_q),
                     lambda g, i, j, hb=hb, sb=sb: ((g // hb) % sb, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, 1),
                     lambda g, i, j, hb=hb, sb=sb: ((g // hb) % sb, j, 0),
                     memory_space=pltpu.VMEM),
    ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seg_specs + [
            pl.BlockSpec((1, block_h, D, block_q), spec_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, D, block_k), spec_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, D, block_k), spec_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_q),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_q),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_k),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_k),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_h, D, block_q), spec_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, 1, block_q), spec_q, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D, N), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_h, 1, block_q), jnp.float32),  # running max
            pltpu.VMEM((block_h, 1, block_q), jnp.float32),  # running denom
            pltpu.VMEM((block_h, D, block_q), jnp.float32),  # out accumulator
        ],
        interpret=interpret,
    )(segq, segk, q, k, v, qcos, qsin, kcos, ksin)
    return out, lse


def _bwd_fused_kernel_dn(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    dq_ref, dkp_ref, dvp_ref, dq_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    """One-pass backward (see `_bwd_fused_kernel`): grid (B*hb, nq, nk), k
    innermost; dq accumulates in scratch, dk/dv write fp32 partials
    [B, H, nq, D, M] — UNPADDED in this layout (the BHND partials pay 4x) —
    that XLA sums over nq. The RoPE adjoint on dk runs in XLA after the sum.
    """
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if use_rope:
        qcos = qcos_ref[0]
        qsin = qsin_ref[0]

    mask = None
    if use_segments:
        mask = segq_ref[0] >= segk_ref[0]  # [bk, bq]

    for h in range(block_h):
        q = q_ref[0, h]  # [D, BLK_Q]
        k = k_ref[0, h]  # [D, BLK_K]
        if use_rope:
            q = _rope_rotate_dn(q.astype(jnp.float32), qcos, qsin)
            k = _rope_rotate_dn(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        qu = q.astype(q_ref.dtype)           # unscaled (feeds dk)
        qs = (q * (scale * LOG2E)).astype(q_ref.dtype)  # scaled (scores)

        s = jax.lax.dot_general(
            k, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLK_K, BLK_Q], base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_rows(s, kv_i, nk, block_k, block_q, kv_valid)

        lse = lse_ref[0, h]  # [1, BLK_Q], base-2 scale
        p = jnp.where(lse > NEG_INF * 0.5, jnp.exp2(s - lse), 0.0)
        do = do_ref[0, h]  # [D, BLK_Q]
        dvp_ref[0, h, 0] = jax.lax.dot_general(
            do, p.astype(do.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, BLK_K]
        dp = jax.lax.dot_general(
            v_ref[0, h], do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BLK_K, BLK_Q]
        ds = (p * (dp - delta_ref[0, h]) * scale).astype(qu.dtype)
        # dk partial w.r.t. the ROTATED k; adjoint applied after the XLA sum
        dkp_ref[0, h, 0] = jax.lax.dot_general(
            qu, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [D, BLK_K]
        dq_scr[h] += jax.lax.dot_general(
            k, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [D, BLK_Q]

    @pl.when(kv_i == nk - 1)
    def _finish():
        dq_rot = dq_scr[...]
        if use_rope:
            dq_rot = _rope_rotate_dn_t(dq_rot, qcos, qsin)
        dq_ref[0] = dq_rot.astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "block_h", "interpret",
                     "kv_valid"),
)
def _flash_bwd_bhdn(
    q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse, do,
    scale=None, block_q=None, block_k=None, block_h=1,
    interpret=False, kv_valid=None,
):
    B, H, D, N = q.shape
    M = k.shape[3]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    if block_q is None or block_k is None:
        plan = _dn_block_plan(N, M)
        assert plan is not None, (N, M)
        block_q, block_k = plan
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    if not interpret:
        assert block_q % 128 == 0 or block_q == N, (block_q, N)
        assert block_k % 128 == 0 or block_k == M, (block_k, M)
    assert H % block_h == 0, (H, block_h)
    if kv_valid is not None:
        assert M - kv_valid < block_k, (M, kv_valid, block_k)
    hb = H // block_h
    use_rope = qcos is not None
    if qcos is None:
        qcos = qsin = jnp.zeros((1, D, N), q.dtype)
        kcos = ksin = jnp.zeros((1, D, M), k.dtype)
    tb = qcos.shape[0]
    use_segments = segq is not None
    if segq is None:
        segq = jnp.zeros((1, 1, N), jnp.float32)
        segk = jnp.zeros((1, M, 1), jnp.float32)
    sb = segq.shape[0]

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=2, keepdims=True)  # [B, H, 1, N]
    lse2 = lse * LOG2E  # base-2 for the in-kernel exp2 recompute

    nq = N // block_q

    def spec_q(g, i, j, hb=hb):
        return (g // hb, g % hb, 0, i)

    def spec_k(g, i, j, hb=hb):
        return (g // hb, g % hb, 0, j)

    def blk_q(d0):
        return pl.BlockSpec((1, block_h, d0, block_q), spec_q,
                            memory_space=pltpu.VMEM)

    def blk_k(d0):
        return pl.BlockSpec((1, block_h, d0, block_k), spec_k,
                            memory_space=pltpu.VMEM)

    partial_spec = pl.BlockSpec(
        (1, block_h, 1, D, block_k),
        lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0, j),
        memory_space=pltpu.VMEM,
    )
    seg_specs = [
        pl.BlockSpec((1, 1, block_q),
                     lambda g, i, j, hb=hb, sb=sb: ((g // hb) % sb, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, 1),
                     lambda g, i, j, hb=hb, sb=sb: ((g // hb) % sb, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq, dkp, dvp = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel_dn, scale=scale, block_q=block_q,
            block_k=block_k, block_h=block_h, use_rope=use_rope,
            use_segments=use_segments, kv_valid=kv_valid,
        ),
        grid=(B * hb, nq, M // block_k),
        in_specs=seg_specs + [
            blk_q(D),  # q
            blk_k(D),  # k
            blk_k(D),  # v
            blk_q(D),  # do
            blk_q(1),  # lse
            blk_q(1),  # delta
            pl.BlockSpec((1, D, block_q),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_q),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_k),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, block_k),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[blk_q(D), partial_spec, partial_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D, N), q.dtype),
            jax.ShapeDtypeStruct((B, H, nq, D, M), jnp.float32),
            jax.ShapeDtypeStruct((B, H, nq, D, M), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_h, D, block_q), jnp.float32)],
        interpret=interpret,
    )(segq, segk, q, k, v, do, lse2, delta, qcos, qsin, kcos, ksin)
    dk = dkp.sum(axis=2)  # [B, H, D, M] fp32
    dv = dvp.sum(axis=2).astype(v.dtype)
    if use_rope:
        dk = _rope_rotate_dn_t(dk, kcos[:, None], ksin[:, None])
    return dq, dk.astype(k.dtype), dv


# ---------------------------------------------------------------------------
# Differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _flash_core_dn(q, k, v, segq, segk, qcos, qsin, kcos, ksin,
                   scale, block_q, block_k, block_h, interpret, kv_valid):
    out, _ = _flash_fwd_bhdn(
        q, k, v, segq, segk, qcos, qsin, kcos, ksin,
        scale=scale, block_q=block_q, block_k=block_k, block_h=block_h,
        interpret=interpret, kv_valid=kv_valid,
    )
    return out


def _core_fwd_dn(q, k, v, segq, segk, qcos, qsin, kcos, ksin,
                 scale, block_q, block_k, block_h, interpret, kv_valid):
    out, lse = _flash_fwd_bhdn(
        q, k, v, segq, segk, qcos, qsin, kcos, ksin,
        scale=scale, block_q=block_q, block_k=block_k, block_h=block_h,
        interpret=interpret, kv_valid=kv_valid,
    )
    return out, (q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse)


def _core_bwd_dn(scale, block_q, block_k, block_h, interpret, kv_valid,
                 res, g):
    q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse = res
    dq, dk, dv = _flash_bwd_bhdn(
        q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse, g,
        scale=scale, block_q=block_q, block_k=block_k, block_h=block_h,
        interpret=interpret, kv_valid=kv_valid,
    )

    def zeros(x):
        return None if x is None else jnp.zeros_like(x)

    return (dq, dk, dv, zeros(segq), zeros(segk),
            zeros(qcos), zeros(qsin), zeros(kcos), zeros(ksin))


_flash_core_dn.defvjp(_core_fwd_dn, _core_bwd_dn)


# Saveable-residual variant (policy remat) — same structure as
# `flash_attention._flash_grad_attach`: the raw fwd kernel runs on
# stop_gradient inputs, (out, lse) are `checkpoint_name`-tagged so a
# `save_only_these_names('flash_out', 'flash_lse')` remat policy keeps
# them, and gradients attach through an identity-forward custom vjp whose
# residuals are plain jaxpr values. The knob is shared:
# `flash_attention.SAVEABLE_RESIDUALS`.


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16))
def _flash_grad_attach_dn(q, k, v, segq, segk, qcos, qsin, kcos, ksin, out,
                          lse, scale, block_q, block_k, block_h, interpret,
                          kv_valid):
    return out


def _attach_fwd_dn(q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse,
                   scale, block_q, block_k, block_h, interpret, kv_valid):
    return out, (q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse)


def _attach_bwd_dn(scale, block_q, block_k, block_h, interpret, kv_valid,
                   res, g):
    q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse = res
    dq, dk, dv = _flash_bwd_bhdn(
        q, k, v, segq, segk, qcos, qsin, kcos, ksin, out, lse, g,
        scale=scale, block_q=block_q, block_k=block_k, block_h=block_h,
        interpret=interpret, kv_valid=kv_valid,
    )

    def zeros(x):
        return None if x is None else jnp.zeros_like(x)

    return (dq, dk, dv, zeros(segq), zeros(segk),
            zeros(qcos), zeros(qsin), zeros(kcos), zeros(ksin),
            jnp.zeros_like(out), jnp.zeros_like(lse))


_flash_grad_attach_dn.defvjp(_attach_fwd_dn, _attach_bwd_dn)


def flash_attention_bhdn(
    q, k, v,
    scale: float | None = None,
    rope_expanded=None,
    segment_ids=None,
    block_q: int | None = None,
    block_k: int | None = None,
    block_h: int | None = None,
    interpret: bool = False,
    kv_valid_len: int | None = None,
):
    """Flash attention over [B, H, D, N] tensors. Differentiable.

    rope_expanded: (cos, sin) split-half tables, EITHER the standard
    [B|1, N, D] pair from `flash_attention.expand_rope_cache` (transposed
    here once — tiny next to the per-layer q/k traffic) or already
    [B|1, D, N]. q/k must carry the matching head-dim permutation (fold it
    into the qkv projection weights, `models/modules.py:_QKVProjBHND`).

    segment_ids: [N] or [B, N] int; token i attends to j iff
    seg[i] >= seg[j] (the frame-causal rule — reference
    `src/models/utils/modules.py` block-causal mask as O(N) ids). Converted
    once here to the two fp32 side layouts the kernels want. Mutually
    exclusive with kv_valid_len: fold tail pads into the ids (int32-max on
    pad keys) instead.

    kv_valid_len: static count of REAL key/value positions for tail-padded
    sequences (the predictor stacks-pads ctx+pred to a block-friendly N).
    """
    B, H, D, N = q.shape
    M = k.shape[3]
    assert segment_ids is None or kv_valid_len is None, (
        "flash_attention_bhdn: segment_ids + kv_valid_len is unsupported — "
        "give pad keys segment id int32-max instead")
    segq = segk = None
    if segment_ids is not None:
        seg = segment_ids
        if seg.ndim == 1:
            seg = seg[None]
        seg = seg.astype(jnp.float32)
        assert seg.shape[1] == N == M, (seg.shape, N, M)
        segq = seg[:, None, :]   # [S, 1, N] lane row
        segk = seg[:, :, None]   # [S, M, 1] sublane column
    qcos = qsin = kcos = ksin = None
    if rope_expanded is not None:
        cos, sin = rope_expanded
        if cos.ndim == 2:
            cos, sin = cos[None], sin[None]
        if cos.shape[-1] == D and cos.shape[-2] != D:
            cos = jnp.swapaxes(cos, -1, -2)
            sin = jnp.swapaxes(sin, -1, -2)
        qcos = kcos = cos.astype(jnp.float32)  # [B|1, D, N]
        qsin = ksin = sin.astype(jnp.float32)
    if block_q is not None or block_k is not None:
        # explicit override (probes/tests): honored verbatim, legality
        # asserted inside the fwd/bwd wrappers on the hardware path
        bq, bk = block_q or N, block_k or M
    else:
        plan = _dn_block_plan(N, M)
        assert plan is not None, (
            f"no legal DN block plan for N={N}, M={M} — gate callers on "
            f"supports_dn()")
        bq, bk = plan
    from vjepa2_tpu.ops import flash_attention as fa

    if fa.SAVEABLE_RESIDUALS:
        from jax.ad_checkpoint import checkpoint_name

        sg = fa._sg
        q = checkpoint_name(q, "flash_qkv")
        k = checkpoint_name(k, "flash_qkv")
        v = checkpoint_name(v, "flash_qkv")
        outv, lsev = _flash_fwd_bhdn(
            sg(q), sg(k), sg(v), sg(segq), sg(segk), sg(qcos), sg(qsin),
            sg(kcos), sg(ksin), scale=scale, block_q=bq, block_k=bk,
            block_h=block_h or 1, interpret=interpret, kv_valid=kv_valid_len,
        )
        outv = checkpoint_name(outv, "flash_out")
        lsev = checkpoint_name(lsev, "flash_lse")
        return _flash_grad_attach_dn(
            q, k, v, segq, segk, qcos, qsin, kcos, ksin, outv, lsev,
            scale, bq, bk, block_h or 1, interpret, kv_valid_len,
        )
    return _flash_core_dn(q, k, v, segq, segk, qcos, qsin, kcos, ksin,
                          scale, bq, bk, block_h or 1, interpret,
                          kv_valid_len)


# Inclusive head-dim bound for the DN route. Default 64 routes BOTH the
# predictor family (Dh=32, 4x lane pad in BHND) and the encoder family
# (ViT-L/g: Dh=64, 2x lane pad — ~2.4 GB of saved residuals at the ViT-L
# pretrain step) through the DN layout. Measured on hardware
# (`scripts/probe_dn_step.py --variants dn,dn64`, full ViT-L bs8 16f@256
# pretrain step, interleaved one-process, 4 rounds, min-of-rounds):
# dn64 406.9 vs dn 465.9 ms/step (-59 ms on top of the -65 ms the
# predictor-only DN routing already bought vs BHND). Set to 48 to keep DN
# predictor-only, or 0 to disable the route entirely.
DN_MAX_D = 64


def dn_head_eligible(d: int) -> bool:
    """Head-dim leg of the DN gate: a sublane multiple with an 8-aligned
    split-half (the in-kernel RoPE rotation slices D/2 sublane rows), under
    the `DN_MAX_D` routing bound."""
    return d % 8 == 0 and (d // 2) % 8 == 0 and d <= DN_MAX_D


def supports_dn(n: int, d: int) -> bool:
    """DN-kernel eligibility: `dn_head_eligible` heads and a lane-legal
    block plan (N a multiple of 128, or small enough that array-equal
    blocks fit the score-footprint cap)."""
    if not _mosaic_available():
        return False
    if not dn_head_eligible(d):
        return False
    return _dn_block_plan(n, n) is not None
