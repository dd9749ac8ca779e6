"""Pallas TPU flash attention: streaming forward + custom VJP + fused RoPE.

Replaces the reference's unfused SDPA path (`src/models/utils/modules.py:243-382`:
rotate q/k in HBM, then F.scaled_dot_product_attention) with one kernel family:

* **Streaming online-softmax forward** — the grid iterates K/V blocks in the
  innermost dimension; running (max, denom, acc) live in VMEM scratch, so the
  [N, N] score/probability matrices never touch HBM and sequence length is
  bounded by HBM, not VMEM (64f@384px = 18,432 tokens works with 128-wide
  blocks).
* **Segment-id masking** — V-JEPA needs exactly two mask families: none
  (encoder/predictor) and *frame-causal with interleaved conditioning tokens*
  (AC predictor, reference `ac_predictor.py:109-117`). Both reduce to
  per-token int32 segment ids with the rule ``attend iff seg_q >= seg_k``
  (token-causal = seg along arange). O(N) ids instead of an O(N^2) bool mask.
* **Fused RoPE** — cos/sin tables are applied to q/k blocks inside the
  kernel. Convention note: the model's RoPE rotates interleaved (even, odd)
  lane pairs (`ops/rope.py`), which is lane-hostile on TPU. Since any fixed
  head-dim permutation applied to BOTH q and k preserves q.k, the wrapper
  permutes q/k (and the tables) from interleaved-pair to split-half layout
  once outside the kernel; in-kernel rotation is then two contiguous
  half-slices: ``x*cos + concat(-x_hi, x_lo)*sin``. The permutation fuses
  into the qkv projection epilogue under XLA; v is untouched.
* **Custom VJP** — the forward saves only (out, logsumexp); the backward
  recomputes probabilities blockwise (dq kernel over K blocks, dk/dv kernel
  over Q blocks), the standard flash backward. RoPE gradients use the
  rotation's orthogonality: dX = R(-theta) dX_rot.

Numerics: bf16 matmul inputs with fp32 MXU accumulation (casting inputs to
fp32 would hit the ~8x slower fp32 MXU path — measured 52 ms vs 4.7 ms for
one ViT-g-shaped call), softmax in fp32, outputs in the input dtype; parity
tests run in interpret mode on CPU (`tests/ops/test_flash_attention.py`).

Hardware status (r3): executes on TPU v5e. Block specs obey Mosaic tiling
(last two block dims (8k, 128k) or equal to the array's); measured at ViT-g
encode shape (B8 N2048 H16 D88): fwd 4.7 ms vs 9.4 ms XLA fused-softmax,
blocks 1024x1024. ``supports()`` gates on a real TPU backend (or forced
interpret mode) so ``use_flash=True`` is safe on any host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024  # v5e sweeps: 1024-wide q blocks; larger fails scoped-VMEM
DEFAULT_BLOCK_K = 2048  # full-N k block when it fits: k/v stream ONCE per (b,h)
# (r3 tunnel-safe sweep at enc B8 H16 N2048 D64: bk2048 1.87 ms vs bk1024
#  2.03 ms; bq2048 fails to compile. 256/512-wide blocks are 2-5x slower.)
DEFAULT_BWD_BLOCK = 1024  # bwd keeps ~4 score-shaped fp32 buffers live: 16 MB cliff
# Score-block cap (q, k) applied to encoder-width (d_head >= 64) forward
# kernels when the default blocks exceed cap_q * cap_k elements. Module
# knob so step-level probes can A/B cap policies in one process; None
# disables the cap entirely. See the inline comment at the use site.
#
# r4 bisect (`scripts/probe_r4_blocks.py`, full ViT-L bs8 16f@256 step,
# identical mask seeds): the r3-end (512, 1024) cap WAS the BENCH_r03
# regression — 709.1 ms/step + 471 s compile vs (1024, 1024) 534.1 ms/189 s
# and uncapped-full-N 528.7 ms/137 s. The uncapped default is within
# cross-process noise of (1024, 1024) but holds ~4 score-row fp32 buffers
# of block_q x N against the 16.00 MB scoped-VMEM cliff (fails to compile
# in SOME surrounding programs when mask lengths shift N — the very failure
# 221d074 chased), so the default caps at (1024, 1024).
FWD_CAP_WIDE: tuple[int, int] | None = (1024, 1024)


class fwd_cap_override:
    """Scope a different `FWD_CAP_WIDE` around TRACING of a program.

    Forward-only programs (frozen-eval feature extraction, hub/serving
    encode, the encode benches) have none of the train step's scoped-VMEM
    pressure, and uncapped full-N k blocks measure faster there (r4s2
    `scripts/probe_encode_caps.py`: 361.1 vs 369.7 ms/step, ViT-g 16f@256
    bs8 encode). The flag is read at trace time, so wrap the CALLS of the
    jitted fn (tracing happens inside the first call; later calls pay only
    the context-manager entry).
    """

    def __init__(self, cap: tuple[int, int] | None = None):
        self.cap = cap

    def __enter__(self):
        global FWD_CAP_WIDE
        self._saved = FWD_CAP_WIDE
        FWD_CAP_WIDE = self.cap
        return self

    def __exit__(self, *exc):
        global FWD_CAP_WIDE
        FWD_CAP_WIDE = self._saved
        return False


NEG_INF = -1e30
LOG2E = 1.4426950408889634  # 1/ln 2

# The kernels are VPU-bound at V-JEPA shapes (per score element the MXU does
# only 4*Dh/32768 ~ 0.008 cycles, while softmax costs ~10 VPU cycles), so the
# scalar work per element is what matters: the QK scale is folded into one
# matmul operand as ``scale * LOG2E`` and the softmax runs in base 2
# (``exp2`` is the VPU-native transcendental; exp lowers to exp2 + a
# per-element multiply). exp2(s2 - m2) == exp(s - m) exactly, with
# s2 = s * LOG2E tracked everywhere inside the kernels; the emitted
# logsumexp converts back to natural log at the block edge (per-row, cheap).


def _rope_rotate(x, cos, sin):
    """Split-half rotation: x*cos + [-x_hi, x_lo]*sin. x: [..., D]."""
    d = x.shape[-1] // 2
    x_lo, x_hi = x[..., :d], x[..., d:]
    rot = jnp.concatenate([-x_hi, x_lo], axis=-1)
    return x * cos + rot * sin


def _rope_rotate_t(g, cos, sin):
    """Transpose (adjoint) of `_rope_rotate` for the VJP.

    With the reference's tiled-frequency quirk the two slots of a pair carry
    *different* angles, so R(theta)^T != R(-theta); componentwise the adjoint
    is dx = g*cos + [w_hi, -w_lo] with w = g*sin."""
    d = g.shape[-1] // 2
    w = g * sin
    inv = jnp.concatenate([w[..., d:], -w[..., :d]], axis=-1)
    return g * cos + inv


def _seg_mask(segq_ref, segk_ref, block_q: int, block_k: int):
    """[BLK_Q, BLK_K] bool mask seg_q >= seg_k from per-block fp32 segment
    columns [BLK, 1].

    The column vectors broadcast across lanes via rank-1 dot_generals (outer
    products with ones) — Mosaic has no cheap (N,1)->(1,N) relayout, and
    loading a shared seg row at dynamic offsets requires provably-128-aligned
    indices, which would force 128-multiple blocks and kill block-size
    freedom for irregular (masked/predictor) sequence lengths."""
    sq = segq_ref[0]  # [BLK_Q, 1] fp32
    sk = segk_ref[0]  # [BLK_K, 1] fp32
    ones_q = jnp.ones((block_q, 1), jnp.float32)
    ones_k = jnp.ones((block_k, 1), jnp.float32)
    rows = jax.lax.dot_general(
        sq, ones_k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    cols = jax.lax.dot_general(
        ones_q, sk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return rows >= cols




def _mask_pad_cols(s, kv_i, nk, block_q: int, block_k: int, kv_valid: int):
    lim = kv_valid - (nk - 1) * block_k  # valid cols within the LAST block

    def masked(sv):
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        return jnp.where(cols < lim, sv, NEG_INF)

    return jax.lax.cond(kv_i == nk - 1, masked, lambda sv: sv, s)


def _fwd_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int, causal: bool,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    """Grid (B*H/bh, nq, nk), k innermost. Scratch persists across the k
    loop. ``block_h`` heads are processed per cell (statically unrolled) —
    at tiny head dims (predictor D=32) per-cell DMA/setup dominates the
    compute, so sharing one cell (and one rope-table load) across heads
    amortizes it."""
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    mask = None
    if causal or use_segments:
        q_i = pl.program_id(1)
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kv_i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = rows >= cols

    for h in range(block_h):
        # keep matmul INPUTS in the storage dtype (bf16 on TPU: the MXU runs
        # bf16 x bf16 -> fp32-accumulate at full rate; casting inputs to fp32
        # would decompose to the ~8x slower fp32 path) — only accumulation
        # and the softmax run in fp32
        q = q_ref[0, h]  # [BLK_Q, D]
        k = k_ref[0, h]  # [BLK_K, D]
        if use_rope:
            q = _rope_rotate(q.astype(jnp.float32), qcos_ref[0], qsin_ref[0])
            k = _rope_rotate(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        # fold scale (and the base-2 conversion) into q: one [BLK_Q, D]
        # multiply instead of a [BLK_Q, BLK_K] multiply on the scores
        q = (q * (scale * LOG2E)).astype(q_ref.dtype)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLK_Q, BLK_K] fp32, base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_cols(s, kv_i, nk, block_q, block_k, kv_valid)

        m_prev = m_scr[h]  # [BLK_Q, 1] broadcast via lane-128 scratch
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BLK_Q, 1], base-2 scale
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)  # == exp(s_nat - m_nat); masked entries -> 0
        corr = jnp.exp2(m_prev - m_new)
        l_new = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[h] = m_new
        l_scr[h] = l_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
        # natural-log lse at the API edge: m_nat = m2 * ln 2
        lse_ref[0] = m_scr[...] * (1.0 / LOG2E) + jnp.log(denom)  # [bh, BLK_Q, 1]


def _zeros_like_table(q):
    return jnp.zeros((1, q.shape[2], q.shape[3]), q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "block_h",
                     "interpret", "kv_valid"),
)
def _flash_fwd_bhnd(
    q, k, v, seg, qcos, qsin, kcos, ksin, seg_kv=None,
    causal=False, scale=None, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
    block_h=1, interpret=False, kv_valid=None,
):
    """q,k,v: [B, H, N, D] (+ optional seg [B, N], rope tables [B|1, 1, N, D]).

    Returns (out [B, H, N, D], lse [B, H, N] fp32). ``block_h`` heads are
    processed per grid cell (must divide H). ``seg_kv`` gives the KEY side
    its own segment ids (ring-attention hops, where the kv shard was rotated
    in from another device); defaults to ``seg`` (self-attention).
    """
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    assert N % block_q == 0 and M % block_k == 0, (N, M, block_q, block_k)
    assert H % block_h == 0, (H, block_h)
    hb = H // block_h
    use_segments = seg is not None
    assert not use_segments or seg_kv is not None or N == M, \
        "a single segment array assumes self-attention (N == M); pass seg_kv"
    use_rope = qcos is not None

    if seg is None:
        seg = jnp.zeros((B, N), jnp.int32)
    if seg_kv is None:
        seg_kv = seg if N == M else jnp.zeros((B, M), jnp.int32)
    # TPU tiling: the last two dims of a block must be (8k, 128k) or equal
    # the array dims. Segments ride as fp32 [B, N|M, 1] columns blocked like
    # q and k (no dynamic-offset row loads — see `_seg_mask`); lse is
    # emitted as [B, H, N, 1] with block (1, bh, BLK_Q, 1) for the same
    # reason.
    segf = seg.astype(jnp.float32)[:, :, None]
    segkf = seg_kv.astype(jnp.float32)[:, :, None]
    if qcos is None:
        qcos = qsin = _zeros_like_table(q)
        kcos = ksin = _zeros_like_table(k)
    tb = qcos.shape[0]  # 1 (shared) or B (per-batch tables)

    grid = (B * hb, N // block_q, M // block_k)

    if kv_valid is not None:
        assert M - kv_valid < block_k, (M, kv_valid, block_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        block_h=block_h, causal=causal, use_rope=use_rope,
        use_segments=use_segments, kv_valid=kv_valid,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # segment columns, once blocked by the q index and once by k
            pl.BlockSpec((1, block_q, 1), lambda g, i, j, hb=hb: (g // hb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda g, i, j, hb=hb: (g // hb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, block_q, D),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, block_k, D),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, block_k, D),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, j, 0),
                         memory_space=pltpu.VMEM),
            # rope tables [tb, N, D] shared across the cell's heads
            pl.BlockSpec((1, block_q, D),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D),
                         lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_h, block_q, D),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),  # running denom
            pltpu.VMEM((block_h, block_q, D), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(segf, segkf, q, k, v, qcos, qsin, kcos, ksin)
    return out, lse.reshape(B, H, N)


def _dq_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    dq_ref, dq_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int, causal: bool,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    mask = None
    if causal or use_segments:
        q_i = pl.program_id(1)
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols

    if use_rope:
        qcos = qcos_ref[0]
        qsin = qsin_ref[0]

    for h in range(block_h):
        q = q_ref[0, h]
        k = k_ref[0, h]
        if use_rope:
            q = _rope_rotate(q.astype(jnp.float32), qcos, qsin)
            k = _rope_rotate(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        # q feeds only the scores here (dq comes from ds @ k) — fold in the
        # base-2 softmax scale like the forward
        qs = (q * (scale * LOG2E)).astype(q_ref.dtype)

        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_cols(s, kv_i, nk, block_q, block_k, kv_valid)

        # fully-masked rows have lse == NEG_INF; exp(s - lse) would be
        # exp(0) = 1 for every masked entry, so zero those rows explicitly
        # (ADVICE r2). lse arrives pre-scaled to base 2 (`_flash_bwd_bhnd`).
        lse = lse_ref[0, h]  # [BLK_Q, 1], base-2 scale
        p = jnp.where(lse > NEG_INF * 0.5, jnp.exp2(s - lse), 0.0)  # [BLK_Q, BLK_K]
        do = do_ref[0, h]
        dp = jax.lax.dot_general(
            do, v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_ref[0, h]) * scale).astype(k.dtype)
        dq_scr[h] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kv_i == nk - 1)
    def _finish():
        dq_rot = dq_scr[...]
        if use_rope:
            dq_rot = _rope_rotate_t(dq_rot, qcos, qsin)
        dq_ref[0] = dq_rot.astype(dq_ref.dtype)


def _dkv_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int, causal: bool,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    q_i = pl.program_id(2)  # q innermost here
    nq = pl.num_programs(2)

    @pl.when(q_i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    kv_i = pl.program_id(1)
    mask = None
    if causal or use_segments:
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols

    if use_rope:
        kcos = kcos_ref[0]
        ksin = ksin_ref[0]

    for h in range(block_h):
        q = q_ref[0, h]
        k = k_ref[0, h]
        if use_rope:
            q = _rope_rotate(
                q.astype(jnp.float32), qcos_ref[0], qsin_ref[0]
            ).astype(q_ref.dtype)
            k = _rope_rotate(k.astype(jnp.float32), kcos, ksin)
        else:
            k = k.astype(jnp.float32)
        # here dk comes from ds @ q, so q must stay unscaled — fold the
        # base-2 softmax scale into k instead
        ks = (k * (scale * LOG2E)).astype(k_ref.dtype)

        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLK_Q, BLK_K], base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_cols(s, kv_i, pl.num_programs(1), block_q, block_k,
                               kv_valid)

        lse = lse_ref[0, h]  # [BLK_Q, 1], base-2 scale (see `_flash_bwd_bhnd`)
        p = jnp.where(lse > NEG_INF * 0.5, jnp.exp2(s - lse), 0.0)
        do = do_ref[0, h]
        dv_scr[h] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_ref[0, h]) * scale).astype(q.dtype)
        dk_scr[h] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(q_i == nq - 1)
    def _finish():
        dk_rot = dk_scr[...]
        if use_rope:
            dk_rot = _rope_rotate_t(dk_rot, kcos, ksin)
        dk_ref[0] = dk_rot.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    dq_ref, dkp_ref, dvp_ref, dq_scr,
    *, scale: float, block_q: int, block_k: int, block_h: int, causal: bool,
    use_rope: bool, use_segments: bool, kv_valid: int | None,
):
    """One-pass backward: s/p are recomputed ONCE per (i, j) block pair
    instead of once in the dq pass and again in the dk/dv pass — the
    kernels are VPU-bound, so this nearly halves the backward's softmax
    work. dq accumulates in scratch over the (innermost) k loop as usual;
    dk/dv contributions can't accumulate in scratch here (their blocks
    recur across the OUTER q loop), so each (i, j) writes an fp32 partial
    to HBM ([B, H, nq, M, D]) and XLA sums the nq slices afterwards. Only
    dispatched when that partial buffer and the block footprint are small
    (`_flash_bwd_bhnd`); the RoPE adjoint on dk moves to XLA after the sum.
    """
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    mask = None
    if causal or use_segments:
        q_i = pl.program_id(1)
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols

    if use_rope:
        qcos = qcos_ref[0]
        qsin = qsin_ref[0]

    for h in range(block_h):
        q = q_ref[0, h]
        k = k_ref[0, h]
        if use_rope:
            q = _rope_rotate(q.astype(jnp.float32), qcos, qsin)
            k = _rope_rotate(
                k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
            ).astype(k_ref.dtype)
        else:
            q = q.astype(jnp.float32)
        # both an unscaled q (for dk = ds^T q) and a scaled copy (scores)
        qu = q.astype(q_ref.dtype)
        qs = (q * (scale * LOG2E)).astype(q_ref.dtype)

        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # base-2 scaled
        if mask is not None:
            s = jnp.where(mask, s, NEG_INF)
        if kv_valid is not None:
            s = _mask_pad_cols(s, kv_i, nk, block_q, block_k, kv_valid)

        lse = lse_ref[0, h]  # [BLK_Q, 1], base-2 scale
        p = jnp.where(lse > NEG_INF * 0.5, jnp.exp2(s - lse), 0.0)
        do = do_ref[0, h]
        dvp_ref[0, h, 0] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_ref[0, h]) * scale).astype(qu.dtype)
        # dk partial w.r.t. the ROTATED k — the rope adjoint is applied in
        # XLA after the partial sum
        dkp_ref[0, h, 0] = jax.lax.dot_general(
            ds, qu, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_scr[h] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kv_i == nk - 1)
    def _finish():
        dq_rot = dq_scr[...]
        if use_rope:
            dq_rot = _rope_rotate_t(dq_rot, qcos, qsin)
        dq_ref[0] = dq_rot.astype(dq_ref.dtype)


# one-pass backward dispatch gates: the fused kernel keeps ~4 score-shaped
# fp32 buffers live (block product cap stays under the 16 MB scoped-VMEM
# cliff) and materializes [B, H, nq, M, D] fp32 dk/dv partials in HBM
_FUSED_BWD = True
_FUSED_MAX_BLOCK_PRODUCT = 900_000
_FUSED_MAX_PARTIAL_BYTES = 400_000_000


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "block_h",
                     "interpret", "kv_valid"),
)
def _flash_bwd_bhnd(
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, do, seg_kv=None,
    causal=False, scale=None, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
    block_h=1, interpret=False, kv_valid=None,
):
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    assert H % block_h == 0, (H, block_h)
    if kv_valid is not None:
        # same contract as the forward: _mask_pad_cols only masks pad
        # columns inside the LAST kv block, so a tail pad spilling into an
        # earlier block would contribute silently-wrong dq/dk/dv
        assert M - kv_valid < block_k, (M, kv_valid, block_k)
    hb = H // block_h
    use_segments = seg is not None
    use_rope = qcos is not None
    if seg is None:
        seg = jnp.zeros((B, N), jnp.int32)
    if seg_kv is None:
        seg_kv = seg if N == M else jnp.zeros((B, M), jnp.int32)
    segf = seg.astype(jnp.float32)[:, :, None]  # fp32 columns (see fwd)
    segkf = seg_kv.astype(jnp.float32)[:, :, None]
    if qcos is None:
        qcos = qsin = _zeros_like_table(q)
        kcos = ksin = _zeros_like_table(k)
    tb = qcos.shape[0]

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B,H,N]

    # kernels recompute p as exp2(s2 - lse2) with s2 base-2 scaled — convert
    # the (natural-log) saved lse once here instead of per score element
    lse2 = (lse * LOG2E)[..., None]  # [B, H, N, 1]
    delta2 = delta[..., None]

    def spec_q(blk):
        return pl.BlockSpec((1, block_h, blk, D),
                            lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_k(blk):
        return pl.BlockSpec((1, block_h, blk, D),
                            lambda g, i, j, hb=hb: (g // hb, g % hb, j, 0),
                            memory_space=pltpu.VMEM)

    nq = N // block_q
    partial_bytes = 2 * B * H * nq * M * D * 4
    if (_FUSED_BWD
            and block_q * block_k <= _FUSED_MAX_BLOCK_PRODUCT
            and partial_bytes <= _FUSED_MAX_PARTIAL_BYTES):
        common = [
            pl.BlockSpec((1, block_q, 1), lambda g, i, j, hb=hb: (g // hb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda g, i, j, hb=hb: (g // hb, j, 0), memory_space=pltpu.VMEM),
            spec_q(block_q),  # q
            spec_k(block_k),  # k
            spec_k(block_k),  # v
            spec_q(block_q),  # do
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # lse
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec((1, block_q, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
        ]
        partial_spec = pl.BlockSpec(
            (1, block_h, 1, block_k, D),
            lambda g, i, j, hb=hb: (g // hb, g % hb, i, j, 0),
            memory_space=pltpu.VMEM,
        )
        dq, dkp, dvp = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel, scale=scale, block_q=block_q,
                block_k=block_k, block_h=block_h, causal=causal,
                use_rope=use_rope, use_segments=use_segments,
                kv_valid=kv_valid,
            ),
            grid=(B * hb, nq, M // block_k),
            in_specs=common,
            out_specs=[spec_q(block_q), partial_spec, partial_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, nq, M, D), jnp.float32),
                jax.ShapeDtypeStruct((B, H, nq, M, D), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((block_h, block_q, D), jnp.float32)],
            interpret=interpret,
        )(segf, segkf, q, k, v, do, lse2, delta2, qcos, qsin, kcos, ksin)
        dk = dkp.sum(axis=2)
        dv = dvp.sum(axis=2).astype(v.dtype)
        if use_rope:
            dk = _rope_rotate_t(dk, kcos[:, None], ksin[:, None])
        return dq, dk.astype(k.dtype), dv

    # dq: grid (B*hb, nq, nk) — k innermost, dq accumulates in scratch
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            block_h=block_h, causal=causal, use_rope=use_rope,
            use_segments=use_segments, kv_valid=kv_valid,
        ),
        grid=(B * hb, N // block_q, M // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda g, i, j, hb=hb: (g // hb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda g, i, j, hb=hb: (g // hb, j, 0), memory_space=pltpu.VMEM),
            spec_q(block_q),  # q
            spec_k(block_k),  # k
            spec_k(block_k),  # v
            spec_q(block_q),  # do
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # lse
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec((1, block_q, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=spec_q(block_q),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_h, block_q, D), jnp.float32)],
        interpret=interpret,
    )(segf, segkf, q, k, v, do, lse2, delta2, qcos, qsin, kcos, ksin)

    # dk/dv: grid (B*hb, nk, nq) — q innermost, dk/dv accumulate in scratch
    def spec_q2(blk):
        return pl.BlockSpec((1, block_h, blk, D),
                            lambda g, j, i, hb=hb: (g // hb, g % hb, i, 0),
                            memory_space=pltpu.VMEM)

    def spec_k2(blk):
        return pl.BlockSpec((1, block_h, blk, D),
                            lambda g, j, i, hb=hb: (g // hb, g % hb, j, 0),
                            memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            block_h=block_h, causal=causal, use_rope=use_rope,
            use_segments=use_segments, kv_valid=kv_valid,
        ),
        grid=(B * hb, M // block_k, N // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda g, j, i, hb=hb: (g // hb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda g, j, i, hb=hb: (g // hb, j, 0), memory_space=pltpu.VMEM),
            spec_q2(block_q),  # q
            spec_k2(block_k),  # k
            spec_k2(block_k),  # v
            spec_q2(block_q),  # do
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, j, i, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # lse
            pl.BlockSpec((1, block_h, block_q, 1),
                         lambda g, j, i, hb=hb: (g // hb, g % hb, i, 0),
                         memory_space=pltpu.VMEM),  # delta
            pl.BlockSpec((1, block_q, D), lambda g, j, i, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda g, j, i, hb=hb, tb=tb: ((g // hb) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, j, i, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, j, i, hb=hb, tb=tb: ((g // hb) % tb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[spec_k2(block_k), spec_k2(block_k)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, M, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, M, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_h, block_k, D), jnp.float32),
            pltpu.VMEM((block_h, block_k, D), jnp.float32),
        ],
        interpret=interpret,
    )(segf, segkf, q, k, v, do, lse2, delta2, qcos, qsin, kcos, ksin)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# Differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16)
)
def _flash_attention_core(
    q, k, v, seg, qcos, qsin, kcos, ksin,
    causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, block_h,
    interpret, kv_valid,
):
    out, _ = _flash_fwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        block_h=block_h, interpret=interpret, kv_valid=kv_valid,
    )
    return out


def _core_fwd(q, k, v, seg, qcos, qsin, kcos, ksin, causal, scale, block_q,
              block_k, bwd_block_q, bwd_block_k, block_h, interpret, kv_valid):
    out, lse = _flash_fwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        block_h=block_h, interpret=interpret, kv_valid=kv_valid,
    )
    return out, (q, k, v, seg, qcos, qsin, kcos, ksin, out, lse)


def _core_bwd(causal, scale, block_q, block_k, bwd_block_q, bwd_block_k,
              block_h, interpret, kv_valid, res, g):
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse = res
    dq, dk, dv = _flash_bwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, g,
        causal=causal, scale=scale, block_q=bwd_block_q, block_k=bwd_block_k,
        block_h=block_h, interpret=interpret, kv_valid=kv_valid,
    )
    def zeros(x):
        if x is None:
            return None
        # integer primals take float0 cotangents (JAX's AD contract) — a dense
        # int-zeros array only works by accident on some versions (ADVICE r2)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    return dq, dk, dv, zeros(seg), zeros(qcos), zeros(qsin), zeros(kcos), zeros(ksin)


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# Saveable-residual variant (policy remat)
# ---------------------------------------------------------------------------
# Under block-level `jax.checkpoint` the custom-vjp residuals above are
# OPAQUE: a names-based remat policy cannot save (out, lse), so the bwd
# pass re-runs the forward kernel just to regenerate them — the single
# most expensive piece of the recompute at cooldown shapes (N=8192 the
# score matmuls dominate the block). This variant splits the call:
#
#   out, lse = <raw fwd kernel on stop_gradient inputs>   # plain values
#   out, lse = checkpoint_name(..., 'flash_out'/'flash_lse')
#   out      = _flash_grad_attach(q, k, v, ..., out, lse) # identity fwd
#
# `_flash_grad_attach`'s residuals are its own INPUTS, so with policy
# `save_only_these_names('flash_out', 'flash_lse')` the bwd needs only
# (q, k, v) recomputed (one LN + qkv projection) and the fwd kernel is
# DCE'd out of the recompute jaxpr entirely. Verified structurally by
# jaxpr kernel counts (`tests/ops/test_remat_policy.py`). With no remat
# (or full remat) the structure is cost-neutral: same single fwd call,
# same residual set, identical bwd math.

SAVEABLE_RESIDUALS = True


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18)
)
def _flash_grad_attach(
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse,
    causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, block_h,
    interpret, kv_valid,
):
    return out


def _attach_fwd(q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, causal,
                scale, block_q, block_k, bwd_block_q, bwd_block_k, block_h,
                interpret, kv_valid):
    return out, (q, k, v, seg, qcos, qsin, kcos, ksin, out, lse)


def _attach_bwd(causal, scale, block_q, block_k, bwd_block_q, bwd_block_k,
                block_h, interpret, kv_valid, res, g):
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse = res
    dq, dk, dv = _flash_bwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, g,
        causal=causal, scale=scale, block_q=bwd_block_q, block_k=bwd_block_k,
        block_h=block_h, interpret=interpret, kv_valid=kv_valid,
    )

    def zeros(x):
        if x is None:
            return None
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    # out/lse arrive via stop_gradient'd kernel outputs — their zero
    # cotangents are DCE'd by XLA
    return (dq, dk, dv, zeros(seg), zeros(qcos), zeros(qsin), zeros(kcos),
            zeros(ksin), jnp.zeros_like(out), jnp.zeros_like(lse))


_flash_grad_attach.defvjp(_attach_fwd, _attach_bwd)


def _sg(x):
    return None if x is None else jax.lax.stop_gradient(x)


def _splithalf_layout(d: int, rot: int):
    """Head-dim permutation (interleaved-pair -> split-half) for a head of
    width ``d`` whose first ``rot`` features are rotated.

    The kernel pairs position i with i + d/2. We place the rotated pairs'
    even elements at [0, rot/2), odd elements at [d/2, d/2 + rot/2), and the
    unrotated tail in the remaining slots (where sin==0, so pairing is
    inert). Returns (perm, cos_scatter, sin_scatter) where the scatters map a
    [..., rot] table onto [..., d] with cos padded by 1 and sin by 0.
    """
    assert rot % 2 == 0 and d % 2 == 0 and rot <= d
    half = d // 2
    perm = np.empty(d, np.int64)
    perm[: rot // 2] = np.arange(0, rot, 2)          # even rotated
    perm[half : half + rot // 2] = np.arange(1, rot, 2)  # odd rotated
    tail = np.arange(rot, d)
    n1 = half - rot // 2
    perm[rot // 2 : half] = tail[:n1]
    perm[half + rot // 2 :] = tail[n1:]
    # positions in the permuted vector that hold rotated features
    rot_slots = np.concatenate(
        [np.arange(0, rot // 2), np.arange(half, half + rot // 2)]
    )
    # table index feeding each rotated slot (cos/sin are [..., rot])
    tbl_idx = np.concatenate([np.arange(0, rot, 2), np.arange(1, rot, 2)])
    return perm, rot_slots, tbl_idx


def expand_rope_tables(cos, sin, head_dim: int):
    """[..., N, rot] interleaved-convention tables -> split-half [..., N, D]
    (cos padded with 1, sin with 0 over the unrotated tail). Also returns the
    q/k head-dim permutation to apply alongside."""
    rot = cos.shape[-1]
    perm, rot_slots, tbl_idx = _splithalf_layout(head_dim, rot)
    shape = cos.shape[:-1] + (head_dim,)
    cos_full = jnp.ones(shape, cos.dtype).at[..., rot_slots].set(cos[..., tbl_idx])
    sin_full = jnp.zeros(shape, sin.dtype).at[..., rot_slots].set(sin[..., tbl_idx])
    return cos_full, sin_full, perm


def expand_rope_cache(rope_cache, head_dim: int):
    """Hoist the flash-rope prologue out of the per-layer call (r3 trace: the
    per-call expand+permute showed up as ~4 `multiply_add_fusion`s per flash
    call, ~20 ms/step at ViT-L).

    (cos, sin) interleaved-convention [N, rot] or [B, N, rot] ->
    ((cos_full, sin_full) split-half [B|1, N, D] fp32, perm) computed ONCE
    per forward; every layer then passes ``rope_expanded`` and applies
    ``perm`` inside its qkv projection weights instead of gathering q/k.
    """
    cos, sin = rope_cache
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos_full, sin_full, perm = expand_rope_tables(cos, sin, head_dim)
    return (cos_full.astype(jnp.float32), sin_full.astype(jnp.float32)), perm


def pick_block(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= target and a multiple of 8
    (the f32 sublane tile), falling back to the largest divisor."""
    best = 1
    for b in range(1, min(n, target) + 1):
        if n % b == 0 and (b % 8 == 0 or best < 8):
            best = max(best, b)
    return best




def flash_attention_bhnd(
    q, k, v,
    segment_ids=None,
    causal: bool = False,
    scale: float | None = None,
    rope_tables=None,
    rope_expanded=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    bwd_block_q: int | None = None,
    bwd_block_k: int | None = None,
    block_h: int | None = None,
    interpret: bool = False,
    kv_valid_len: int | None = None,
):
    """Flash attention over [B, H, N, D] tensors. Differentiable.

    kv_valid_len: static count of REAL key/value columns when the caller
    tail-padded the sequence — cheaper than segment ids (mask work only in
    the boundary kv block; no fp32 segment side-inputs).

    segment_ids: [B, N] int32; token i attends to j iff seg[i] >= seg[j]
    (frame-causal). rope_tables: (cos, sin) in the model's interleaved-pair
    convention, shape [N, D] or [B, N, D]; applied to q and k inside the
    kernel (q/k must NOT be pre-rotated).

    rope_expanded: (cos_full, sin_full) from `expand_rope_cache` — the
    split-half [B|1, N, D] fp32 tables, with q/k ALREADY permuted (the
    caller folded `perm` into its qkv projection). Skips the per-call
    expand+permute prologue.

    bwd_block_q/bwd_block_k: block sizes for the backward kernels
    (default: the forward blocks — fastest by in-process A/B, see the
    inline comment below). The backward keeps ~4 score-shaped fp32
    intermediates live, so forward-sized blocks ride the 16 MB
    scoped-VMEM cliff on v5e; pass smaller blocks here if a program
    fails to compile with "Scoped allocation ... exceeded scoped vmem
    limit".

    block_h: heads per grid cell (must divide H; default: enough heads to
    fill the 128-lane tile at tiny head dims, e.g. 4 for D=32) — at
    predictor widths the per-cell DMA/setup dominates the tiny per-head
    compute, so one cell serves several heads and shares its rope-table
    load.
    """
    if segment_ids is not None and causal:
        # the kernels apply the segment mask OR the token-causal mask, never
        # both — reject rather than silently dropping the causal constraint
        # (frame-causal attention rides segment_ids alone: seg[i] >= seg[j])
        raise ValueError(
            "flash_attention: segment_ids and causal=True cannot be "
            "combined; encode causality in the segment ids instead")
    qcos = qsin = kcos = ksin = None
    if rope_expanded is not None:
        qcos = kcos = rope_expanded[0]  # [B|1, N, D] split-half, pre-expanded
        qsin = ksin = rope_expanded[1]
        qp, kp = q, k  # caller permuted q/k via its projection weights
    elif rope_tables is not None:
        cos, sin = rope_tables  # [..., N, rot] interleaved convention
        if cos.ndim == 2:
            cos, sin = cos[None], sin[None]
        cos, sin, perm = expand_rope_tables(cos, sin, q.shape[-1])
        qcos = kcos = cos.astype(jnp.float32)  # [B|1, N, D]
        qsin = ksin = sin.astype(jnp.float32)
        qp = q[..., perm]
        kp = k[..., perm]
    else:
        qp, kp = q, k

    n, m = q.shape[2], k.shape[2]
    if n % min(block_q, n) != 0:
        block_q = pick_block(n, block_q)
    if m % min(block_k, m) != 0:
        block_k = pick_block(m, block_k)
    # Narrow heads (predictor D=32) tip the fwd scoped-VMEM cliff with
    # full-width q blocks when k streams full-N (832x1664 measured 16.21 MB
    # in the train program, 212 KB over). Halving block_q is timing-neutral
    # there (416x1664: 1.458 ms vs 832x1664: 1.441 ms, r3 probe) and gives
    # ~3 MB of headroom.
    if q.shape[-1] < 64 and block_q * block_k > 416 * 1664:
        block_q = pick_block(n, max(block_q // 2, 8))
    # Encoder-width DEFAULT fwd blocks land on FWD_CAP_WIDE (caller-supplied
    # blocks above the cap area are clamped dim-by-dim, not re-searched): the
    # full-N k default measured 20.4 MB scoped VMEM in the train program
    # with rope tables riding (fit standalone — the scoped-VMEM stack
    # depends on the surrounding program), the 1024^2 rope cap still
    # measured 18.44 MB inside the full ViT-L pretrain program (r4 LN A/B
    # baseline compile), and the LN+qkv-fused step — where rope is applied
    # inside the prologue so no tables ride here — hit the same 18.44 MB
    # with the uncapped full-N block. 512x1024 compiles and runs in every
    # surrounding program tried; the full-N k win was ~8% and only held
    # rope-free, and halving the q block was timing-neutral in the sweeps.
    if q.shape[-1] >= 64 and FWD_CAP_WIDE is not None:
        cap_q, cap_k = FWD_CAP_WIDE
        if block_q * block_k > cap_q * cap_k and block_k > cap_k:
            block_k = pick_block(m, cap_k)
        if block_q * block_k > cap_q * cap_k and block_q > cap_q:
            block_q = pick_block(n, cap_q)
    # Default backward blocks: 1024-capped (NOT the forward blocks — the
    # forward default streams full-N k blocks, which would put ~4
    # score-shaped fp32 buffers over the 16 MB scoped-VMEM cliff in the
    # backward). The explicit kwargs below are the escape hatch for program
    # shapes that still tip over.
    # r3 bwd sweeps (tunnel-safe, rope engaged): encoder-width heads are
    # fastest at square 1024 blocks (5.19 ms vs 5.37 for 512x2048 at
    # B8 H16 N2048 D64); narrow heads are fastest with a full-N k block and
    # a narrow q block (pred B8 H12 N1664 D32: 416x1664 3.86 ms, 256x1664
    # 4.29 ms vs 832x832 4.87 ms). 416-wide q blocks measured 16.01 MB
    # against the 16.00 MB scoped-VMEM limit inside the train program, so
    # the default targets 384 (-> 208/272 at predictor lengths) for margin.
    d_head = q.shape[-1]
    if bwd_block_q is None:
        bwd_block_q = pick_block(n, DEFAULT_BWD_BLOCK if d_head >= 64 else 384)
    elif n % min(bwd_block_q, n) != 0:
        bwd_block_q = pick_block(n, bwd_block_q)
    if bwd_block_k is None:
        bwd_block_k = pick_block(
            m, DEFAULT_BWD_BLOCK if d_head >= 64 else DEFAULT_BLOCK_K)
    elif m % min(bwd_block_k, m) != 0:
        bwd_block_k = pick_block(m, bwd_block_k)
    H = q.shape[1]
    if block_h is None:
        # v5e sweep (scripts/probe_flash_headpack.py): packing heads per
        # cell does NOT pay — the kernels are VPU-element-bound (softmax
        # cycles per score dominate at any head dim), bh=2 times the same
        # as bh=1, and bh>=4 blows the 16 MB scoped-VMEM budget because
        # Mosaic keeps every unrolled head's score block live. Keep 1; the
        # knob stays for sweeps on other topologies.
        block_h = 1
    assert H % block_h == 0, (H, block_h)
    if SAVEABLE_RESIDUALS:
        from jax.ad_checkpoint import checkpoint_name

        seg = segment_ids
        if seg is not None and seg.ndim == 1:
            seg = seg[None]
        qp = checkpoint_name(qp, "flash_qkv")
        kp = checkpoint_name(kp, "flash_qkv")
        v = checkpoint_name(v, "flash_qkv")
        outv, lsev = _flash_fwd_bhnd(
            _sg(qp), _sg(kp), _sg(v), _sg(seg), _sg(qcos), _sg(qsin),
            _sg(kcos), _sg(ksin), causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, block_h=block_h,
            interpret=interpret, kv_valid=kv_valid_len,
        )
        outv = checkpoint_name(outv, "flash_out")
        lsev = checkpoint_name(lsev, "flash_lse")
        return _flash_grad_attach(
            qp, kp, v, seg, qcos, qsin, kcos, ksin, outv, lsev,
            causal, scale, block_q, block_k, bwd_block_q, bwd_block_k,
            block_h, interpret, kv_valid_len,
        )
    out = _flash_attention_core(
        qp, kp, v, segment_ids, qcos, qsin, kcos, ksin,
        causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, block_h,
        interpret, kv_valid_len,
    )
    return out


def flash_attention(
    q, k, v,
    segment_ids=None,
    causal: bool = False,
    scale: float | None = None,
    rope_tables=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    bwd_block_q: int | None = None,
    bwd_block_k: int | None = None,
    block_h: int | None = None,
    interpret: bool = False,
    kv_valid_len: int | None = None,
):
    """BNHD convenience wrapper: q, k, v [B, N, H, D] -> [B, N, H, D]."""
    out = flash_attention_bhnd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        segment_ids=segment_ids, causal=causal, scale=scale,
        rope_tables=rope_tables, block_q=block_q, block_k=block_k,
        bwd_block_q=bwd_block_q, bwd_block_k=bwd_block_k, block_h=block_h,
        interpret=interpret, kv_valid_len=kv_valid_len,
    )
    return out.transpose(0, 2, 1, 3)


# Explicit override for `_mosaic_available` (tests / forced-interpret runs):
# None = autodetect, True/False = forced. This is the supported knob; the
# jax._src probe below reads a PRIVATE attribute (no public API exposes the
# force_tpu_interpret_mode state as of jax 0.9) and a rename would only
# silently disable interpret-mode dispatch, which tests guard via this flag.
FORCE_MOSAIC_AVAILABLE: bool | None = None


def _mosaic_available() -> bool:
    """True when Pallas TPU kernels can actually execute here: a real TPU
    backend, or CPU under ``pltpu.force_tpu_interpret_mode()`` (tests)."""
    if FORCE_MOSAIC_AVAILABLE is not None:
        return FORCE_MOSAIC_AVAILABLE
    try:
        from jax._src import config as _jcfg

        cm = getattr(_jcfg, "pallas_tpu_interpret_mode_context_manager", None)
        if cm is not None and cm.value is not None:
            return True
    except Exception:
        pass
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or getattr(d, "device_kind", "").startswith("TPU")
    except Exception:
        return False


def supports(n: int, d: int, has_mask: bool, is_causal: bool,
             block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K) -> bool:
    """Shapes/mask configs the kernels handle, AND the backend can run them —
    so ``use_flash=True`` is safe on any host: CPU without interpret mode
    falls back to the XLA path instead of failing in Mosaic lowering."""
    if not _mosaic_available():
        return False
    if has_mask and is_causal:
        # the kernels apply EITHER the segment mask OR token-causal, never
        # both (`_fwd_kernel`: segments win) — reject the combination rather
        # than silently dropping the causal constraint
        return False
    if n % 8 != 0:  # sublane-tile alignment; blocks adapt via pick_block
        return False
    if pick_block(n, block_q) < 8 or pick_block(n, block_k) < 8:
        return False
    if d % 2 != 0 or d > 256:
        return False
    return True
