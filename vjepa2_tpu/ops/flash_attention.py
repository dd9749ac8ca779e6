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

DEFAULT_BLOCK_Q = 1024  # v5e sweep at ViT-g encode shape: 1024x1024 fwd 4.65 ms
DEFAULT_BLOCK_K = 1024  # (256x256: 12.6 ms; 512x512: 6.4 ms) — scripts/probe_flash_perf.py
NEG_INF = -1e30


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


def _fwd_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_q: int, block_k: int, causal: bool, use_rope: bool,
    use_segments: bool,
):
    """Grid (B*H, nq, nk), k innermost. Scratch persists across the k loop."""
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep matmul INPUTS in the storage dtype (bf16 on TPU: the MXU runs
    # bf16 x bf16 -> fp32-accumulate at full rate; casting inputs to fp32
    # would decompose to the ~8x slower fp32 path) — only accumulation and
    # the softmax run in fp32
    q = q_ref[0]  # [BLK_Q, D]
    k = k_ref[0]  # [BLK_K, D]
    if use_rope:
        q = _rope_rotate(
            q.astype(jnp.float32), qcos_ref[0], qsin_ref[0]
        ).astype(q_ref.dtype)
        k = _rope_rotate(
            k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
        ).astype(k_ref.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLK_Q, BLK_K] fp32

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
        s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[...]  # [BLK_Q, 1] broadcast via lane-128 scratch
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [BLK_Q, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # masked entries: exp(-inf) = 0
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(denom)  # [BLK_Q, 1]


def _zeros_like_table(q):
    return jnp.zeros((1, q.shape[2], q.shape[3]), q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def _flash_fwd_bhnd(
    q, k, v, seg, qcos, qsin, kcos, ksin,
    causal=False, scale=None, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
    interpret=False,
):
    """q,k,v: [B, H, N, D] (+ optional seg [B, N], rope tables [B|1, 1, N, D]).

    Returns (out [B, H, N, D], lse [B, H, N] fp32).
    """
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    assert N % block_q == 0 and M % block_k == 0, (N, M, block_q, block_k)
    use_segments = seg is not None
    assert not use_segments or N == M, "segment ids assume self-attention (N == M)"
    use_rope = qcos is not None

    if seg is None:
        seg = jnp.zeros((B, M), jnp.int32)
    # TPU tiling: the last two dims of a block must be (8k, 128k) or equal
    # the array dims. Segments ride as fp32 [B, N|M, 1] columns blocked like
    # q and k (no dynamic-offset row loads — see `_seg_mask`); lse is
    # emitted as [BH, N, 1] with block (1, BLK_Q, 1) for the same reason.
    segf = seg.astype(jnp.float32)[:, :, None]
    if qcos is None:
        qcos = qsin = _zeros_like_table(q)
        kcos = ksin = _zeros_like_table(k)
    tb = qcos.shape[0]  # 1 (shared) or B (per-batch tables)

    q3 = q.reshape(B * H, N, D)
    grid = (B * H, N // block_q, M // block_k)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        causal=causal, use_rope=use_rope, use_segments=use_segments,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # segment columns, once blocked by the q index and once by k
            pl.BlockSpec((1, block_q, 1), lambda b, i, j, H=H: (b // H, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda b, i, j, H=H: (b // H, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            # rope tables [tb, N, D], indexed like q / k
            pl.BlockSpec((1, block_q, D),
                         lambda b, i, j, H=H, tb=tb: ((b // H) % tb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D),
                         lambda b, i, j, H=H, tb=tb: ((b // H) % tb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D),
                         lambda b, i, j, H=H, tb=tb: ((b // H) % tb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D),
                         lambda b, i, j, H=H, tb=tb: ((b // H) % tb, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom
            pltpu.VMEM((block_q, D), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(
        segf, segf,
        q3,
        k.reshape(B * H, M, D),
        v.reshape(B * H, M, D),
        qcos, qsin, kcos, ksin,
    )
    return out.reshape(B, H, N, D), lse.reshape(B, H, N)


def _dq_kernel(
    segq_ref, segk_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    qcos_ref, qsin_ref, kcos_ref, ksin_ref,
    dq_ref, dq_scr,
    *, scale: float, block_q: int, block_k: int, causal: bool, use_rope: bool,
    use_segments: bool,
):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    if use_rope:
        qcos = qcos_ref[0]
        qsin = qsin_ref[0]
        q = _rope_rotate(q.astype(jnp.float32), qcos, qsin).astype(q_ref.dtype)
        k = _rope_rotate(
            k.astype(jnp.float32), kcos_ref[0], ksin_ref[0]
        ).astype(k_ref.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if causal or use_segments:
        q_i = pl.program_id(1)
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols
        s = jnp.where(mask, s, NEG_INF)

    # fully-masked rows have lse == NEG_INF; exp(s - lse) would be exp(0) = 1
    # for every masked entry, so zero those rows explicitly (ADVICE r2)
    lse = lse_ref[0]  # [BLK_Q, 1]
    p = jnp.where(lse > NEG_INF * 0.5, jnp.exp(s - lse), 0.0)  # [BLK_Q, BLK_K]
    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[0]) * scale).astype(k.dtype)
    dq_scr[...] += jax.lax.dot_general(
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
    *, scale: float, block_q: int, block_k: int, causal: bool, use_rope: bool,
    use_segments: bool,
):
    q_i = pl.program_id(2)  # q innermost here
    nq = pl.num_programs(2)

    @pl.when(q_i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    if use_rope:
        kcos = kcos_ref[0]
        ksin = ksin_ref[0]
        q = _rope_rotate(
            q.astype(jnp.float32), qcos_ref[0], qsin_ref[0]
        ).astype(q_ref.dtype)
        k = _rope_rotate(k.astype(jnp.float32), kcos, ksin).astype(k_ref.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BLK_Q, BLK_K]
    kv_i = pl.program_id(1)
    if causal or use_segments:
        if use_segments:
            mask = _seg_mask(segq_ref, segk_ref, block_q, block_k)
        else:
            rows = q_i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = rows >= cols
        s = jnp.where(mask, s, NEG_INF)

    lse = lse_ref[0]  # [BLK_Q, 1]
    p = jnp.where(lse > NEG_INF * 0.5, jnp.exp(s - lse), 0.0)
    do = do_ref[0]
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta_ref[0]) * scale).astype(q.dtype)
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_i == nq - 1)
    def _finish():
        dk_rot = dk_scr[...]
        if use_rope:
            dk_rot = _rope_rotate_t(dk_rot, kcos, ksin)
        dk_ref[0] = dk_rot.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def _flash_bwd_bhnd(
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, do,
    causal=False, scale=None, block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
    interpret=False,
):
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = scale if scale is not None else 1.0 / (D**0.5)
    block_q = min(block_q, N)
    block_k = min(block_k, M)
    use_segments = seg is not None
    use_rope = qcos is not None
    if seg is None:
        seg = jnp.zeros((B, M), jnp.int32)
    segf = seg.astype(jnp.float32)[:, :, None]  # fp32 columns (see fwd)
    if qcos is None:
        qcos = qsin = _zeros_like_table(q)
        kcos = ksin = _zeros_like_table(k)
    tb = qcos.shape[0]

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B,H,N]

    q3 = q.reshape(B * H, N, D)
    k3 = k.reshape(B * H, M, D)
    v3 = v.reshape(B * H, M, D)
    do3 = do.reshape(B * H, N, D)
    lse2 = lse.reshape(B * H, N, 1)
    delta2 = delta.reshape(B * H, N, 1)

    # dq: grid (BH, nq, nk) — k innermost, dq accumulates in scratch
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, use_rope=use_rope, use_segments=use_segments,
        ),
        grid=(B * H, N // block_q, M // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda b, i, j, H=H: (b // H, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda b, i, j, H=H: (b // H, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j, H=H, tb=tb: ((b // H) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j, H=H, tb=tb: ((b // H) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, H=H, tb=tb: ((b // H) % tb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, i, j, H=H, tb=tb: ((b // H) % tb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(segf, segf, q3, k3, v3, do3, lse2, delta2, qcos, qsin, kcos, ksin)

    # dk/dv: grid (BH, nk, nq) — q innermost, dk/dv accumulate in scratch
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            causal=causal, use_rope=use_rope, use_segments=use_segments,
        ),
        grid=(B * H, M // block_k, N // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, 1), lambda b, j, i, H=H: (b // H, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda b, j, i, H=H: (b // H, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, j, i, H=H, tb=tb: ((b // H) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, j, i, H=H, tb=tb: ((b // H) % tb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i, H=H, tb=tb: ((b // H) % tb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i, H=H, tb=tb: ((b // H) % tb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, M, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, M, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=interpret,
    )(segf, segf, q3, k3, v3, do3, lse2, delta2, qcos, qsin, kcos, ksin)

    return (
        dq.reshape(B, H, N, D),
        dk.reshape(B, H, M, D),
        dv.reshape(B, H, M, D),
    )


# ---------------------------------------------------------------------------
# Differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12)
)
def _flash_attention_core(
    q, k, v, seg, qcos, qsin, kcos, ksin,
    causal, scale, block_q, block_k, interpret,
):
    out, _ = _flash_fwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out


def _core_fwd(q, k, v, seg, qcos, qsin, kcos, ksin, causal, scale, block_q, block_k, interpret):
    out, lse = _flash_fwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out, (q, k, v, seg, qcos, qsin, kcos, ksin, out, lse)


def _core_bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, seg, qcos, qsin, kcos, ksin, out, lse = res
    dq, dk, dv = _flash_bwd_bhnd(
        q, k, v, seg, qcos, qsin, kcos, ksin, out, lse, g,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret,
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
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
):
    """Flash attention over [B, H, N, D] tensors. Differentiable.

    segment_ids: [B, N] int32; token i attends to j iff seg[i] >= seg[j]
    (frame-causal). rope_tables: (cos, sin) in the model's interleaved-pair
    convention, shape [N, D] or [B, N, D]; applied to q and k inside the
    kernel (q/k must NOT be pre-rotated).
    """
    qcos = qsin = kcos = ksin = None
    if rope_tables is not None:
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
    out = _flash_attention_core(
        qp, kp, v, segment_ids, qcos, qsin, kcos, ksin,
        causal, scale, block_q, block_k, interpret,
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
    interpret: bool = False,
):
    """BNHD convenience wrapper: q, k, v [B, N, H, D] -> [B, N, H, D]."""
    out = flash_attention_bhnd(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        segment_ids=segment_ids, causal=causal, scale=scale,
        rope_tables=rope_tables, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out.transpose(0, 2, 1, 3)


def _mosaic_available() -> bool:
    """True when Pallas TPU kernels can actually execute here: a real TPU
    backend, or CPU under ``pltpu.force_tpu_interpret_mode()`` (tests)."""
    try:
        from jax._src import config as _jcfg

        if _jcfg.pallas_tpu_interpret_mode_context_manager.value is not None:
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
