"""Ring attention: sequence/context parallelism over a mesh axis.

Capability headroom beyond the reference (which has no TP/SP/CP at all,
SURVEY.md §2.6): at 64f@384px one clip is 18,432 tokens; sharding the token
dim lets activation memory scale with chips and a single long clip span a
slice. K/V blocks rotate around the ring via ``ppermute`` — the classic
ring-attention schedule (Liu et al.) on XLA collectives over ICI.

r3 redesign (VERDICT #2):

* **Each hop runs the Pallas flash kernel** (bf16 MXU inputs, fp32
  accumulation) when the local shard shape supports it; hops fall back to an
  XLA formulation that still feeds the MXU in the storage dtype (the r2 ring
  upcast q/k to fp32 *before* the einsum — the 8x-slower fp32 MXU path).
* **Bespoke ring VJP** instead of AD through the hop loop: the forward saves
  only (q, k, v, out, global lse); the backward runs its own ring in which
  dk/dv partials rotate *with* their K/V blocks (one extra rotation returns
  them home). Each backward hop reuses the flash backward kernels with the
  GLOBAL lse — p = exp(s - lse_total) is exactly the globally-normalized
  probability block, so per-hop kernel gradients are the per-hop
  contributions to the total gradient.
* **Non-divisible sequences are padded onto the ring** (segment-isolated pad
  keys, pad rows sliced off) instead of silently replicating the forward on
  every device (the r2 behavior for masked-context forwards,
  `ring_attention.py:124-133` r2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops import flash_attention as fa

NEG_INF = -1e30


def _hop_supported(n_loc: int, d: int) -> bool:
    return fa.supports(n_loc, d, True, False)


def _default_use_kernel(n_loc: int, d: int) -> bool:
    """Kernel hops engage by DEFAULT only on a real TPU backend: under
    ``force_tpu_interpret_mode`` on CPU, `fa.supports` says yes (so explicit
    ``use_kernel=True`` still works — `test_ring_flash_hops_interpret`), but
    a whole model's ring in interpreted Pallas is ~1000x slower than the XLA
    fallback, which hung the CP smoke test for 20+ min."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    return on_tpu and _hop_supported(n_loc, d)


def _hop_fwd(q, k, v, seg_q, seg_kv, scale, use_kernel):
    """One ring hop: local attention of q against a (possibly rotated) K/V
    block. q,k,v: [B, H, n, D]; segs: [B, n] int32 or None.
    Returns (out normalized [B, H, n, D], lse natural-log [B, H, n])."""
    if use_kernel:
        n = q.shape[2]
        blk = fa.pick_block(n, fa.DEFAULT_BLOCK_Q)
        return fa._flash_fwd_bhnd(
            q, k, v, seg_q, None, None, None, None, seg_kv=seg_kv,
            scale=scale, block_q=blk, block_k=blk,
        )
    # XLA fallback: matmul inputs stay in the storage dtype (bf16 MXU on
    # TPU); softmax in fp32
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    ) * scale  # [B, H, n, m]
    if seg_q is not None:
        mask = seg_q[:, None, :, None] >= seg_kv[:, None, None, :]
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.maximum(m, NEG_INF * 0.5)
    p = jnp.exp(s - m_safe)
    if seg_q is not None:
        p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) / jnp.where(l == 0.0, 1.0, l)
    lse = jnp.where(l[..., 0] > 0.0, m_safe[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-38)),
                    NEG_INF)
    return out.astype(q.dtype), lse


def _hop_bwd(q, k, v, seg_q, seg_kv, out, lse, do, scale, use_kernel):
    """Per-hop gradient contributions given the GLOBAL (out, lse)."""
    if use_kernel:
        n, m, d = q.shape[2], k.shape[2], q.shape[3]
        # backward-capped blocks (NOT the forward sizes): the bwd kernels
        # keep ~4 score-shaped fp32 buffers live, and forward-sized blocks
        # (1024x2048) sit far over the 16 MB scoped-VMEM cliff — same
        # resolution as flash_attention_bhnd's bwd defaults
        bq = fa.pick_block(n, fa.DEFAULT_BWD_BLOCK if d >= 64 else 384)
        bk = fa.pick_block(m, fa.DEFAULT_BWD_BLOCK if d >= 64 else fa.DEFAULT_BLOCK_K)
        return fa._flash_bwd_bhnd(
            q, k, v, seg_q, None, None, None, None, out, lse, do,
            seg_kv=seg_kv, scale=scale, block_q=bq, block_k=bk,
        )
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    ) * scale
    if seg_q is not None:
        mask = seg_q[:, None, :, None] >= seg_kv[:, None, None, :]
        s = jnp.where(mask, s, NEG_INF)
    # p from the global lse; fully-masked rows have lse == NEG_INF -> 0
    p = jnp.where(lse[..., None] > NEG_INF * 0.5, jnp.exp(s - lse[..., None]), 0.0)
    dof = do.astype(jnp.float32)
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # [B, H, m, D]
    dp = jax.lax.dot_general(
        do, v, (((3,), (3,)), ((0, 1), (0, 1))), preferred_element_type=jnp.float32
    )  # [B, H, n, m]
    delta = jnp.sum(dof * out.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _merge_hops(outs, lses):
    """Combine per-hop normalized outputs via their logsumexps."""
    lse_stack = jnp.stack(lses)  # [R, B, H, n]
    m = jnp.max(lse_stack, axis=0)
    m_safe = jnp.maximum(m, NEG_INF * 0.5)
    w = jnp.exp(lse_stack - m_safe[None])  # [R, B, H, n]
    denom = jnp.sum(w, axis=0)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = sum(
        (w[i] / denom)[..., None] * outs[i].astype(jnp.float32)
        for i in range(len(outs))
    )
    lse_tot = jnp.where(m > NEG_INF * 0.5, m_safe + jnp.log(jnp.maximum(
        jnp.sum(jnp.exp(lse_stack - m_safe[None]), axis=0), 1e-38)), NEG_INF)
    return out.astype(outs[0].dtype), lse_tot


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_core(axis_name, axis_size, scale, use_kernel, q, k, v, seg_q, seg_kv):
    out, _ = _ring_fwd_impl(axis_name, axis_size, scale, use_kernel,
                            q, k, v, seg_q, seg_kv)
    return out


def _ring_fwd_impl(axis_name, axis_size, scale, use_kernel, q, k, v, seg_q, seg_kv):
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    k_blk, v_blk, s_blk = k, v, seg_kv
    outs, lses = [], []
    for i in range(axis_size):
        o_i, lse_i = _hop_fwd(q, k_blk, v_blk, seg_q, s_blk, scale, use_kernel)
        outs.append(o_i)
        lses.append(lse_i)
        if i < axis_size - 1:  # final rotation would be a wasted collective
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            if s_blk is not None:
                s_blk = jax.lax.ppermute(s_blk, axis_name, perm)
    return _merge_hops(outs, lses)


def _ring_core_fwd(axis_name, axis_size, scale, use_kernel, q, k, v, seg_q, seg_kv):
    out, lse = _ring_fwd_impl(axis_name, axis_size, scale, use_kernel,
                              q, k, v, seg_q, seg_kv)
    return out, (q, k, v, seg_q, seg_kv, out, lse)


def _ring_core_bwd(axis_name, axis_size, scale, use_kernel, res, g):
    q, k, v, seg_q, seg_kv, out, lse = res
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    k_blk, v_blk, s_blk = k, v, seg_kv
    dq = jnp.zeros(q.shape, jnp.float32)
    dk_blk = jnp.zeros(k.shape, jnp.float32)
    dv_blk = jnp.zeros(v.shape, jnp.float32)
    for i in range(axis_size):
        dq_i, dk_i, dv_i = _hop_bwd(q, k_blk, v_blk, seg_q, s_blk, out, lse, g,
                                    scale, use_kernel)
        dq = dq + dq_i.astype(jnp.float32)
        dk_blk = dk_blk + dk_i.astype(jnp.float32)
        dv_blk = dv_blk + dv_i.astype(jnp.float32)
        # dk/dv rotate after EVERY hop (one more rotation than the forward):
        # after ``axis_size`` rotations each partial is home with its block
        dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
        if i < axis_size - 1:
            # k/v/seg after the final hop are never read — skipping their
            # last rotation saves 2-3 full-shard ICI transfers per layer
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            if s_blk is not None:
                s_blk = jax.lax.ppermute(s_blk, axis_name, perm)
    return (dq.astype(q.dtype), dk_blk.astype(k.dtype), dv_blk.astype(v.dtype),
            None, None)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


# Saveable-residual variant (policy remat) — same structure as
# `flash_attention._flash_grad_attach`. Under block-level remat the ring's
# custom-vjp residuals are opaque, so the bwd would re-run the ENTIRE ring
# forward per layer (axis_size kernel hops + 3*(axis_size-1) ppermutes)
# just to regenerate (out, lse). Splitting the call makes them
# checkpoint_name-tagged jaxpr values ('flash_out'/'flash_lse' — shared
# with the single-device kernels so one `remat_policy='save_attn'` covers
# both paths); the recompute then rebuilds only q/k/v (local qkv
# projection, no collectives).


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_grad_attach(axis_name, axis_size, scale, use_kernel,
                      q, k, v, seg_q, seg_kv, out, lse):
    return out


def _ring_attach_fwd(axis_name, axis_size, scale, use_kernel,
                     q, k, v, seg_q, seg_kv, out, lse):
    return out, (q, k, v, seg_q, seg_kv, out, lse)


def _ring_attach_bwd(axis_name, axis_size, scale, use_kernel, res, g):
    *_, out, lse = res
    dq, dk, dv, dsq, dskv = _ring_core_bwd(
        axis_name, axis_size, scale, use_kernel, res[:7], g)
    return (dq, dk, dv, dsq, dskv,
            jnp.zeros_like(out), jnp.zeros_like(lse))


_ring_grad_attach.defvjp(_ring_attach_fwd, _ring_attach_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    axis_size: int,
    segment_ids_q: jnp.ndarray | None = None,
    segment_ids_kv: jnp.ndarray | None = None,
    scale: float | None = None,
    use_kernel: bool | None = None,
) -> jnp.ndarray:
    """q, k, v: LOCAL shards [B, n_loc, H, D] (token dim sharded over
    ``axis_name``). segment_ids_*: local [B, n_loc] int32 (frame-causal rule
    seg_q >= seg_k), rotated alongside K/V. Returns the local output shard.
    """
    B, n_loc, H, D = q.shape
    scale = scale if scale is not None else 1.0 / (D**0.5)
    if use_kernel is None:
        use_kernel = _default_use_kernel(n_loc, D)
    qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    seg_q = None if segment_ids_q is None else segment_ids_q.astype(jnp.int32)
    seg_kv = None if segment_ids_kv is None else segment_ids_kv.astype(jnp.int32)
    if (seg_q is None) != (seg_kv is None):
        raise ValueError("segment_ids_q and segment_ids_kv must both be set")
    from vjepa2_tpu.ops import flash_attention as fa

    if fa.SAVEABLE_RESIDUALS:
        from jax.ad_checkpoint import checkpoint_name

        sg = fa._sg
        qh = checkpoint_name(qh, "flash_qkv")
        kh = checkpoint_name(kh, "flash_qkv")
        vh = checkpoint_name(vh, "flash_qkv")
        outv, lsev = _ring_fwd_impl(axis_name, axis_size, scale, use_kernel,
                                    sg(qh), sg(kh), sg(vh), sg(seg_q),
                                    sg(seg_kv))
        outv = checkpoint_name(outv, "flash_out")
        lsev = checkpoint_name(lsev, "flash_lse")
        out = _ring_grad_attach(axis_name, axis_size, scale, use_kernel,
                                qh, kh, vh, seg_q, seg_kv, outv, lsev)
    else:
        out = _ring_core(axis_name, axis_size, scale, use_kernel, qh, kh, vh,
                         seg_q, seg_kv)
    return out.transpose(0, 2, 1, 3)


def seq_sharded_attention(mesh, axis_name: str = "model",
                          use_kernel: bool | None = None):
    """Build a shard_map-wrapped attention over ``axis_name``.

    Returns fn(q, k, v[, segment_ids]) on GLOBAL [B, N, H, D] arrays with the
    token dim sharded over ``axis_name``; internally each device works on its
    local shard and K/V ride the ring. Sequences that don't divide the ring
    are PADDED onto it (segment-isolated pad keys, outputs sliced) — nothing
    silently replicates.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis_size = mesh.shape[axis_name]
    tok = P(None, axis_name, None, None)
    seg_spec = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tok, tok, tok, seg_spec),
        out_specs=tok,
        check_vma=False,
    )
    def _sharded(q, k, v, seg):
        return ring_attention(
            q, k, v, axis_name, axis_size,
            segment_ids_q=seg, segment_ids_kv=seg, use_kernel=use_kernel,
        )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tok, tok, tok),
        out_specs=tok,
        check_vma=False,
    )
    def _sharded_nomask(q, k, v):
        return ring_attention(q, k, v, axis_name, axis_size,
                              use_kernel=use_kernel)

    def apply(q, k, v, segment_ids=None):
        B, N = q.shape[0], q.shape[1]
        # pad to a multiple of axis_size*8 so every sequence rides the ring
        # (8 = fp32 sublane tile, the flash kernel's row granularity)
        quantum = axis_size * 8
        pad = (-N) % quantum
        if pad:
            widths = ((0, 0), (0, pad), (0, 0), (0, 0))
            q, k, v = (jnp.pad(t, widths) for t in (q, k, v))
            if segment_ids is None:
                segment_ids = jnp.zeros((B, N), jnp.int32)
        if segment_ids is not None:
            if segment_ids.ndim == 1:
                segment_ids = jnp.broadcast_to(segment_ids[None], (B, N))
            segment_ids = segment_ids.astype(jnp.int32)
            if pad:
                # pad keys get int32-max: no real query attends to them; pad
                # rows attend only among themselves and are sliced off below
                segment_ids = jnp.pad(
                    segment_ids, ((0, 0), (0, pad)),
                    constant_values=jnp.iinfo(jnp.int32).max)
            out = _sharded(q, k, v, segment_ids)
        else:
            out = _sharded_nomask(q, k, v)
        return out[:, :N] if pad else out

    apply.axis_size = axis_size
    return apply
