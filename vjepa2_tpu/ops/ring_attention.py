"""Ring attention: sequence/context parallelism over a mesh axis.

Capability headroom beyond the reference (which has no TP/SP/CP at all,
SURVEY.md §2.6): at 64f@384px one clip is 18,432 tokens; sharding the token
dim lets activation memory scale with chips and a single long clip span a
slice. Intended use: inside ``shard_map`` with q/k/v sharded on the token
dim over ``axis_name``; K/V blocks rotate around the ring via ``ppermute``
while a running online softmax accumulates the local output — the classic
ring-attention schedule (Liu et al.), expressed with XLA collectives (no
NCCL, no custom comm kernels — ICI does the work).

Differentiable via JAX AD through the ring loop (use remat around blocks at
training scale). Numerics: fp32 accumulation, output in input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    axis_size: int,
    segment_ids_q: jnp.ndarray | None = None,
    segment_ids_kv: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """q, k, v: LOCAL shards [B, n_loc, H, D] (token dim sharded over
    ``axis_name``). segment_ids_*: local [B, n_loc] int32 (frame-causal rule
    seg_q >= seg_k), rotated alongside K/V. Returns the local output shard.
    """
    B, n_loc, H, D = q.shape
    scale = scale if scale is not None else 1.0 / (D**0.5)
    qf = q.astype(jnp.float32)

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def step(carry, rotate: bool):
        k_blk, v_blk, seg_blk, m, l, acc = carry
        s = jnp.einsum(
            "bnhd,bmhd->bhnm", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        if seg_blk is not None:
            mask = segment_ids_q[:, None, :, None] >= seg_blk[:, None, None, :]
            s = jnp.where(mask, s, -1e30)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [B,H,n,1]
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        upd = jnp.einsum(
            "bhnm,bmhd->bnhd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr.transpose(0, 2, 1, 3) + upd
        if rotate:
            # rotate the K/V (and segment) blocks one hop around the ring
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            seg_blk = None if seg_blk is None else jax.lax.ppermute(seg_blk, axis_name, perm)
        return (k_blk, v_blk, seg_blk, m_new, l_new, acc_new)

    m0 = jnp.full((B, H, n_loc, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((B, H, n_loc, 1), jnp.float32)
    acc0 = jnp.zeros((B, n_loc, H, D), jnp.float32)
    carry = (k, v, segment_ids_kv, m0, l0, acc0)
    for i in range(axis_size):  # static unroll: ppermute patterns are static
        # the final hop would return blocks to their home shard — skip the
        # wasted ICI collective (ADVICE r2)
        carry = step(carry, rotate=i < axis_size - 1)
    _, _, _, m, l, acc = carry
    denom = jnp.where(l == 0.0, 1.0, l).transpose(0, 2, 1, 3)  # [B,n,H,1]
    return (acc / denom).astype(q.dtype)


def seq_sharded_attention(mesh, axis_name: str = "model"):
    """Build a shard_map-wrapped attention over ``axis_name``.

    Returns fn(q, k, v[, segment_ids]) on GLOBAL [B, N, H, D] arrays with the
    token dim sharded over ``axis_name``; internally each device works on its
    local shard and K/V ride the ring.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    axis_size = mesh.shape[axis_name]
    tok = P(None, axis_name, None, None)
    seg_spec = P(None, axis_name)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tok, tok, tok, seg_spec),
        out_specs=tok,
        check_rep=False,
    )
    def _sharded(q, k, v, seg):
        return ring_attention(
            q, k, v, axis_name, axis_size,
            segment_ids_q=seg, segment_ids_kv=seg,
        )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tok, tok, tok),
        out_specs=tok,
        check_rep=False,
    )
    def _sharded_nomask(q, k, v):
        return ring_attention(q, k, v, axis_name, axis_size)

    def apply(q, k, v, segment_ids=None):
        if q.shape[1] % axis_size != 0:
            # sequences that don't divide the axis (e.g. masked context
            # forwards with irregular static lengths) fall back to local
            # attention — GSPMD decides their layout; the ring only carries
            # the long, divisible full-clip sequences it exists for.
            # (callers that know their kernel options gate on
            # ``apply.axis_size`` and route around this themselves)
            from vjepa2_tpu.ops.attention import attend

            return attend(q, k, v, segment_ids=segment_ids)
        if segment_ids is None:
            return _sharded_nomask(q, k, v)
        if segment_ids.ndim == 1:
            segment_ids = jnp.broadcast_to(segment_ids[None], (q.shape[0], q.shape[1]))
        return _sharded(q, k, v, segment_ids.astype(jnp.int32))

    apply.axis_size = axis_size
    return apply
