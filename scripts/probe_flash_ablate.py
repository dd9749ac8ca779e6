"""Kernel-internal attribution of the flash forward's per-call floor.

Round-2 left an open diagnostic: per-call time was invariant to head dim,
block size, head packing, and removing an exp pass. This probe times
ablated variants of the forward kernel (same grid/BlockSpecs, pieces of the
body removed) on the real TPU, which attributes the cost WITHOUT xprof:

  full        - the shipped streaming-softmax body
  nosoftmax   - p = s (QK^T and PV matmuls + scratch accumulate only)
  noexp       - softmax arithmetic but exp2 replaced by identity
  nomax       - exp2(s) with no running-max tracking (fixed max)
  nosum       - no denominator accumulation
  nopv        - scores + softmax, no PV matmul
  noqk        - no QK matmul (scores = broadcast of q's first column)
  empty       - kernel body only touches the output once

Run: python scripts/probe_flash_ablate.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def make_kernel(block_q, block_k, variant):
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        kv_i = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(kv_i == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, NEG_INF)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        if variant == "empty":
            @pl.when(kv_i == nk - 1)
            def _fin():
                o_ref[0, 0] = q_ref[0, 0]
            return

        q = q_ref[0, 0].astype(jnp.float32)
        q = (q * LOG2E).astype(q_ref.dtype)

        if variant == "noqk":
            s = jnp.broadcast_to(q[:, :1].astype(jnp.float32), (block_q, block_k))
        else:
            s = jax.lax.dot_general(
                q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if variant == "nosoftmax":
            p = s
            l_new = l_scr[0]
            m_new = m_scr[0]
            corr = 1.0
        elif variant == "noexp":
            m_prev = m_scr[0]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = s - m_new  # exp2 removed, everything else identical
            corr = m_prev - m_new  # stand-in for exp2(m_prev - m_new)
            l_new = l_scr[0] * corr + jnp.sum(p, axis=-1, keepdims=True)
        elif variant == "nomax":
            m_new = m_scr[0]
            p = jnp.exp2(s * 0.01)  # scaled to avoid inf; no max machinery
            corr = 1.0
            l_new = l_scr[0] + jnp.sum(p, axis=-1, keepdims=True)
        elif variant == "nosum":
            m_prev = m_scr[0]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_new = l_scr[0]
        else:  # full
            m_prev = m_scr[0]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_new = l_scr[0] * corr + jnp.sum(p, axis=-1, keepdims=True)

        if variant == "nopv":
            acc_scr[0] = acc_scr[0] * corr + p[:, : acc_scr.shape[-1]]
        else:
            acc_scr[0] = acc_scr[0] * corr + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scr[0] = m_new
        l_scr[0] = l_new

        @pl.when(kv_i == nk - 1)
        def _finish():
            denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
            o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "variant"))
def run(q, k, v, block_q, block_k, variant):
    B, H, N, D = q.shape
    grid = (B * H, N // block_q, N // block_k)
    spec_q = pl.BlockSpec((1, 1, block_q, D), lambda g, i, j: (g // H, g % H, i, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, block_k, D), lambda g, i, j: (g // H, g % H, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(block_q, block_k, variant),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, block_q, 1), jnp.float32),
            pltpu.VMEM((1, block_q, 1), jnp.float32),
            pltpu.VMEM((1, block_q, D), jnp.float32),
        ],
    )(q, k, v)


def time_once(fn, q, *rest, iters=20, **kw):
    """Tunnel-safe: chain output into next input, end with a value fetch
    (the runtime memoizes identical dispatches; block_until_ready can
    return early through the tunnel)."""
    out = fn(q, *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q + (out * 0).astype(q.dtype), *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("encoder B8 H16 N2048 D88", (8, 16, 2048, 88), 1024, 1024),
        ("predictor B8 H12 N1664 D32", (8, 12, 1664, 32), 832, 832),
    ]
    variants = ["full", "nosoftmax", "noexp", "nomax", "nosum", "nopv", "noqk", "empty"]
    for name, (B, H, N, D), bq, bk in shapes:
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D),
                                     jnp.bfloat16) for i in range(3))
        print(f"== {name}  blocks {bq}x{bk}  cells {B*H*(N//bq)*(N//bk)}")
        results = {v_: [] for v_ in variants}
        for _ in range(3):  # interleaved rounds, min-of-rounds
            for var in variants:
                results[var].append(
                    time_once(run, q, k, v, block_q=bq, block_k=bk, variant=var))
        for var in variants:
            rounds = " ".join(f"{x:6.2f}" for x in results[var])
            print(f"  {var:10s} min {min(results[var]):7.2f} ms  [{rounds}]")


if __name__ == "__main__":
    main()
