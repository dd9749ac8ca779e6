"""Test pipelining hypotheses for the 3 ms empty-kernel floor (r3).

Variants at B8 H16 N2048 D88, blocks 1024x1024:
  base        shipped-style specs (memory_space=VMEM, no compiler params)
  dimsem      + CompilerParams(dimension_semantics=(parallel, parallel, arbitrary))
  nospace     BlockSpecs without explicit memory_space
  both        dimsem + nospace
  cost        dimsem + CostEstimate
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def kernel_full(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = (q_ref[0, 0].astype(jnp.float32) * LOG2E).astype(q_ref.dtype)
    s = jax.lax.dot_general(q, k_ref[0, 0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m_prev = m_scr[0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)
    l_scr[0] = l_scr[0] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[0] = acc_scr[0] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[0] = m_new

    @pl.when(kv_i == nk - 1)
    def _finish():
        denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
        o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)


def kernel_empty(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
    kv_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_i == nk - 1)
    def _fin():
        o_ref[...] = q_ref[...]


@functools.partial(jax.jit, static_argnames=("blk", "mode", "variant"))
def run(q, k, v, blk, mode, variant):
    B, H, N, D = q.shape
    grid = (B * H, N // blk, N // blk)
    ms = {} if "nospace" in mode else {"memory_space": pltpu.VMEM}
    spec_q = pl.BlockSpec((1, 1, blk, D), lambda g, i, j: (g // H, g % H, i, 0), **ms)
    spec_k = pl.BlockSpec((1, 1, blk, D), lambda g, i, j: (g // H, g % H, j, 0), **ms)
    kw = {}
    params = {}
    if "dimsem" in mode:
        params["dimension_semantics"] = ("parallel", "parallel", "arbitrary")
    if params:
        kw["compiler_params"] = pltpu.CompilerParams(**params)
    if "cost" in mode:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=4 * B * H * N * D * 2,
            transcendentals=B * H * N * N,
        )
    kern = kernel_empty if variant == "empty" else kernel_full
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, blk, 1), jnp.float32),
            pltpu.VMEM((1, blk, 1), jnp.float32),
            pltpu.VMEM((1, blk, D), jnp.float32),
        ],
        **kw,
    )(q, k, v)


def time_once(fn, q, *rest, iters=20, **kw):
    out = fn(q, *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q + (out * 0).astype(q.dtype), *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    B, H, N, D = 8, 16, 2048, 88
    q, k, v = (0.3 * jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D),
                                       jnp.bfloat16) for i in range(3))
    modes = ["base", "dimsem", "nospace", "dimsem+nospace", "dimsem+cost"]
    res = {(m, v_): [] for m in modes for v_ in ("empty", "full")}
    for _ in range(3):
        for m in modes:
            for var in ("empty", "full"):
                try:
                    res[(m, var)].append(
                        time_once(run, q, k, v, blk=1024, mode=m, variant=var))
                except Exception as e:
                    res[(m, var)].append(float("nan"))
                    if len(res[(m, var)]) == 1:
                        print(f"  {m}/{var}: FAIL {str(e)[:100]}")
    for m in modes:
        for var in ("empty", "full"):
            v_ = [x for x in res[(m, var)] if x == x]
            if v_:
                rs = " ".join(f"{x:6.2f}" for x in res[(m, var)])
                print(f"  {m:16s} {var:6s} min {min(v_):7.2f} ms  [{rs}]")


if __name__ == "__main__":
    main()
