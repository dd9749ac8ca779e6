"""Attack the flash kernel's DMA/grid floor (r3).

probe_flash_ablate (tunnel-safe timing) showed the EMPTY kernel costs
3.1 ms of the full kernel's 4.7 ms at the ViT-g encode shape — the floor is
grid/DMA pipeline overhead, not VPU softmax. Suspects: lane-misaligned head
dims (88/32 vs the 128 lane tile) making every block DMA strided, and
per-cell fixed overhead (fewer/fatter cells should win).

Sweeps (all with chained-dependency timing + value fetch):
  1. head dim D in {32, 64, 88, 128} x {empty, full} at B8 H16 N2048
  2. block sizes {256, 512, 1024, 2048} at D 88 and 128
  3. head packing block_h in {1, 2, 4} at D 88 and 128 (if VMEM allows)
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


def make_kernel(block_q, block_k, block_h, variant):
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
                o_ref[...] = q_ref[...]
            return

        for h in range(block_h):
            q = (q_ref[0, h].astype(jnp.float32) * LOG2E).astype(q_ref.dtype)
            s = jax.lax.dot_general(
                q, k_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_scr[h] = acc_scr[h] * corr + jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[h] = m_new

        @pl.when(kv_i == nk - 1)
        def _finish():
            denom = jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
            o_ref[0] = (acc_scr[...] / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "block_h", "variant"))
def run(q, k, v, block_q, block_k, block_h, variant):
    B, H, N, D = q.shape
    hb = H // block_h
    grid = (B * hb, N // block_q, N // block_k)
    spec_q = pl.BlockSpec((1, block_h, block_q, D),
                          lambda g, i, j, hb=hb: (g // hb, g % hb, i, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, block_h, block_k, D),
                          lambda g, i, j, hb=hb: (g // hb, g % hb, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(block_q, block_k, block_h, variant),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_k],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),
            pltpu.VMEM((block_h, block_q, 1), jnp.float32),
            pltpu.VMEM((block_h, block_q, D), jnp.float32),
        ],
    )(q, k, v)


def time_once(fn, q, *rest, iters=20, **kw):
    out = fn(q, *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q + (out * 0).astype(q.dtype), *rest, **kw)
    jax.device_get(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters * 1000


def bench(configs, rounds=3):
    res = {name: [] for name, _, _ in configs}
    for _ in range(rounds):
        for name, args, kw in configs:
            try:
                res[name].append(time_once(run, *args, **kw))
            except Exception as e:
                res[name].append(float("nan"))
                if len(res[name]) == 1:
                    print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:120]}")
    for name, _, _ in configs:
        v = [x for x in res[name] if x == x]
        if v:
            rs = " ".join(f"{x:6.2f}" for x in res[name])
            print(f"  {name:28s} min {min(v):7.2f} ms  [{rs}]")


def main():
    key = jax.random.PRNGKey(0)
    B, H, N = 8, 16, 2048

    def mk(D):
        return tuple(0.3 * jax.random.normal(jax.random.fold_in(key, i + D),
                                             (B, H, N, D), jnp.bfloat16)
                     for i in range(3))

    print("== sweep 1: head dim (blocks 1024x1024, bh=1), B8 H16 N2048")
    cfgs = []
    for D in (32, 64, 88, 128):
        q, k, v = mk(D)
        for var in ("empty", "full"):
            cfgs.append((f"D={D:<3d} {var}", (q, k, v),
                         dict(block_q=1024, block_k=1024, block_h=1, variant=var)))
    bench(cfgs)

    print("== sweep 2: block sizes (bh=1, full)")
    cfgs = []
    for D in (88, 128):
        q, k, v = mk(D)
        for blk in (256, 512, 1024, 2048):
            cfgs.append((f"D={D:<3d} blk={blk}", (q, k, v),
                         dict(block_q=blk, block_k=blk, block_h=1, variant="full")))
    bench(cfgs)

    print("== sweep 3: head packing (blocks 1024x1024, full)")
    cfgs = []
    for D in (88, 128):
        q, k, v = mk(D)
        for bh in (1, 2, 4):
            cfgs.append((f"D={D:<3d} bh={bh}", (q, k, v),
                         dict(block_q=1024, block_k=1024, block_h=bh, variant="full")))
    bench(cfgs)

    print("== sweep 4: predictor shape B8 H12 N1664 D32 vs D-padded")
    B2, H2, N2 = 8, 12, 1664
    cfgs = []
    for D in (32, 64, 128):
        qkv = tuple(0.3 * jax.random.normal(jax.random.fold_in(key, 50 + i + D),
                                            (B2, H2, N2, D), jnp.bfloat16)
                    for i in range(3))
        cfgs.append((f"pred D={D:<3d} blk=832", qkv,
                     dict(block_q=832, block_k=832, block_h=1, variant="full")))
        cfgs.append((f"pred D={D:<3d} blk=1664", qkv,
                     dict(block_q=1664, block_k=1664, block_h=1, variant="full")))
    bench(cfgs)


if __name__ == "__main__":
    main()
