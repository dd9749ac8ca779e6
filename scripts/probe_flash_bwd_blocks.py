"""Backward block-size sweep (bwd kernels hold ~4 score-shaped fp32 buffers,
so forward-sized blocks sit at the 16 MB scoped-VMEM cliff).
Run: timeout 1700 python -u scripts/probe_flash_bwd_blocks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


from vjepa2_tpu.ops.flash_attention import flash_attention
from vjepa2_tpu.ops.rope import build_rope_cache


def time_fn(fn, q, k, v, steps=10, chains=2):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
        float(carry)
        best.append((time.perf_counter() - t0) / steps * 1e3)
    return min(best)


SWEEPS = {
    "predictor(D32,N1664)": (8, 1664, 12, 32, (16, 16),
        [(832, 832), (416, 416), (416, 832), (832, 416), (208, 832), (416, 208)]),
    "vitl(D64,N2048)": (8, 2048, 16, 64, (16, 16),
        [(1024, 1024), (512, 512), (512, 1024), (1024, 512), (256, 1024), (512, 256)]),
    "vitg(D88,N2048)": (8, 2048, 16, 88, (16, 16),
        [(1024, 1024), (512, 512), (512, 1024), (256, 512)]),
}

for name, (B, N, H, D, grid, blocks) in SWEEPS.items():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, *grid)

    for bq, bk in blocks:
        @jax.jit
        def grad(q, k, v, c, bq=bq, bk=bk):
            def loss(qkv):
                return flash_attention(qkv[0] + c, qkv[1], qkv[2],
                                       rope_tables=cache,
                                       bwd_block_q=bq, bwd_block_k=bk
                                       ).astype(jnp.float32).sum()
            g = jax.grad(loss)((q, k, v))
            return sum(x.astype(jnp.float32).mean() for x in g)

        try:
            ms = time_fn(grad, q, k, v)
            log(f"{name} bwd bq={bq} bk={bk}: grad {ms:.2f} ms")
        except Exception as e:
            log(f"{name} bwd bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:90]}")

log("DONE")
