"""Block-size sweep for the small-head predictor shape (D=32) and ViT-L
encode — testing whether per-cell overhead (not VPU work) dominates at
tiny head dims. Includes full-N blocks (one cell per BH).
Run: timeout 1700 python -u scripts/probe_flash_blocks2.py
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


def time_fn(fn, q, k, v, steps=16, chains=2):
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
    "predictor(D32,N1664,H12)": (8, 1664, 12, 32, (16, 16),
        [(832, 832), (832, 1664), (1664, 832), (1664, 1664), (416, 1664)]),
    "vitl(D64,N2048,H16)": (8, 2048, 16, 64, (16, 16),
        [(1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048)]),
}

for name, (B, N, H, D, grid, blocks) in SWEEPS.items():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, *grid)

    for bq, bk in blocks:
        @jax.jit
        def fwd(q, k, v, c, bq=bq, bk=bk):
            return flash_attention(q + c, k, v, rope_tables=cache,
                                   block_q=bq, block_k=bk
                                   ).astype(jnp.float32).mean()

        @jax.jit
        def grad(q, k, v, c, bq=bq, bk=bk):
            def loss(qkv):
                return flash_attention(qkv[0] + c, qkv[1], qkv[2],
                                       rope_tables=cache, block_q=bq, block_k=bk
                                       ).astype(jnp.float32).sum()
            g = jax.grad(loss)((q, k, v))
            return sum(x.astype(jnp.float32).mean() for x in g)

        try:
            msf = time_fn(fwd, q, k, v)
            msg = time_fn(grad, q, k, v, 8)
            log(f"{name} bq={bq} bk={bk}: fwd {msf:.2f} ms, grad {msg:.2f} ms")
        except Exception as e:
            log(f"{name} bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:100]}")

log("DONE")
