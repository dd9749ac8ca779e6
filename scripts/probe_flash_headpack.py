"""Head-packing sweep at the predictor shape (D=32, H=12, N=1664):
block_h x (block_q, block_k), fwd + full-qkv grad.
Run: timeout 1700 python -u scripts/probe_flash_headpack.py
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


from vjepa2_tpu.ops.attention import attend
from vjepa2_tpu.ops.flash_attention import flash_attention
from vjepa2_tpu.ops.rope import build_rope_cache


def time_fn(fn, q, k, v, steps=12, chains=2):
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


B, N, H, D = 8, 1664, 12, 32
rs = np.random.RandomState(0)
q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, 16, 16)
ref = attend(q, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32)

for bh in (1, 2, 4, 6, 12):
    for bq, bk in ((832, 832), (416, 832), (416, 416), (208, 832)):
        @jax.jit
        def fwd(q, k, v, c, bh=bh, bq=bq, bk=bk):
            return flash_attention(q + c, k, v, rope_tables=cache,
                                   block_q=bq, block_k=bk, block_h=bh
                                   ).astype(jnp.float32).mean()

        @jax.jit
        def grad(q, k, v, c, bh=bh, bq=bq, bk=bk):
            def loss(qkv):
                return flash_attention(qkv[0] + c, qkv[1], qkv[2],
                                       rope_tables=cache, block_q=bq,
                                       block_k=bk, bwd_block_q=bq,
                                       bwd_block_k=bk, block_h=bh
                                       ).astype(jnp.float32).sum()
            g = jax.grad(loss)((q, k, v))
            return sum(x.astype(jnp.float32).mean() for x in g)

        try:
            got = flash_attention(q, k, v, rope_tables=cache, block_q=bq,
                                  block_k=bk, block_h=bh).astype(jnp.float32)
            err = float(jnp.max(jnp.abs(got - ref)))
            msf = time_fn(fwd, q, k, v)
            msg = time_fn(grad, q, k, v, 8)
            log(f"bh={bh} bq={bq} bk={bk}: fwd {msf:.2f} ms, grad {msg:.2f} ms (err {err:.4f})")
        except Exception as e:
            log(f"bh={bh} bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:90]}")

log("DONE")
