"""Flash kernel timing after the base-2 softmax + folded-scale change.

Shapes: ViT-g encode (D=88), ViT-L encode (D=64), predictor (D=32,
N=1664). fwd + full-qkv grad, vs the XLA fused path.
Run: timeout 1700 python -u scripts/probe_flash_perf2.py
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


def time_fn(fn, q, k, v, steps=16, chains=2):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))  # compile
    best = []
    for _ in range(chains):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
        float(carry)
        best.append((time.perf_counter() - t0) / steps * 1e3)
    return min(best)


for name, (B, N, H, D, grid) in {
    "vitg-encode": (8, 2048, 16, 88, (16, 16)),
    "vitl-encode": (8, 2048, 16, 64, (16, 16)),
    "predictor":   (8, 1664, 12, 32, (16, 16)),
}.items():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, *grid)

    ref = attend(q, k, v, rope_cache=cache, use_flash=False)
    got = flash_attention(q, k, v, rope_tables=cache)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    log(f"{name}: correctness max abs err {err:.4f}")
    assert err < 0.05, err

    @jax.jit
    def fwd_xla(q, k, v, c):
        return attend(q + c, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32).mean()

    @jax.jit
    def fwd_flash(q, k, v, c):
        return flash_attention(q + c, k, v, rope_tables=cache).astype(jnp.float32).mean()

    @jax.jit
    def grad_flash(q, k, v, c):
        def loss(qkv):
            return flash_attention(
                qkv[0] + c, qkv[1], qkv[2], rope_tables=cache
            ).astype(jnp.float32).sum()
        g = jax.grad(loss)((q, k, v))
        return sum(x.astype(jnp.float32).mean() for x in g)

    @jax.jit
    def grad_xla(q, k, v, c):
        def loss(qkv):
            return attend(
                qkv[0] + c, qkv[1], qkv[2], rope_cache=cache, use_flash=False
            ).astype(jnp.float32).sum()
        g = jax.grad(loss)((q, k, v))
        return sum(x.astype(jnp.float32).mean() for x in g)

    log(f"{name}: fwd flash {time_fn(fwd_flash, q, k, v):.2f} ms"
        f" | fwd xla {time_fn(fwd_xla, q, k, v):.2f} ms")
    log(f"{name}: grad flash {time_fn(grad_flash, q, k, v, 8):.2f} ms"
        f" | grad xla {time_fn(grad_xla, q, k, v, 8):.2f} ms")

log("DONE")
