"""Backward (VJP) block-size sweep for the flash kernel at ViT-g shape."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


from vjepa2_tpu.ops.attention import attend
from vjepa2_tpu.ops.flash_attention import flash_attention
from vjepa2_tpu.ops.rope import build_rope_cache

rs = np.random.RandomState(0)
B, N, H, D = 8, 2048, 16, 88
q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
cache = build_rope_cache(jnp.arange(N, dtype=jnp.int32), D, 16, 16)


def time_fn(fn, steps=10):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
    float(carry)
    return (time.perf_counter() - t0) / steps * 1e3


@jax.jit
def grad_xla(q, k, v, c):
    def loss(qkv):
        q, k, v = qkv
        return attend(q + c, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32).sum()
    g = jax.grad(loss)((q, k, v))
    return sum(x.astype(jnp.float32).mean() for x in g)


log(f"grad(q,k,v) xla: {time_fn(grad_xla):.2f} ms")

for bq, bk in ((256, 256), (512, 512), (1024, 1024), (512, 1024), (1024, 512),
               (2048, 512), (512, 2048), (256, 1024)):
    @jax.jit
    def grad_flash(q, k, v, c, bq=bq, bk=bk):
        def loss(qkv):
            q, k, v = qkv
            return flash_attention(
                q + c, k, v, rope_tables=cache, block_q=bq, block_k=bk
            ).astype(jnp.float32).sum()
        g = jax.grad(loss)((q, k, v))
        return sum(x.astype(jnp.float32).mean() for x in g)

    try:
        ms = time_fn(grad_flash)
        log(f"grad flash bq={bq} bk={bk}: {ms:.2f} ms")
    except Exception as e:
        log(f"grad flash bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}")

log("DONE")
