"""Flash-attention kernel timing on the attached TPU at ViT-g encode shape.

Correctness spot-check + block-size sweep vs the XLA fused-softmax path.
Run: timeout 550 python -c "import sys; sys.path.insert(0,'/root/repo'); exec(open('scripts/probe_flash_perf.py').read())"
"""

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

# correctness after the bf16-matmul change
ref = attend(q, k, v, rope_cache=cache, use_flash=False)
got = flash_attention(q, k, v, rope_tables=cache)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
log(f"correctness (rope, bf16 matmuls): max abs err {err:.4f}")
assert err < 0.05, err


def time_fn(fn, steps=20):
    carry = jnp.bfloat16(0.0)
    float(fn(q, k, v, carry))  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(q, k, v, carry).astype(jnp.bfloat16) * 1e-30
    float(carry)
    return (time.perf_counter() - t0) / steps * 1e3


@jax.jit
def run_xla(q, k, v, c):
    return attend(q + c, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32).mean()


log(f"xla fused-softmax: {time_fn(run_xla):.2f} ms")

for bq, bk in ((256, 256), (512, 512), (256, 512), (512, 1024), (1024, 1024),
               (128, 2048), (256, 2048), (512, 2048)):
    @jax.jit
    def run_flash(q, k, v, c, bq=bq, bk=bk):
        return flash_attention(
            q + c, k, v, rope_tables=cache, block_q=bq, block_k=bk
        ).astype(jnp.float32).mean()

    try:
        ms = time_fn(run_flash)
        log(f"flash bq={bq} bk={bk}: {ms:.2f} ms")
    except Exception as e:
        log(f"flash bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}")

# grad step timing (the training path)
@jax.jit
def grad_flash(q, k, v, c):
    def loss(q):
        return flash_attention(q + c, k, v, rope_tables=cache).astype(jnp.float32).sum()
    return jax.grad(loss)(q).astype(jnp.float32).mean()


@jax.jit
def grad_xla(q, k, v, c):
    def loss(q):
        return attend(q + c, k, v, rope_cache=cache, use_flash=False).astype(jnp.float32).sum()
    return jax.grad(loss)(q).astype(jnp.float32).mean()


log(f"grad xla: {time_fn(grad_xla, 10):.2f} ms")
log(f"grad flash: {time_fn(grad_flash, 10):.2f} ms")
log("DONE")
