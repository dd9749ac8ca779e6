"""Per-shape flash vs XLA attention timing at the REAL ViT-L pretrain
component shapes (bs8 16f@256px, mask lengths 578/173 ctx, 1623/1662
predictor ctx+pred concat). Decides the flash dispatch threshold."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.ops.attention import attend
from vjepa2_tpu.ops.rope import build_rope_cache


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


SHAPES = [
    ("target", 8, 2048, 16, 64),
    ("ctx0", 8, 578, 16, 64),
    ("pred0", 8, 1623, 12, 32),
    ("pred1", 8, 1662, 12, 32),
]


def time_fn(fn, args, steps=10):
    carry = jnp.bfloat16(0.0)
    float(fn(*args, carry))
    t0 = time.perf_counter()
    for _ in range(steps):
        carry = fn(*args, carry).astype(jnp.bfloat16) * 1e-30
    float(carry)
    return (time.perf_counter() - t0) / steps * 1e3


for name, B, N, H, D in SHAPES:
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, N, H, D), jnp.bfloat16)
    pos = jnp.asarray(np.sort(rs.choice(4096, N, False)).astype(np.int32))
    cache = build_rope_cache(pos, D, 16, 16)

    for label, uf in (("xla", False), ("flash", True)):
        @jax.jit
        def fwd(q, k, v, c, uf=uf):
            return attend(q + c, k, v, rope_cache=cache, use_flash=uf).astype(jnp.float32).mean()

        @jax.jit
        def bwd(q, k, v, c, uf=uf):
            def loss(qkv):
                return attend(qkv[0] + c, qkv[1], qkv[2], rope_cache=cache,
                              use_flash=uf).astype(jnp.float32).sum()
            g = jax.grad(loss)((q, k, v))
            return sum(x.astype(jnp.float32).mean() for x in g)

        try:
            f = time_fn(fwd, (q, k, v))
            b = time_fn(bwd, (q, k, v))
            log(f"{name} N={N} H={H} D={D} {label}: fwd {f:.2f} ms, grad {b:.2f} ms")
        except Exception as e:
            log(f"{name} {label}: FAILED {type(e).__name__}: {str(e)[:150]}")

log("DONE")
