"""TPU timing: fused ln_qkv kernel vs the unfused XLA chain, fwd and grad,
at the pretrain step's shapes. Methodology v4: ops chained in a fori_loop
inside one jit, one fetch, min-of-rounds interleaved.
Run: timeout 1700 python -u scripts/probe_ln_qkv.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.ops import ln_qkv as lq


def bench(fn, args, iters, rounds=3):
    @jax.jit
    def chain(a):
        def body(i, a):
            q, k, v = fn(*a)
            # consume all outputs so DCE can't trim, feed back into x
            s = (q.astype(jnp.float32).sum() + k.astype(jnp.float32).sum()
                 + v.astype(jnp.float32).sum())
            # not statically foldable (runtime scalar), numerically ~1.0
            scale = (1.0 + s * 1e-32).astype(a[0].dtype)
            return (a[0] * scale,) + a[1:]

        return jax.lax.fori_loop(0, iters, body, a)[0]

    x = chain(args)
    float(jnp.sum(x.astype(jnp.float32)))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        x = chain(args)
        float(jnp.sum(x.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def bench_grad(fn, args, iters, rounds=3):
    def loss(a):
        q, k, v = fn(*a)
        return (q.astype(jnp.float32).sum() + k.astype(jnp.float32).sum()
                + v.astype(jnp.float32).sum()) * 1e-6

    g = jax.grad(lambda a: loss(a), allow_int=False)

    @jax.jit
    def chain(a):
        def body(i, a):
            gr = g(a)
            s = gr[0].astype(jnp.float32).sum()
            scale = (1.0 + s * 1e-32).astype(a[0].dtype)
            return (a[0] * scale,) + a[1:]

        return jax.lax.fori_loop(0, iters, body, a)[0]

    x = chain(args)
    float(jnp.sum(x.astype(jnp.float32)))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        x = chain(args)
        float(jnp.sum(x.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    shapes = [
        ("enc2048", 8, 2048, 1024, 16, 64),
        ("ctx584", 8, 584, 1024, 16, 64),
        ("pred1664", 8, 1664, 384, 12, 32),
    ]
    rs = np.random.RandomState(0)
    for name, B, N, C, H, D in shapes:
        x = jnp.asarray(rs.randn(B, N, C), jnp.bfloat16)
        gamma = jnp.asarray(rs.randn(C), jnp.float32)
        beta = jnp.asarray(rs.randn(C), jnp.float32)
        w = jnp.asarray(rs.randn(C, 3 * H * D) * 0.02, jnp.bfloat16)
        bias = jnp.asarray(rs.randn(3 * H * D) * 0.01, jnp.float32)
        cos = jnp.asarray(rs.randn(1, N, D), jnp.float32)
        sin = jnp.asarray(rs.randn(1, N, D), jnp.float32)
        args = (x, gamma, beta, w, bias)

        def fused(x, gamma, beta, w, bias):
            return lq.ln_qkv(x, gamma, beta, w, bias, rope=(cos, sin),
                             num_heads=H, head_dim=D)

        def unfused(x, gamma, beta, w, bias):
            return lq._xla_reference(x, gamma, beta, w, bias, (cos, sin),
                                     1e-6, H, D)

        iters = max(8, int(round(40 / (N / 2048))))
        for label, fn, b in (("fused  ", fused, bench), ("unfused", unfused, bench)):
            t = b(fn, args, iters)
            print(f"{name:9s} {label} fwd  {t:7.3f} ms", flush=True)
        for label, fn in (("fused  ", fused), ("unfused", unfused)):
            t = bench_grad(fn, args, max(6, iters // 2))
            print(f"{name:9s} {label} grad {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
