"""Quantify the flash call's XLA-side RoPE prologue under jit (r3).

Methodology (verify-skill tunnel rules): chain a data dependency between
iterations (the runtime memoizes identical dispatches), force a host value
fetch per round, interleave variants across ROUNDS and report per-variant
MIN of round averages (tunnel throughput drifts between rounds; the first
measured variant otherwise eats the warm-up).

Variants:
  plain        kernel, no rope
  rope-now     shipped path: expand tables + permute q/k per call, in-kernel rotation
  rope-pre     tables pre-expanded + q/k pre-permuted OUTSIDE the timed jit
               (what a once-per-step prologue would achieve), fp32 tables
  rope-xla     rope applied by XLA outside the kernel; kernel runs plain
  seg-pad      segment-ids all-zero (the attend() pad path cost shape)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops import flash_attention as fa

ITERS = 20
ROUNDS = 4


def time_once(fn, q, *rest, iters=ITERS):
    out = fn(q, *rest)
    jax.device_get(out[(0,) * (out.ndim - 1) + (slice(0, 1),)])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(q + (out * 0).astype(q.dtype), *rest)
    jax.device_get(out[(0,) * (out.ndim - 1) + (slice(0, 1),)])
    return (time.perf_counter() - t0) / iters * 1000


def bench_suite(cases):
    """cases: list of (name, fn, args). Interleaved rounds, min-of-rounds."""
    results = {name: [] for name, _, _ in cases}
    for _ in range(ROUNDS):
        for name, fn, args in cases:
            results[name].append(time_once(fn, *args))
    return {n: min(v) for n, v in results.items()}, results


def main():
    key = jax.random.PRNGKey(0)
    for name, (B, H, N, D) in [
        ("encoder", (8, 16, 2048, 88)),
        ("predictor", (8, 12, 1664, 32)),
    ]:
        q, k, v = (0.3 * jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D),
                                           jnp.bfloat16) for i in range(3))
        rot = D - (D % 4)
        cos = jnp.cos(jnp.linspace(0, 3, N * rot)).reshape(N, rot).astype(jnp.float32)
        sin = jnp.sin(jnp.linspace(0, 3, N * rot)).reshape(N, rot).astype(jnp.float32)
        seg = jnp.zeros((B, N), jnp.int32)
        bq = fa.pick_block(N, fa.DEFAULT_BLOCK_Q)

        plain = jax.jit(lambda q, k, v: fa.flash_attention_bhnd(q, k, v))
        rope_now = jax.jit(
            lambda q, k, v, c, s: fa.flash_attention_bhnd(q, k, v, rope_tables=(c, s))
        )

        cos_full, sin_full, perm = fa.expand_rope_tables(cos[None], sin[None], D)
        qp, kp = q[..., perm], k[..., perm]

        @jax.jit
        def rope_pre(qp, kp, v, cf, sf, bq=bq):
            return fa._flash_attention_core(
                qp, kp, v, None, cf, sf, cf, sf,
                False, None, bq, bq, bq, bq, 1, False, None,
            )

        def _rot_pairs(x):
            x2 = x.reshape(x.shape[:-1] + (-1, 2))
            y = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
            return y.reshape(x.shape)

        @jax.jit
        def rope_xla(q, k, v, c, s):
            cc, ss = c[None, None], s[None, None]
            qr = (q[..., :rot] * cc + _rot_pairs(q[..., :rot]) * ss).astype(q.dtype)
            kr = (k[..., :rot] * cc + _rot_pairs(k[..., :rot]) * ss).astype(k.dtype)
            if rot < D:
                qr = jnp.concatenate([qr, q[..., rot:]], -1)
                kr = jnp.concatenate([kr, k[..., rot:]], -1)
            return fa.flash_attention_bhnd(qr, kr, v)

        seg_pad = jax.jit(
            lambda q, k, v, g: fa.flash_attention_bhnd(q, k, v, segment_ids=g))

        mins, full = bench_suite([
            ("plain", plain, (q, k, v)),
            ("rope-now", rope_now, (q, k, v, cos, sin)),
            ("rope-pre", rope_pre, (qp, kp, v, cos_full, sin_full)),
            ("rope-xla", rope_xla, (q, k, v, cos, sin)),
            ("seg-pad", seg_pad, (q, k, v, seg)),
        ])
        print(f"== {name} B{B} H{H} N{N} D{D} rot{rot} block {bq}")
        for n in ("plain", "rope-now", "rope-pre", "rope-xla", "seg-pad"):
            rounds = " ".join(f"{x:6.2f}" for x in full[n])
            print(f"  {n:9s} min {mins[n]:7.2f} ms   rounds [{rounds}]")


if __name__ == "__main__":
    main()
