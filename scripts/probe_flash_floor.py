"""Compare the SHIPPED flash kernel against a stripped-input variant in one
process, verifying numerics, to locate the per-call floor (r3 diagnostic).

Hypothesis from probe_flash_ablate: the kernel body is cheap; the floor is
the per-cell DMA of the always-present side inputs (fp32 segment columns +
4 fp32 rope tables), which the shipped kernel streams into VMEM for every
grid cell even when unused.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops import flash_attention as fa


def bench(fn, *args, iters=50, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def xla_ref(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    key = jax.random.PRNGKey(0)
    for name, (B, H, N, D) in [
        ("encoder", (8, 16, 2048, 88)),
        ("predictor", (8, 12, 1664, 32)),
    ]:
        q, k, v = (0.3 * jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D),
                                           jnp.bfloat16) for i in range(3))
        ms_ship = bench(fa.flash_attention_bhnd, q, k, v)
        out = fa.flash_attention_bhnd(q, k, v)
        ref = xla_ref(q, k, v)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        ms_xla = bench(jax.jit(xla_ref), q, k, v)
        # shipped with rope tables and segments engaged
        rot = D if D % 2 == 0 else D - 1
        cos = jnp.ones((N, rot), jnp.float32) * 0.9
        sin = jnp.ones((N, rot), jnp.float32) * 0.1
        seg = jnp.zeros((B, N), jnp.int32)
        ms_rope = bench(fa.flash_attention_bhnd, q, k, v, rope_tables=(cos, sin))
        ms_seg = bench(fa.flash_attention_bhnd, q, k, v, segment_ids=seg)
        ms_both = bench(fa.flash_attention_bhnd, q, k, v, segment_ids=seg,
                        rope_tables=(cos, sin))
        print(f"== {name} B{B} H{H} N{N} D{D}   max|err|={err:.4f}")
        print(f"  shipped plain      {ms_ship:7.2f} ms   (xla fused {ms_xla:.2f})")
        print(f"  shipped +rope      {ms_rope:7.2f} ms")
        print(f"  shipped +seg       {ms_seg:7.2f} ms")
        print(f"  shipped +rope+seg  {ms_both:7.2f} ms")


if __name__ == "__main__":
    main()
