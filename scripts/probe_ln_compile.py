"""Compile-only Mosaic probe for the two LN prologue kernels.

Lowers + compiles (never executes) the ln_qkv and ln_mlp pallas kernels at
the ViT-L pretrain shapes, so kernel-lowering validity can be iterated
while another process owns the chip: Mosaic kernel compilation happens at
XLA compile time through the remote-compile helper, and the two real-TPU
failures this probe exists for ("unsupported shape cast" from
infer-vector-layout; `erf` NotImplementedError) both surface there.

Run: timeout 1200 python -u scripts/probe_ln_compile.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vjepa2_tpu.ops import ln_mlp, ln_qkv


def compile_only(fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args).compile()
    return time.perf_counter() - t0


def main():
    B, N, C, H, D = 8, 2048, 1024, 16, 64  # ViT-L encoder shape
    hidden = 4 * C
    x = jnp.zeros((B, N, C), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    wq = jnp.zeros((C, 3 * H * D), jnp.bfloat16)
    bq = jnp.zeros((3 * H * D,), jnp.float32)
    cos = jnp.ones((1, N, D), jnp.float32)
    sin = jnp.zeros((1, N, D), jnp.float32)
    wm = jnp.zeros((C, hidden), jnp.bfloat16)
    bm = jnp.zeros((hidden,), jnp.float32)

    for name, fn, args in [
        ("ln_qkv+rope fwd", lambda x, g, b, w, bb, c, s: ln_qkv.ln_qkv(
            x, g, b, w, bb, rope=(c, s), num_heads=H, head_dim=D),
         (x, gamma, beta, wq, bq, cos, sin)),
        ("ln_qkv norope fwd", lambda x, g, b, w, bb: ln_qkv.ln_qkv(
            x, g, b, w, bb, num_heads=H, head_dim=D),
         (x, gamma, beta, wq, bq)),
        ("ln_qkv+rope grad", jax.grad(
            lambda x, g, b, w, bb, c, s: sum(
                jnp.sum(t.astype(jnp.float32) ** 2) for t in ln_qkv.ln_qkv(
                    x, g, b, w, bb, rope=(c, s), num_heads=H, head_dim=D))),
         (x, gamma, beta, wq, bq, cos, sin)),
        ("ln_mlp fwd", lambda x, g, b, w, bb: ln_mlp.ln_mlp(x, g, b, w, bb),
         (x, gamma, beta, wm, bm)),
        ("ln_mlp grad", jax.grad(
            lambda x, g, b, w, bb: jnp.sum(
                ln_mlp.ln_mlp(x, g, b, w, bb).astype(jnp.float32) ** 2)),
         (x, gamma, beta, wm, bm)),
    ]:
        try:
            dt = compile_only(fn, *args)
            print(f"OK   {name}: compiled in {dt:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports, never raises
            msg = str(e).replace("\n", " ")[:300]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
