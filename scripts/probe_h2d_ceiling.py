"""Measure the H2D-serialization ceiling precisely (VERDICT r4 weak-#5 /
next-#8): on this stack a device_put does NOT overlap device compute
(r4s4 `probe_e2e_overlap.py` phase C), so the e2e step floor on a
multi-core host (where the loader's host work hides behind the step) is

    device_step + put(batch_bytes) + unhidden_host

This probe measures put bandwidth against an idle device across the sizes
that matter (u8 bs8 16f@256 = 25.2 MB, f32 = 100.7 MB, masks ~100 KB) and
prints the projected multi-core e2e step for the ViT-L pretrain headline.

Run: timeout 1200 python -u scripts/probe_h2d_ceiling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def put_ms(arr_np, n=8):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        a = jax.device_put(arr_np)
        a.block_until_ready()
        ts.append(time.perf_counter() - t0)
        del a
    ts = sorted(ts)[1:-1]
    return 1e3 * sum(ts) / len(ts)


def main():
    B, T, S = 8, 16, 256
    print(f"device: {jax.devices()[0]}", flush=True)
    # warm the path
    jax.device_put(np.ones((8, 8), np.float32)).block_until_ready()

    rows = []
    for label, arr in [
        ("u8 clips bs8 (25.2 MB)", np.zeros((B, T, S, S, 3), np.uint8)),
        ("f32 clips bs8 (100.7 MB)", np.zeros((B, T, S, S, 3), np.float32)),
        ("bf16 clips bs8 (50.3 MB)",
         np.zeros((B, T, S, S, 3), np.float32).astype(jnp.bfloat16)),
        ("masks 2x(8,1024) i32 (64 KB)", np.zeros((2, B, 1024), np.int32)),
        ("1 MB", np.zeros(1 << 20, np.uint8)),
        ("4 MB", np.zeros(4 << 20, np.uint8)),
        ("64 MB", np.zeros(64 << 20, np.uint8)),
    ]:
        ms = put_ms(np.asarray(arr))
        mb = arr.size * arr.dtype.itemsize / 1e6
        rows.append((label, ms, mb))
        print(f"put {label:34s} {ms:8.2f} ms  ({mb / ms * 1e3:7.0f} MB/s)",
              flush=True)

    # linear fit latency + bandwidth over the size sweep
    xs = np.array([r[2] for r in rows])
    ys = np.array([r[1] for r in rows])
    A = np.vstack([xs, np.ones_like(xs)]).T
    slope, intercept = np.linalg.lstsq(A, ys, rcond=None)[0]
    bw = 1e3 / slope if slope > 0 else float("inf")
    print(f"\nfit: put_ms = {intercept:.2f} + bytes/{bw:.0f} MB/s", flush=True)

    u8_ms = rows[0][1]
    step_ms = 407.0  # BENCH_r04 pretrain device step
    print(f"\nprojection (ViT-L bs8 16f@256 pretrain, device step {step_ms} ms):",
          flush=True)
    print(f"  multi-core host (loader hidden): {step_ms + u8_ms:.0f} ms/step "
          f"u8  ({8 / (step_ms + u8_ms) * 1e3:.1f} clips/s)", flush=True)
    print(f"  loader budget: 21.5 clips/s/core measured -> "
          f"{8 / ((step_ms + u8_ms) / 1e3) / 21.5:.2f} cores hide fully",
          flush=True)


if __name__ == "__main__":
    main()
