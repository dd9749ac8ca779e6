"""Encode-path A/B of the encoder-width fwd flash-block cap (r4).

The r4 bisect fixed the TRAIN step by restoring FWD_CAP_WIDE=(1024,1024),
but the r3 tunnel-safe sweep had full-N k blocks ~8% faster for the
forward-only kernel (bk2048 1.87 ms vs bk1024 2.03 ms at enc B8 H16 N2048
D64). The ViT-g ENCODE headline is forward-only: if uncapped full-N wins
there and the train program keeps compiling (it did in probe_r4_blocks:
528.7 ms / 137 s), the default can move to None.

Interleaved one-process A/B (methodology v4): two jitted ViT-g encode
programs traced under different FWD_CAP_WIDE values, alternated across
rounds.

Run: timeout 3000 python -u scripts/probe_encode_caps.py [--model vit_giant]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.ops import flash_attention as fa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_giant")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

    enc = MODEL_REGISTRY[args.model](
        img_size=(args.size, args.size), num_frames=args.frames,
        tubelet_size=2, use_rope=True, uniform_power=True, use_flash=True,
        dtype=jnp.bfloat16,
    )
    B, T, S = args.batch, args.frames, args.size
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)
    jax.block_until_ready(params)

    POLICIES = [("cap1024", (1024, 1024)), ("fullN", None)]
    fns = {}
    for name, cap in POLICIES:
        fa.FWD_CAP_WIDE = cap  # read at trace time

        @jax.jit
        def fwd(p, x, carry):
            out = enc.apply(p, x + carry)
            return out.astype(jnp.float32).mean() * 1e-30

        t0 = time.perf_counter()
        c = fwd(params, clips, jnp.bfloat16(0.0))
        float(c)
        print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)
        fns[name] = fwd

    best = {n: 1e9 for n, _ in POLICIES}
    c = jnp.bfloat16(0.0)
    for rnd in range(args.rounds):
        for name, _ in POLICIES:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                c = fns[name](params, clips, c).astype(jnp.bfloat16)
            float(c)
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
            print(f"round {rnd} {name}: {dt * 1e3:.2f} ms/step "
                  f"({B / dt:.2f} clips/s)", flush=True)
    print("RESULT " + " | ".join(
        f"{n} {best[n] * 1e3:.2f} ms ({B / best[n]:.2f} clips/s)"
        for n, _ in POLICIES), flush=True)


if __name__ == "__main__":
    main()
