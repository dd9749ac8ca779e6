"""Step-level A/B of the LayerNorm numerics modes on the ENCODE headline.

VERDICT r4 weak-#3: ~69 ms of the ViT-L pretrain step (and the encode
headline's gap to ceiling) sits in LayerNorm-adjacent convert+reduce
fusions; all three fused-LN kernels lost on measurement. The remaining
levers are numerics: `models.modules.LN_UPCAST=False` (LN fully in bf16)
and `LN_MIXED_STATS` (fp32 mean/var reductions only, bf16 normalize).
This probe interleaves the three modes on the ViT-g encode program
(16f@256 bs8, the 0.669-of-ceiling headline) in ONE process
(methodology v4) and reports the max |Δ| on the pooled output vs the fp32
mode so the numerics cost is recorded alongside the time.

Run: timeout 4500 python -u scripts/probe_ln_encode.py [--rounds 4 --iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vjepa2_tpu.models.modules as M
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", default="vit_giant_xformers")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        B, T, S, name = 2, 4, 64, "vit_tiny"
        rounds, iters = args.rounds or 1, args.iters or 2
    else:
        B, T, S, name = 8, 16, 256, args.model
        rounds, iters = args.rounds or 4, args.iters or 8

    from vjepa2_tpu.ops.flash_attention import fwd_cap_override

    enc = MODEL_REGISTRY[name](
        img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True,
        uniform_power=True, use_flash=True, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    with fwd_cap_override(None):
        params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)
        jax.block_until_ready(params)

        # (LN_UPCAST, LN_MIXED_STATS)
        VARIANTS = [("fp32", (True, False)), ("bf16", (False, False)),
                    ("mixed", (False, True))]
        fns = {}

        def set_knobs(flags):
            M.LN_UPCAST, M.LN_MIXED_STATS = flags

        for vname, flags in VARIANTS:
            set_knobs(flags)

            @jax.jit
            def fwd(p, x, carry):
                out = enc.apply(p, x + carry)
                return (out.astype(jnp.float32).mean() * 1e-30,
                        out.astype(jnp.float32).mean(axis=(0, 1)))

            fns[vname] = fwd

        def one(vname, carry):
            s, pooled = fns[vname](params, clips, carry.astype(jnp.bfloat16))
            return s, pooled

        pooled = {}
        c = jnp.bfloat16(0.0)
        for vname, flags in VARIANTS:
            set_knobs(flags)
            t0 = time.perf_counter()
            s, p = one(vname, c)
            float(s)
            print(f"compiled {vname} in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            pooled[vname] = np.asarray(one(vname, jnp.bfloat16(0.0))[1])
            c = jnp.bfloat16(0.0)
        base = pooled["fp32"]
        for vname, _ in VARIANTS[1:]:
            d = np.abs(pooled[vname] - base)
            print(f"numerics {vname}: max|d|={d.max():.3e} "
                  f"rel={(d.max() / (np.abs(base).max() + 1e-9)):.3e}",
                  flush=True)

        best = {v: 1e9 for v, _ in VARIANTS}
        for rnd in range(rounds):
            for vname, flags in VARIANTS:
                set_knobs(flags)
                t0 = time.perf_counter()
                for _ in range(iters):
                    s, _ = one(vname, c)
                    c = s.astype(jnp.bfloat16)
                float(s)
                dt = (time.perf_counter() - t0) / iters
                best[vname] = min(best[vname], dt)
                print(f"round {rnd} {vname}: {dt * 1e3:.1f} ms/step",
                      flush=True)
        set_knobs((True, False))
        b = best[VARIANTS[0][0]]
        print("RESULT " + " | ".join(
            f"{v} {best[v] * 1e3:.1f} ms ({(b - best[v]) * 1e3:+.1f})"
            for v, _ in VARIANTS), flush=True)


if __name__ == "__main__":
    main()
