"""Step-level A/B of the fused LayerNorm prologues on the full ViT-L bs8
16f@256 pretrain step: LN+QKV(+RoPE) (`ops/ln_qkv.py`, FUSE_LN_QKV) and
LN+fc1+GELU (`ops/ln_mlp.py`, FUSE_LN_MLP), swept independently —
4 variants (off/off, qkv, mlp, both).

Both variants are traced in ONE process and interleaved across rounds
(methodology v4: never A/B a <15% effect across processes — session drift
is +-10%). The two jitted programs share one donated TrainState, so HBM
holds a single state; rounds alternate A/B on the evolving state.

Run: timeout 3000 python -u scripts/probe_ln_qkv_step.py
(--tiny: vit_tiny on CPU-scale shapes — a pre-flight smoke of the whole
sweep so a rare tunnel window is never spent on a script bug.)
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
from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer,
    make_train_step,
)
from vjepa2_tpu.train.state import TrainState

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-scale smoke of the full 4-variant sweep")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--variants", default="unfused,qkv,mlp,both",
                    help="comma list of variants to sweep (each fresh "
                         "fused program costs a multi-minute tunnel "
                         "compile; trim when the window is short)")
    args = ap.parse_args()
    if args.tiny:
        # sitecustomize registers the axon TPU backend at interpreter
        # startup and wins over JAX_PLATFORMS env vars; a CPU smoke must
        # override via jax.config or it hangs on a dead tunnel.
        jax.config.update("jax_platforms", "cpu")
        B, T, S, name = 2, 4, 64, "vit_tiny"
        pred_dim, pred_heads, pred_depth = 96, 3, 2
        rounds, iters = args.rounds or 1, args.iters or 2
    else:
        B, T, S, name = 8, 16, 256, "vit_large"
        pred_dim, pred_heads, pred_depth = 384, 12, 12
        rounds, iters = args.rounds or 4, args.iters or 8
    encoder, predictor = build_models(
        model_name=name, crop_size=S, num_frames=T,
        pred_depth=pred_depth, pred_embed_dim=pred_dim,
        pred_num_heads=pred_heads,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]),
        jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    clips0 = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3),
                         jnp.bfloat16)
    me = tuple(jnp.asarray(x) for x in me)
    mp = tuple(jnp.asarray(x) for x in mp)

    BY_NAME = {"unfused": (False, False), "qkv": (True, False),
               "mlp": (False, True), "both": (True, True)}
    requested = [s.strip() for s in args.variants.split(",") if s.strip()]
    unknown = [s for s in requested if s not in BY_NAME]
    if unknown:
        ap.error(f"unknown variants {unknown}; choose from "
                 f"{sorted(BY_NAME)}")
    VARIANTS = [BY_NAME[s] for s in requested]

    fns = {}
    for fuse in VARIANTS:
        M.FUSE_LN_QKV, M.FUSE_LN_MLP = fuse  # read at trace time inside Block
        fns[fuse] = jax.jit(make_train_step(encoder, predictor, tx, hp),
                            donate_argnums=(0,))

    def one(fuse, carry):
        nonlocal state
        clips = clips0 + carry.astype(jnp.bfloat16)
        state, m = fns[fuse](state, clips, me, mp)
        return m["loss"]

    # compile all variants (reuses the evolving state; first call compiles)
    c = jnp.float32(0.0)
    for fuse in VARIANTS:
        M.FUSE_LN_QKV, M.FUSE_LN_MLP = fuse
        print(f"compiling fuse={fuse} (fresh fused ViT-L programs take "
              "3-10 min through the tunnel; cached ones seconds)...",
              flush=True)
        t0 = time.perf_counter()
        c = one(fuse, c) * 1e-30
        float(c)
        print(f"compiled fuse={fuse} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        c = one(fuse, c) * 1e-30  # warmup (donation/layout shuffle)
        float(c)

    best = {v: 1e9 for v in VARIANTS}
    for rnd in range(rounds):
        for fuse in VARIANTS:
            t0 = time.perf_counter()
            for _ in range(iters):
                c = one(fuse, c) * 1e-30
            float(c)
            dt = (time.perf_counter() - t0) / iters
            best[fuse] = min(best[fuse], dt)
            print(f"round {rnd} fuse={fuse}: {dt * 1e3:.1f} ms/step",
                  flush=True)
    # Baseline for the delta column: unfused when swept, else the first
    # swept variant (a trimmed sweep may exclude unfused).
    base = best.get((False, False), best[VARIANTS[0]])
    names = {(False, False): "unfused", (True, False): "qkv",
             (False, True): "mlp", (True, True): "both"}
    print("RESULT " + " | ".join(
        f"{names[v]} {best[v] * 1e3:.1f} ms/step"
        f" ({(base - best[v]) * 1e3:+.1f})" for v in VARIANTS), flush=True)


if __name__ == "__main__":
    main()
