"""Step-level A/B of the narrow-head DN attention layout (r4).

The predictor's [8, 12, 1664, 32] BHND tensors pad the 32-wide head dim to
128 lanes — 4x HBM on every qkv store, kernel read/write, saved residual,
and 16x on the fp32 dk/dv partials. `ops/flash_attention_dn.py` transposes
the head plane to [B, H, D, N] (exact tiling). This probe traces the FULL
ViT-L bs8 16f@256 pretrain step under both layouts in ONE process
(methodology v4: interleave variants, min-of-rounds).

Run: timeout 4500 python -u scripts/probe_dn_step.py [--rounds 4 --iters 8]
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
                    help="CPU-scale smoke of the sweep mechanics")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--variants", default=None,
                    help="comma list from {bhnd,dn,dn64}; first is baseline "
                         "(default bhnd,dn,dn64)")
    args = ap.parse_args()
    if args.tiny:
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

    import vjepa2_tpu.ops.flash_attention_dn as fdn

    # (NARROW_DN, DN_MAX_D): dn = predictor-only (Dh<=48), dn64 adds the
    # encoder family (Dh=64 — 2x lane pad in BHND on qkv stores and the
    # saved-for-backward residuals, ~2.4 GB logical at the ViT-L step)
    BY_NAME = {"bhnd": (False, 48), "dn": (True, 48), "dn64": (True, 64)}
    names = [s.strip() for s in (args.variants or "bhnd,dn,dn64").split(",")]
    unknown = [s for s in names if s not in BY_NAME]
    assert not unknown, f"unknown variants {unknown}; pick from {list(BY_NAME)}"
    VARIANTS = [(s, BY_NAME[s]) for s in names]
    fns = {}

    def set_knobs(flags):
        M.NARROW_DN, fdn.DN_MAX_D = flags  # read at trace time

    for vname, flags in VARIANTS:
        set_knobs(flags)
        fns[vname] = jax.jit(make_train_step(encoder, predictor, tx, hp),
                             donate_argnums=(0,))

    def one(vname, carry):
        nonlocal state
        clips = clips0 + carry.astype(jnp.bfloat16)
        state, m = fns[vname](state, clips, me, mp)
        return m["loss"]

    c = jnp.float32(0.0)
    losses = {}
    for vname, flags in VARIANTS:
        set_knobs(flags)
        t0 = time.perf_counter()
        c = one(vname, c) * 1e-30
        float(c)
        print(f"compiled {vname} in {time.perf_counter() - t0:.0f}s", flush=True)
        losses[vname] = float(one(vname, jnp.float32(0.0)))  # warmup + loss
        c = jnp.float32(losses[vname]) * 1e-30
    # layouts must agree numerically on the SAME evolving state
    print("loss " + " ".join(f"{v}={losses[v]:.6f}" for v, _ in VARIANTS)
          + " (consecutive steps, not identical-state — sanity only)",
          flush=True)

    best = {v: 1e9 for v, _ in VARIANTS}
    for rnd in range(rounds):
        for vname, flags in VARIANTS:
            set_knobs(flags)  # retrace-safe: each fn has its own cache
            t0 = time.perf_counter()
            for _ in range(iters):
                c = one(vname, c) * 1e-30
            float(c)
            dt = (time.perf_counter() - t0) / iters
            best[vname] = min(best[vname], dt)
            print(f"round {rnd} {vname}: {dt * 1e3:.1f} ms/step", flush=True)
    base = best[VARIANTS[0][0]]
    print("RESULT " + " | ".join(
        f"{v} {best[v] * 1e3:.1f} ms/step ({(base - best[v]) * 1e3:+.1f})"
        for v, _ in VARIANTS), flush=True)


if __name__ == "__main__":
    main()
