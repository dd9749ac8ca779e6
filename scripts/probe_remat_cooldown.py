"""One-process A/B of remat policies on the cooldown step (VERDICT r5 #1).

The r5s2 device trace attributes ~1340 ms/step of the 6114 ms cooldown
step (64f@256 bs12 accum3 remat) to remat RECOMPUTE of the flash forward
kernels (72 of the 504 fwd calls per step). `remat_policy='save_attn'`
keeps the kernels' (out, lse) via checkpoint_name tags so the recompute
drops them; 'save_attn_qkv' additionally keeps q/k/v (skips the qkv
projection recompute, ~+67 MB/layer-call at bs4 — may not fit);
'save_attn_qkv_h' additionally keeps the MLP fc1 pre-activation ('mlp_h',
width 4C) so the only recompute GEMM left is the attn out-projection.
Measured r5s2 (3 rounds, spread <0.1%): full 6120.9 / save_attn 5029.9 /
save_attn_qkv 4983.1 ms/step.

Interleaved one-process methodology (v4): all variants compiled in one
process, the SAME donated state chained through every step, fresh masks
per step, min-of-rounds.

Run: timeout 7200 python -u scripts/probe_remat_cooldown.py \
       [--variants full,save_attn,save_attn_qkv --rounds 3 --steps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    ap.add_argument("--variants", default="full,save_attn,save_attn_qkv")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--accum", type=int, default=None,
                    help="microbatch count (default 3 -> bs4; 6 -> bs2 "
                         "halves the per-microbatch saves for the wider "
                         "policies — 'save_attn_qkv_h' OOMs HBM at bs4)")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        B, T, S, name, accum = 2, 4, 64, "vit_tiny", 2
        pdim, pheads, pdepth = 96, 3, 2
    else:
        B, T, S, name, accum = 12, 64, 256, "vit_large", 3
        pdim, pheads, pdepth = 384, 12, 12
    if args.accum is not None and not args.tiny:
        assert B % args.accum == 0, (B, args.accum)
        accum = args.accum
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    b = B // accum

    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me0, mp0 = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)

    def _shape(clips, menc, mpred):
        return (clips.reshape(accum, b, *clips.shape[1:]),
                tuple(jnp.asarray(m).reshape(accum, b, -1) for m in menc),
                tuple(jnp.asarray(m).reshape(accum, b, -1) for m in mpred))

    steps = {}
    state = None
    for vname in variants:
        policy = None if vname == "full" else vname
        encoder, predictor = build_models(
            model_name=name, crop_size=S, num_frames=T, pred_depth=pdepth,
            pred_embed_dim=pdim, pred_num_heads=pheads, use_rope=True,
            num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
            use_activation_checkpointing=True, remat_policy=policy,
        )
        if state is None:
            params, target = init_params(
                encoder, predictor, 0, (b, T, S, S, 3),
                jnp.asarray(me0[0][:b]), jnp.asarray(mp0[0][:b]))
            state = TrainState.create(params, target, tx)
        steps[vname] = jax.jit(
            make_train_step(encoder, predictor, tx, hp, grad_accum=accum),
            donate_argnums=(0,))

    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    carry = jnp.float32(0.0)
    alive = []
    for vname in variants:
        coll.step()
        menc, mpred = coll(T, B)
        ci, mei, mpi = _shape(clips + carry.astype(jnp.bfloat16) * 0,
                              menc, mpred)
        t0 = time.perf_counter()
        try:
            state, m = steps[vname](state, ci, mei, mpi)
            carry = m["loss"] * 1e-30
            print(f"compiled {vname} in {time.perf_counter() - t0:.0f}s "
                  f"loss {float(m['loss']):.4f}", flush=True)
            alive.append(vname)
        except Exception as e:  # HBM OOM etc. — drop the variant, keep going
            print(f"variant {vname} FAILED compile/run: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    best = {v: 1e9 for v in alive}
    for rnd in range(args.rounds):
        for vname in alive:
            t0 = time.perf_counter()
            for _ in range(args.steps):
                coll.step()
                menc, mpred = coll(T, B)
                ci, mei, mpi = _shape(clips + carry.astype(jnp.bfloat16) * 0,
                                      menc, mpred)
                state, m = steps[vname](state, ci, mei, mpi)
                carry = m["loss"] * 1e-30
            float(carry)
            dt = (time.perf_counter() - t0) / args.steps
            best[vname] = min(best[vname], dt)
            print(f"round {rnd} {vname}: {dt * 1e3:.1f} ms/step", flush=True)
    if alive:
        base = best.get("full", best[alive[0]])
        print("RESULT " + " | ".join(
            f"{v} {best[v] * 1e3:.1f} ms ({(base - best[v]) * 1e3:+.1f})"
            for v in alive), flush=True)


if __name__ == "__main__":
    main()
