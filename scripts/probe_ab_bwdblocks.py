"""In-process A/B of backward block defaults for the full pretrain step:
A = bwd_k capped at 512, B = bwd blocks = fwd blocks (cliff-riding).
Interleaved A,B,A,B to factor out session drift.

RESULT (v5e, 2026-08-17): B 593.1 ms vs A 618.2 ms -> fwd-sized backward
blocks became the default and the DEFAULT_BWD_BLOCK constant was removed;
running variant A now requires threading bwd_block_q/k kwargs manually.
Run: timeout 2400 python -u scripts/probe_ab_bwdblocks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def main():
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.ops import flash_attention as fa
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    B, T, S = 8, 16, 256
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0])
    )
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    me_j = tuple(map(jnp.asarray, me))
    mp_j = tuple(map(jnp.asarray, mp))

    def fresh_masks():
        coll.step()
        a, b = coll(T, B)
        return tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b))

    results = {"A(bwd_k<=512)": [], "B(bwd=fwd)": []}
    steps = {}
    tx_step = make_train_step(encoder, predictor, tx, hp)
    # ONE state chained through every variant (its numeric contents are
    # irrelevant for timing; a second un-donated ViT-L state OOMs 16 GB)
    box = [TrainState.create(params, target, tx)]

    def run(name, cap):
        fa.DEFAULT_BWD_BLOCK = cap  # no-op since the cap default was removed
        if name not in steps:
            # separate jit cache entries: each cap traces its own program
            steps[name] = jax.jit(
                lambda st, c, a, b: tx_step(st, c, a, b),
                donate_argnums=(0,),
            )

        def one(c, masks):
            box[0], m = steps[name](box[0], c, *masks)
            return m["loss"]

        out = one(clips, (me_j, mp_j))
        float(out)
        t0 = time.perf_counter()
        for _ in range(8):
            out = one(clips + out.astype(jnp.bfloat16) * 0, fresh_masks())
        float(out)
        ms = (time.perf_counter() - t0) / 8 * 1e3
        results[name].append(ms)
        log(f"{name}: {ms:.1f} ms")

    for _ in range(2):
        run("A(bwd_k<=512)", 512)
        run("B(bwd=fwd)", 4096)
    for k, v in results.items():
        log(f"{k}: min {min(v):.1f} ms over {v}")
    log("DONE")


if __name__ == "__main__":
    main()
