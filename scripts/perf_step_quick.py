"""Quick full-pretrain-step timing (ViT-L bs8 16f@256, flash) — the bench
pretrain program only, for fast before/after kernel comparisons.
Run: timeout 1700 python -u scripts/perf_step_quick.py
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
    state = TrainState.create(params, target, tx)
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    me_j = tuple(map(jnp.asarray, me))
    mp_j = tuple(map(jnp.asarray, mp))

    def fresh_masks():
        coll.step()
        a, b = coll(T, B)
        return tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b))

    step = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
    box = [state]

    def one(c, masks):
        box[0], m = step(box[0], c, *masks)
        return m["loss"]

    out = one(clips, (me_j, mp_j))
    float(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            out = one(clips + out.astype(jnp.bfloat16) * 0, fresh_masks())
        float(out)
        best.append((time.perf_counter() - t0) / 8 * 1e3)
    log(f"full step: {min(best):.1f} ms (chains={[round(b,1) for b in best]})")
    log("DONE")


if __name__ == "__main__":
    main()
