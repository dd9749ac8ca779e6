"""64f@384px ViT-L pretrain step on one chip — the reference's maximum real
sequence (32 x 24 x 24 = 18,432 tokens, `cooldown-384px-64f` scale; the
reference runs it on 32x8 A100s). Flash attention streams the 18k-token
scores through VMEM, remat bounds activations.

Run: timeout 1700 python -u scripts/probe_cooldown384.py
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


from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams, build_models, init_params, make_optimizer, make_train_step,
)
from vjepa2_tpu.train.state import TrainState

T, S = 64, 384
MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]

for B in (1, 2):
    log(f"--- bs{B} 64f@384px ViT-L pretrain step (remat, flash, 18432 tok) ---")
    try:
        encoder, predictor = build_models(
            model_name="vit_large", crop_size=S, num_frames=T,
            pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
            use_rope=True, num_mask_tokens=2,
            use_activation_checkpointing=True, use_flash=True,
            dtype=jnp.bfloat16,
        )
        coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
        coll.step()
        me, mp = coll(T, B)
        log(f"mask lengths ctx={[m.shape[1] for m in me]} pred={[m.shape[1] for m in mp]}")
        hp = PretrainHParams(ipe=100, epochs=10)
        tx = make_optimizer(hp)
        params, target = init_params(
            encoder, predictor, 0, (B, T, S, S, 3),
            jnp.asarray(me[0]), jnp.asarray(mp[0]),
        )
        state = TrainState.create(params, target, tx)
        step = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
        clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3), jnp.bfloat16)
        t0 = time.perf_counter()
        state, m = step(state, clips, tuple(map(jnp.asarray, me)),
                        tuple(map(jnp.asarray, mp)))
        loss0 = float(m["loss"])
        log(f"bs{B}: compiled+step0 in {time.perf_counter()-t0:.1f}s loss={loss0:.4f}")
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            coll.step()
            me2, mp2 = coll(T, B)
            state, m = step(state, clips, tuple(map(jnp.asarray, me2)),
                            tuple(map(jnp.asarray, mp2)))
        float(m["loss"])
        log(f"bs{B}: {(time.perf_counter()-t0)/n*1e3:.0f} ms/step")
        del state, params, target, clips
    except Exception as e:
        log(f"bs{B}: FAILED {type(e).__name__}: {str(e)[:300]}")
        break

log("DONE")
