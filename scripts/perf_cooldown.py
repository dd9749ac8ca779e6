"""Cooldown-scale probe (VERDICT r1 #6): ViT-L pretrain step at 64f@256px —
8,192 tokens, remat on — per `configs/train/vitl16/cooldown-256px-64f.yaml`.

Records ms/step + MFU to .perf/cooldown.jsonl. Run AFTER other TPU work
(one TPU process at a time). Batch size is per-chip (the reference runs
bs 12/GPU on 80GB parts; a v5e chip has 16GB, so bs is scaled to fit and
reported alongside).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/.perf/cooldown.jsonl", "a", buffering=1)


def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


def main(B=2):
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer, make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState
    from bench import encoder_flops, measured_peak_tflops

    T, S = 64, 256  # 8,192 tokens
    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T,
        pred_depth=12, pred_embed_dim=384, pred_num_heads=12,
        use_rope=True, num_mask_tokens=2,
        use_activation_checkpointing=True,  # remat on, per the cooldown config
        dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me0, mp0 = coll(T, B)
    emit(what="mask_shapes", enc=[list(m.shape) for m in me0], pred=[list(m.shape) for m in mp0])
    hp = PretrainHParams(ipe=30, epochs=4)
    tx = make_optimizer(hp)
    t0 = time.perf_counter()
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3),
        jnp.asarray(me0[0]), jnp.asarray(mp0[0]),
    )
    emit(what="init_s", s=round(time.perf_counter() - t0, 1))
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp), donate_argnums=(0,))
    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)

    t0 = time.perf_counter()
    me = tuple(jnp.asarray(m) for m in me0)
    mp = tuple(jnp.asarray(m) for m in mp0)
    state, m = step(state, clips, me, mp)
    loss0 = float(m["loss"])
    emit(what="compile", s=round(time.perf_counter() - t0, 1), loss=loss0)

    for run in range(2):
        t0 = time.perf_counter()
        steps = 4
        for _ in range(steps):
            coll.step()
            a, b = coll(T, B)
            state, m = step(state, clips, tuple(map(jnp.asarray, a)), tuple(map(jnp.asarray, b)))
        loss = float(m["loss"])
        dt = (time.perf_counter() - t0) / steps
        n_full = (T // 2) * (S // 16) ** 2
        enc_f = encoder_flops(1024, 24, 4.0, n_full)
        ctx_f = sum(encoder_flops(1024, 24, 4.0, x.shape[1]) for x in me)
        pred_f = sum(encoder_flops(384, 12, 4.0, me[i].shape[1] + mp[i].shape[1], patch_size=0)
                     for i in range(len(me)))
        total = B * (enc_f + 3 * (ctx_f + pred_f))
        mfu = total / dt / 1e12 / measured_peak_tflops()
        emit(what="cooldown_step", run=run, batch=B, tokens=n_full,
             ms=round(dt * 1e3, 1), mfu_vs_measured=round(mfu, 4), loss=round(loss, 4))
    emit(what="done")


if __name__ == "__main__":
    main(B=int(sys.argv[1]) if len(sys.argv) > 1 else 2)
