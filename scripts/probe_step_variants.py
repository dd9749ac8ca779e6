"""Why is the Pretrainer's jitted step slower than bench --mode pretrain's?

Interleaved one-process A/B of the ViT-L bs8 16f@256 train step built three
ways (same model, same mask lengths, warmup per variant, min-of-rounds):

  bench   — bf16 clips, plain jax.jit(make_train_step(...), donate)
            (what bench.py --mode pretrain times: 406.7 ms in r4s4)
  trainer — bf16 clips, jit_train_step(..., mesh) with mask_indices +
            norm_stats=None (the Pretrainer wrapper, minus the u8 path)
  train8  — uint8 clips + norm_stats (the full e2e device program)

Run: timeout 2400 python -u scripts/probe_step_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
     "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]
B, T, S = 8, 16, 256
STEPS, ROUNDS = 8, 3


def main():
    from vjepa2_tpu.core.mesh import MeshConfig, make_mesh
    from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, jit_train_step,
        make_optimizer, make_train_step, shard_state,
    )
    from vjepa2_tpu.train.state import TrainState

    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T, pred_depth=12,
        pred_embed_dim=384, pred_num_heads=12, use_rope=True,
        use_mask_tokens=True, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S), seed=0)
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    print("mask lengths ctx", [m.shape[-1] for m in me],
          "pred", [m.shape[-1] for m in mp], flush=True)

    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(encoder, predictor, 0, (B, T, S, S, 3),
                                 me[0], mp[0])

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, model=1),
                     devices=jax.devices()[:1])

    rs = np.random.RandomState(0)
    clips_f = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    clips_u8 = jnp.asarray(rs.randint(0, 255, (B, T, S, S, 3)), jnp.uint8)
    norm = (IMAGENET_MEAN, IMAGENET_STD)

    # Sequential per-variant (one ViT-L TrainState is ~5 GB; two alive
    # already risks HBM OOM — verify skill). Same process, so the cross-
    # process ±10% session drift does not apply; per-variant min-of-rounds.
    def run(name, step_fn, mesh_jit, clips):
        if mesh_jit:
            step = jit_train_step(step_fn, mesh)
        else:
            step = jax.jit(step_fn, donate_argnums=(0,))
        st = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params),
            jax.tree_util.tree_map(jnp.copy, target), tx)
        if mesh_jit:
            st = shard_state(st, mesh)
        t0 = time.perf_counter()
        st, m = step(st, clips, me, mp)
        float(m["loss"])
        print(f"{name}: compile+first {time.perf_counter() - t0:.0f} s",
              flush=True)
        # warmup: first post-compile dispatch pays a one-time donation/layout
        # shuffle (~900 ms observed) — keep it out of the timed rounds
        for _ in range(2):
            st, m = step(st, clips, me, mp)
        float(m["loss"])
        best = float("inf")
        for r in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                st, m = step(st, clips, me, mp)
            float(m["loss"])
            dt = (time.perf_counter() - t0) * 1e3 / STEPS
            best = min(best, dt)
            print(f"round {r} {name}: {dt:.1f} ms/step", flush=True)
        del st  # free the donated-state chain before the next variant
        return best

    results = {}
    results["bench"] = run(
        "bench", make_train_step(encoder, predictor, tx, hp), False, clips_f)
    results["trainer"] = run(
        "trainer", make_train_step(encoder, predictor, tx, hp,
                                   mask_indices=[0, 1]), True, clips_f)
    results["train8"] = run(
        "train8", make_train_step(encoder, predictor, tx, hp,
                                  mask_indices=[0, 1], norm_stats=norm),
        True, clips_u8)
    print("RESULT " + " | ".join(f"{k} {v:.1f}" for k, v in results.items()),
          flush=True)


if __name__ == "__main__":
    main()
