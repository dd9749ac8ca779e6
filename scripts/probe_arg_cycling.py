"""Does dispatching the same executable with DISTINCT device-resident arg
buffers cost more through the axon tunnel than reusing one arg set?

probe_step_variants measured the ViT-L train step at 407 ms/step with fixed
args; probe_e2e_overlap's device-only loop over 6 pre-staged batches measured
614 ms/step on the same program shapes. This probe isolates the one
difference: arg-buffer identity across dispatches.

Run: timeout 1800 python -u scripts/probe_arg_cycling.py
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
    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (
        PretrainHParams, build_models, init_params, make_optimizer,
        make_train_step,
    )
    from vjepa2_tpu.train.state import TrainState

    encoder, predictor = build_models(
        model_name="vit_large", crop_size=S, num_frames=T, pred_depth=12,
        pred_embed_dim=384, pred_num_heads=12, use_rope=True,
        use_mask_tokens=True, use_flash=True, dtype=jnp.bfloat16,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S), seed=0)
    batches = []
    rs = np.random.RandomState(0)
    for _ in range(6):
        coll.step()
        me, mp = coll(T, B)
        batches.append((
            jax.device_put(jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)),
            tuple(jax.device_put(jnp.asarray(m)) for m in me),
            tuple(jax.device_put(jnp.asarray(m)) for m in mp),
        ))
    jax.block_until_ready(batches[-1][0])

    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(encoder, predictor, 0, (B, T, S, S, 3),
                                 batches[0][1][0], batches[0][2][0])
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp),
                   donate_argnums=(0,))

    t0 = time.perf_counter()
    state, m = step(state, *batches[0])
    float(m["loss"])
    print(f"compile+first {time.perf_counter() - t0:.0f} s", flush=True)
    for _ in range(2):
        state, m = step(state, *batches[0])
    float(m["loss"])

    import itertools
    results = {"fixed": float("inf"), "cycle6": float("inf"),
               "cycle2": float("inf")}
    for r in range(ROUNDS):
        for name, src in (("fixed", itertools.repeat(batches[0])),
                          ("cycle2", itertools.cycle(batches[:2])),
                          ("cycle6", itertools.cycle(batches))):
            t0 = time.perf_counter()
            m = None
            for _ in range(STEPS):
                state, m = step(state, *next(src))
            float(m["loss"])
            dt = (time.perf_counter() - t0) * 1e3 / STEPS
            results[name] = min(results[name], dt)
            print(f"round {r} {name}: {dt:.1f} ms/step", flush=True)
    print("RESULT " + " | ".join(f"{k} {v:.1f}" for k, v in results.items()),
          flush=True)


if __name__ == "__main__":
    main()
