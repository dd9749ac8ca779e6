"""Attribute the pretrain step's ~13-15 ms host dispatch cost (VERDICT r4
weak-#4: BENCH_r04 pretrain dispatch_ms [12.7-15.2] vs encode's [0.3-1.2] —
~3% of the step spent before the RPC even leaves the host).

Suspects: the train-step arg tree (TrainState = params + target_params +
2x adam moments ~ 1.5k leaves, flattened on every dispatch and rebuilt on
every result), donation bookkeeping, and the metrics dict. This probe
times, in ONE process:

  noop        dispatch of a jitted identity on the SAME TrainState tree
              (pure flatten/rebuild cost, no donation, ~0 device work)
  noop_donate same with donate_argnums=(0,) (donation bookkeeping delta)
  noop_flat   identity on jax.tree.leaves(state) as ONE flat list arg
              (tree-structure traversal vs leaf count)
  step        the real train step's async dispatch (bench baseline)
  enc         encode-fn dispatch (params-only tree, the 0.3 ms reference)

Run: timeout 3000 python -u scripts/probe_dispatch_pretrain.py
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


def _dispatch_times(fn, n=30):
    """Host-side async-dispatch walltime per call, device kept idle by
    blocking on each tiny result before the next dispatch."""
    ts = []
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
        jax.block_until_ready(out)
    ts = sorted(ts)[2:-2]
    return 1e3 * sum(ts) / len(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        B, T, S, name = 2, 4, 64, "vit_tiny"
        pdim, pheads, pdepth = 96, 3, 2
    else:
        B, T, S, name = 8, 16, 256, "vit_large"
        pdim, pheads, pdepth = 384, 12, 12

    encoder, predictor = build_models(
        model_name=name, crop_size=S, num_frames=T, pred_depth=pdepth,
        pred_embed_dim=pdim, pred_num_heads=pheads, use_rope=True,
        num_mask_tokens=2, use_flash=True, dtype=jnp.bfloat16)
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(ipe=100, epochs=10)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]),
        jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3),
                        jnp.bfloat16)
    me = tuple(jnp.asarray(x) for x in me)
    mp = tuple(jnp.asarray(x) for x in mp)
    n_leaves = len(jax.tree.leaves(state))
    print(f"TrainState leaves: {n_leaves}", flush=True)

    # --- no-op dispatches on the same tree shapes ---------------------
    @jax.jit
    def noop(s, c, a, b):
        return s.step + c.astype(jnp.float32).mean() * 0

    noop_d = jax.jit(lambda s, c, a, b: s.step + c.astype(jnp.float32).mean() * 0,
                     donate_argnums=())

    flat = jax.tree.leaves(state)

    @jax.jit
    def noop_flat(leaves, c):
        return leaves[0] + c.astype(jnp.float32).mean() * 0

    @jax.jit
    def enc_fwd_like(p, c):
        return jax.tree.leaves(p)[0].astype(jnp.float32).mean() + c.mean() * 0

    for nm, fn in [
        ("noop", lambda: noop(state, clips, me, mp)),
        ("noop_flat", lambda: noop_flat(flat, clips)),
        ("enc_params_only", lambda: enc_fwd_like(state.params, clips.astype(jnp.float32))),
    ]:
        fn()  # compile
        print(f"dispatch {nm}: {_dispatch_times(fn):.2f} ms", flush=True)

    # --- the real step (async dispatch while device busy, bench-style) --
    step = jax.jit(make_train_step(encoder, predictor, tx, hp),
                   donate_argnums=(0,))
    box = [state]

    def one(carry):
        box[0], m = step(box[0], clips + carry.astype(jnp.bfloat16), me, mp)
        return m["loss"]

    t0 = time.perf_counter()
    c = one(jnp.float32(0.0)) * 1e-30
    float(c)
    print(f"compiled step in {time.perf_counter() - t0:.0f}s", flush=True)
    for rnd in range(3):
        per = []
        t0 = time.perf_counter()
        for _ in range(8):
            ts = time.perf_counter()
            c = one(c) * 1e-30
            per.append(round((time.perf_counter() - ts) * 1e3, 2))
        float(c)
        dt = (time.perf_counter() - t0) / 8
        print(f"round {rnd}: step {dt * 1e3:.1f} ms, dispatch_ms {per}",
              flush=True)


if __name__ == "__main__":
    main()
