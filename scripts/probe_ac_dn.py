"""Step-level A/B of the AC predictor's narrow-head DN route (r5).

VERDICT r4 weak-#2: the frame-causal AC path (segment ids) was excluded
from every DN optimization — ACAttention always rode the BHND layout
(Dh=64 -> 2x lane pad on qkv stores, saved residuals, dk/dv partials).
`ops/flash_attention_dn.py` now carries segment masking (fp32 row+column
side inputs) and `ac_predictor.AC_ROPE_HOIST` hoists the rope expansion +
unlocks the DN gate. This probe times the FULL droid train step (vit_large
encoder + pred24x1024, 8f@256 bs8 — the bench `--mode ac` shape) under
both paths in ONE process (methodology v4: interleave variants,
min-of-rounds).

Run: timeout 4500 python -u scripts/probe_ac_dn.py [--rounds 4 --iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vjepa2_tpu.models.ac_predictor as acp
from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY
from vjepa2_tpu.train.droid import (
    DroidHParams,
    init_droid_params,
    make_droid_optimizer,
    make_droid_train_step,
)
from vjepa2_tpu.train.state import TrainState


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    args = ap.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        B, T, S, name = 2, 4, 64, "vit_tiny"
        pdim, pheads, pdepth = 128, 4, 2
        rounds, iters = args.rounds or 1, args.iters or 2
    else:
        B, T, S, name = 8, 8, 256, "vit_large"
        pdim, pheads, pdepth = 1024, 16, 24
        rounds, iters = args.rounds or 4, args.iters or 6

    encoder = MODEL_REGISTRY[name](
        img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True,
        use_flash=True, use_activation_checkpointing=True, dtype=jnp.bfloat16)
    predictor = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=encoder.embed_dim, predictor_embed_dim=pdim, depth=pdepth,
        num_heads=pheads, use_flash=True, use_activation_checkpointing=True,
        dtype=jnp.bfloat16)
    hp = DroidHParams(total_steps=1000, warmup_steps=10, anneal_steps=100,
                      auto_steps=2)
    params, enc_params, tpf = init_droid_params(
        encoder, predictor, 0, (B, T, S, S, 3))
    tx = make_droid_optimizer(hp, params_like=params)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       target_params=enc_params, opt_state=tx.init(params))
    rs = np.random.RandomState(0)
    clips0 = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.bfloat16)
    actions = jnp.asarray(rs.rand(B, T - 1, 7) * 0.1, jnp.float32)
    states_in = jnp.asarray(rs.rand(B, T, 7), jnp.float32)

    VARIANTS = [("bhnd", False), ("dn", True)]
    fns = {}
    for vname, hoist in VARIANTS:
        acp.AC_ROPE_HOIST = hoist  # read at trace time
        fns[vname] = jax.jit(
            make_droid_train_step(encoder, predictor, tx, hp, tpf),
            donate_argnums=(0,))

    def one(vname, carry):
        nonlocal state
        state, m = fns[vname](state, clips0 + carry.astype(jnp.bfloat16) * 0,
                              actions, states_in)
        return m["loss"]

    c = jnp.float32(0.0)
    losses = {}
    for vname, hoist in VARIANTS:
        acp.AC_ROPE_HOIST = hoist
        t0 = time.perf_counter()
        c = one(vname, c) * 1e-30
        float(c)
        print(f"compiled {vname} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        losses[vname] = float(one(vname, jnp.float32(0.0)))
        c = jnp.float32(losses[vname]) * 1e-30
    print("loss " + " ".join(f"{v}={losses[v]:.6f}" for v, _ in VARIANTS)
          + " (consecutive steps on one evolving state — sanity only)",
          flush=True)

    best = {v: 1e9 for v, _ in VARIANTS}
    for rnd in range(rounds):
        for vname, hoist in VARIANTS:
            acp.AC_ROPE_HOIST = hoist
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
