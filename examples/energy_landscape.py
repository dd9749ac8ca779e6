"""Energy-landscape / CEM planning demo
(reference `notebooks/energy_landscape_example.ipynb`, `notebooks/vjepa2_demo.py`).

Encodes a start and a goal frame with the (frozen) encoder, sweeps candidate
actions to chart the latent L1 "energy" surface, then runs the jitted CEM
planner to recover the action that moves the latent toward the goal.

With --checkpoint pointing at converted V-JEPA 2-AC weights this reproduces
the reference demo; without one it runs on random weights to demonstrate the
pipeline end-to-end.

Usage:
  python examples/energy_landscape.py [--checkpoint vjepa2-ac-vitg.pt] [--tiny]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tiny", action="store_true", help="tiny random model (fast demo)")
    ap.add_argument("--size", type=int, default=64)
    args = ap.parse_args()

    from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
    from vjepa2_tpu.models.vision_transformer import vit_tiny
    from vjepa2_tpu.planning import CEMConfig, WorldModel
    from vjepa2_tpu.data.video import synthetic_clip

    S = args.size
    if args.tiny or args.checkpoint is None:
        encoder = vit_tiny(img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True)
        predictor = vit_ac_predictor(
            img_size=(S, S), patch_size=16, num_frames=16, tubelet_size=2,
            embed_dim=192, predictor_embed_dim=128, depth=2, num_heads=4,
        )
        frame = jnp.zeros((1, 2, S, S, 3), jnp.float32)
        enc_params = jax.jit(encoder.init)(jax.random.PRNGKey(0), frame)["params"]
        tpf = (S // 16) ** 2
        h = encoder.apply({"params": enc_params}, frame)
        pred_params = jax.jit(
            lambda k: predictor.init(
                k, jnp.zeros((1, 2 * tpf, 192)), jnp.zeros((1, 2, 7)), jnp.zeros((1, 2, 7))
            )
        )(jax.random.PRNGKey(1))["params"]
    else:
        from vjepa2_tpu.hub import vjepa2_ac_vit_giant

        (encoder, enc_params), (predictor, pred_params) = vjepa2_ac_vit_giant(
            checkpoint=args.checkpoint, img_size=S
        )
        tpf = (S // 16) ** 2

    wm = WorldModel(
        encoder, enc_params, predictor, pred_params,
        tokens_per_frame=tpf,
        cem_config=CEMConfig(rollout=1, cem_steps=5, samples=64, topk=8),
    )

    start = synthetic_clip(1, S, S, seed=0)[0].astype(np.float32) / 255.0
    goal = synthetic_clip(1, S, S, seed=3)[0].astype(np.float32) / 255.0
    rep = wm.encode(start)
    goal_rep = wm.encode(goal)
    pose = np.zeros(7, np.float32)

    # -- energy landscape: sweep x/y action deltas, chart L1 to goal
    deltas = np.linspace(-0.05, 0.05, 7)
    print("energy landscape (rows: dx, cols: dy):")
    energies = np.zeros((len(deltas), len(deltas)))

    def step_energy(dx, dy):
        a = jnp.zeros((1, 1, 7)).at[0, 0, 0].set(dx).at[0, 0, 1].set(dy)
        reps = rep[None]
        nxt = predictor.apply({"params": pred_params}, reps, a, jnp.asarray(pose)[None, None])
        nxt = nxt[:, -tpf:]
        return float(jnp.abs(nxt[0] - goal_rep).mean())

    for i, dx in enumerate(deltas):
        for j, dy in enumerate(deltas):
            energies[i, j] = step_energy(float(dx), float(dy))
    np.set_printoptions(precision=4, suppress=True)
    print(energies)

    # -- CEM plan
    plan = wm.infer_next_action(rep, pose, goal_rep, rng=jax.random.PRNGKey(0))
    print("planned action trajectory [rollout, 7]:")
    print(np.round(plan, 4))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
