"""Jit-compiled CEM/MPC over the latent world model
(reference `notebooks/utils/mpc_utils.py:28-163`).

The reference loops cem_steps in Python with a tqdm and round-trips pose
math through scipy on CPU. Here the whole optimization — sample action
trajectories ~ N(mean, std), roll the AC predictor out `rollout` frames,
rank candidates by L1 distance of the final latent to the goal, momentum-
update (mean, std) from the top-k — is one ``lax.fori_loop`` program on
device; `samples` candidates batch through the predictor together.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from vjepa2_tpu.planning.rotations import compose_pose


@dataclass(frozen=True)
class CEMConfig:
    rollout: int = 2
    cem_steps: int = 10
    samples: int = 400
    topk: int = 10
    momentum_mean: float = 0.15
    momentum_std: float = 0.15
    momentum_mean_gripper: float = 0.15
    momentum_std_gripper: float = 0.15
    maxnorm: float = 0.05


def _expand_action(a4: jnp.ndarray) -> jnp.ndarray:
    """[S, 4] (xyz + gripper) -> [S, 7] with zero rotation deltas."""
    S = a4.shape[0]
    return jnp.concatenate([a4[:, :3], jnp.zeros((S, 3), a4.dtype), a4[:, 3:]], axis=-1)


def make_cem(step_fn: Callable, cfg: CEMConfig):
    """step_fn(params, reps [S, T*N, D], actions [S, T, 7], poses [S, T, 7])
    -> next frame reps [S, N, D]. Returns jitted
    cem(params, rng, rep [N, D], pose [7], goal [N, D]) -> [rollout, 7]
    (params as argument — never closure-capture weight trees)."""

    def rollout_trajs(params, mean, std, rng, rep, pose):
        S = cfg.samples
        reps = jnp.broadcast_to(rep[None], (S,) + rep.shape)  # [S, N, D]
        poses = jnp.broadcast_to(pose[None, None], (S, 1, 7))
        actions = jnp.zeros((S, 0, 7), rep.dtype)
        frame_seq = reps  # [S, T*N, D]
        for h in range(cfg.rollout):
            rng, k = jax.random.split(rng)
            a4 = jax.random.normal(k, (S, 4)) * std[h] + mean[h]
            a4 = a4.at[:, :3].set(jnp.clip(a4[:, :3], -cfg.maxnorm, cfg.maxnorm))
            a4 = a4.at[:, 3].set(jnp.clip(a4[:, 3], -0.75, 0.75))
            a7 = _expand_action(a4)[:, None]  # [S, 1, 7]
            actions = jnp.concatenate([actions, a7], axis=1)
            next_rep = step_fn(params, frame_seq, actions, poses)  # [S, N, D]
            frame_seq = jnp.concatenate([frame_seq, next_rep], axis=1)
            next_pose = compose_pose(poses[:, -1], actions[:, -1])[:, None]
            poses = jnp.concatenate([poses, next_pose], axis=1)
        final = frame_seq[:, -rep.shape[0] :]
        return actions, final, rng

    def cem(params, rng, rep, pose, goal):
        mean0 = jnp.zeros((cfg.rollout, 4))
        std0 = jnp.concatenate(
            [jnp.ones((cfg.rollout, 3)) * cfg.maxnorm, jnp.ones((cfg.rollout, 1))], axis=-1
        )

        def body(_, carry):
            mean, std, rng = carry
            actions, final, rng = rollout_trajs(params, mean, std, rng, rep, pose)
            dists = jnp.abs(final - goal[None]).mean(axis=(1, 2))  # [S]
            _, idx = jax.lax.top_k(-dists, cfg.topk)
            sel = actions[idx]  # [k, rollout, 7]
            sel4 = jnp.concatenate([sel[..., :3], sel[..., 6:7]], axis=-1)
            m_sel = sel4.mean(axis=0)
            s_sel = sel4.std(axis=0, ddof=1)
            mean = jnp.concatenate(
                [
                    m_sel[..., :3] * (1 - cfg.momentum_mean) + mean[..., :3] * cfg.momentum_mean,
                    m_sel[..., 3:] * (1 - cfg.momentum_mean_gripper)
                    + mean[..., 3:] * cfg.momentum_mean_gripper,
                ],
                axis=-1,
            )
            std = jnp.concatenate(
                [
                    s_sel[..., :3] * (1 - cfg.momentum_std) + std[..., :3] * cfg.momentum_std,
                    s_sel[..., 3:] * (1 - cfg.momentum_std_gripper)
                    + std[..., 3:] * cfg.momentum_std_gripper,
                ],
                axis=-1,
            )
            return mean, std, rng

        mean, std, _ = jax.lax.fori_loop(0, cfg.cem_steps, body, (mean0, std0, rng))
        grip = jnp.where(jnp.abs(mean[..., 3:]) < 0.25, 0.0, mean[..., 3:])
        return jnp.concatenate([mean[..., :3], jnp.zeros((cfg.rollout, 3)), grip], axis=-1)

    return jax.jit(cem)
