"""CEM planning tests with a synthetic linear world model."""

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.planning.cem import CEMConfig, make_cem
from vjepa2_tpu.planning.rotations import compose_pose, euler_xyz_to_matrix, matrix_to_euler_xyz


def test_rotation_roundtrip_vs_scipy():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(0)
    eul = rng.uniform(-1.0, 1.0, size=(5, 3))
    ours = np.asarray(euler_xyz_to_matrix(jnp.asarray(eul)))
    ref = Rotation.from_euler("xyz", eul).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    back = np.asarray(matrix_to_euler_xyz(jnp.asarray(ref)))
    ref_back = Rotation.from_matrix(ref).as_euler("xyz")
    np.testing.assert_allclose(back, ref_back, atol=1e-6)


def test_compose_pose_matches_reference_semantics():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(1)
    pose = rng.uniform(-0.5, 0.5, size=(7,))
    pose[6] = 0.5
    action = rng.uniform(-0.1, 0.1, size=(7,))
    new = np.asarray(compose_pose(jnp.asarray(pose), jnp.asarray(action)))
    np.testing.assert_allclose(new[:3], pose[:3] + action[:3], atol=1e-6)
    R = Rotation.from_euler("xyz", pose[3:6]).as_matrix()
    dR = Rotation.from_euler("xyz", action[3:6]).as_matrix()
    expect = Rotation.from_matrix(dR @ R).as_euler("xyz")
    np.testing.assert_allclose(new[3:6], expect, atol=1e-5)
    assert 0.0 <= new[6] <= 1.0


def test_cem_moves_toward_goal():
    """World model: latent moves by action xyz embedded in the feature space.
    CEM should discover the action that moves the latent toward the goal."""
    N, D = 4, 8

    def step_fn(params, reps, actions, poses):
        # next latent = last frame latent + broadcast of action xyz
        last = reps[:, -N:]
        delta = jnp.pad(actions[:, -1, :3], ((0, 0), (0, D - 3)))
        return last + delta[:, None, :]

    cfg = CEMConfig(rollout=1, cem_steps=8, samples=64, topk=8, maxnorm=0.05)
    cem = make_cem(step_fn, cfg)
    rep = jnp.zeros((N, D))
    goal = jnp.zeros((N, D)).at[:, 0].set(0.05)  # want +x movement at maxnorm
    pose = jnp.zeros((7,))
    plan = cem({}, jax.random.PRNGKey(0), rep, pose, goal)
    assert plan.shape == (1, 7)
    assert float(plan[0, 0]) > 0.02, f"CEM failed to find +x action: {plan}"
    np.testing.assert_allclose(np.asarray(plan[0, 3:6]), 0.0, atol=1e-7)


def test_pose_diff_inverse_of_compose():
    from vjepa2_tpu.planning.rotations import pose_diff

    rng = np.random.RandomState(3)
    start = rng.uniform(-0.3, 0.3, size=(7,)); start[6] = 0.4
    end = rng.uniform(-0.3, 0.3, size=(7,)); end[6] = 0.7
    action = pose_diff(jnp.asarray(start), jnp.asarray(end))
    recovered = compose_pose(jnp.asarray(start), action)
    np.testing.assert_allclose(np.asarray(recovered), end, atol=1e-5)
