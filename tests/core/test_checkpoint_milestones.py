"""Milestone checkpoints survive the rolling max_to_keep GC.

Reference keeps a permanent ``e{N}.pt`` every ``save_every_freq`` epochs on
top of the per-epoch ``latest.pt`` (`app/vjepa/train.py:516-521`). Here the
orbax manager's ``keep_period`` provides the same guarantee: steps divisible
by it are never garbage-collected.
"""

import jax.numpy as jnp

from vjepa2_tpu.core.checkpoint import CheckpointManager


def test_keep_period_survives_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2, keep_period=5)
    state = {"w": jnp.zeros((2, 2)), "step": jnp.zeros([], jnp.int32)}
    for step in range(1, 11):
        mgr.save(step, {**state, "step": jnp.asarray(step, jnp.int32)}, wait=True)
    steps = sorted(mgr._mgr.all_steps())
    # milestones (5, 10) are permanent; the rolling window keeps the last 2
    assert 5 in steps and 10 in steps, steps
    assert 9 in steps or 10 in steps  # rolling window tail
    assert 1 not in steps and 2 not in steps, steps
    # milestone restore returns the right step
    restored = mgr.restore(state, step=5)
    assert int(restored["step"]) == 5
    mgr.close()


def test_no_keep_period_rolls(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = {"w": jnp.zeros((2, 2))}
    for step in range(1, 6):
        mgr.save(step, state, wait=True)
    steps = sorted(mgr._mgr.all_steps())
    assert steps == [4, 5], steps
    mgr.close()
