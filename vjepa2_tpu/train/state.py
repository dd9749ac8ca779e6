"""Train state pytree for JEPA pretraining.

One struct holds everything the step touches — online params (encoder +
predictor as one tree so a single AdamW mirrors the reference's param
groups), EMA target params, and optax state. The step index lives in the
optax count; schedules are pure functions of it (no replay on resume).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32
    params: Any  # {"encoder": ..., "predictor": ...}
    target_params: Any  # EMA copy of params["encoder"]
    opt_state: Any

    @classmethod
    def create(cls, params, target_params, tx):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            target_params=target_params,
            opt_state=tx.init(params),
        )


def num_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
