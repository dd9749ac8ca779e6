"""Shared gradient-accumulation machinery for the pretrain and DROID steps.

`grad_accum > 1` splits a batch into sequential microbatches: one `lax.scan`
of forward+backward passes (activations freed between iterations) whose
gradients — and loss/aux values — average before ONE optimizer update.
Capability the reference lacks: it scales effective batch by adding nodes
(`configs/train/vitl16/cooldown-256px-64f.yaml:5-17`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def microbatch_spec(grad_accum: int) -> P:
    """Batch PartitionSpec: (data, fsdp) on the batch dim, which leads when
    grad_accum == 1 and sits behind the scan (microbatch) dim otherwise."""
    from vjepa2_tpu.core.mesh import batch_spec

    return batch_spec() if grad_accum == 1 else P(None, ("data", "fsdp"))


def scan_accumulate(loss_and_grads, params, target_params, xs, aux_zero,
                    grad_accum: int):
    """Average (aux, grads) over `grad_accum` microbatches.

    ``loss_and_grads(params, target_params, *x) -> (aux, grads)`` where aux
    is any float pytree (a scalar loss, or a (loss, (tf, ar)) tuple); every
    leaf of ``xs`` carries the leading microbatch dim (None leaves allowed —
    e.g. absent extrinsics).
    """

    def body(carry, x):
        gsum, asum = carry
        aux, g = loss_and_grads(params, target_params, *x)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        asum = jax.tree_util.tree_map(jnp.add, asum, aux)
        return (gsum, asum), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    (gsum, asum), _ = jax.lax.scan(body, (zeros, aux_zero), xs)
    inv = 1.0 / grad_accum
    return (
        jax.tree_util.tree_map(lambda a: a * inv, asum),
        jax.tree_util.tree_map(lambda g: g * inv, gsum),
    )


def validate_grad_accum(batch_size: int, grad_accum: int, mesh) -> None:
    """Config-time checks, shared by Pretrainer and DroidTrainer: fail here
    with a readable message instead of an opaque pjit sharding error at the
    first step."""
    assert batch_size % grad_accum == 0, (
        f"batch_size {batch_size} not divisible by grad_accum {grad_accum}"
    )
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    assert (batch_size // grad_accum) % dp == 0, (
        f"microbatch {batch_size // grad_accum} not divisible by the "
        f"data-parallel mesh ({dp} ways)"
    )
