"""Optimizer construction: AdamW with scheduled LR/WD + EMA target update.

Reproduces the reference's 4 param groups (`app/vjepa/utils.py:207-255`):
weight decay applies only to non-bias params with ndim >= 2; LR is shared
(with optional per-subtree ``lr_scale`` as in the DROID trainer,
`app/vjepa_droid/utils.py:215-227`). Schedules are evaluated *inside* the
jitted step from the optax count — no stateful scheduler replay on resume.

torch.AdamW semantics: p <- p - lr * (adam_update + wd * p)  — matched here
by chaining scale_by_adam -> add wd*p (masked) -> scale by -lr.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def wd_mask(params):
    """True where weight decay applies (ndim >= 2, mirrors 'bias or 1-D' exclusion)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def _scheduled_wd(wd_fn: Callable, mask) -> optax.GradientTransformation:
    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        wd = wd_fn(state.count)
        m = mask(params) if callable(mask) else mask
        updates = jax.tree_util.tree_map(
            lambda u, p, apply: u + wd * p if apply else u, updates, params, m,
            is_leaf=lambda x: x is None,
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def _scheduled_neg_lr(lr_fn: Callable, lr_scale_tree=None) -> optax.GradientTransformation:
    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        lr = lr_fn(state.count)
        if lr_scale_tree is None:
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        else:
            updates = jax.tree_util.tree_map(lambda u, s: -lr * s * u, updates, lr_scale_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_adamw(
    lr_fn: Callable,
    wd_fn: Callable,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    lr_scale_tree=None,
    mask=wd_mask,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        _scheduled_wd(wd_fn, mask),
        _scheduled_neg_lr(lr_fn, lr_scale_tree),
    )


def ema_update(target_params, online_params, momentum):
    """target <- m * target + (1 - m) * online (reference `train.py:456-465`)."""
    return jax.tree_util.tree_map(
        lambda t, o: t * momentum + (1.0 - momentum) * o, target_params, online_params
    )


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
