"""LR / WD / EMA-momentum schedules as pure step->value functions.

Unlike the reference's stateful scheduler objects that must be replayed
step-by-step on resume (`app/vjepa/train.py:309-313`), these are pure
functions of the step index — the step lives in the train state, resume is
free, and the whole schedule evaluates inside the jitted train step.

Semantics match reference `src/utils/schedulers.py` exactly, including its
1-based ``_step`` (the first ``step()`` call returns the value for step 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(step, *, warmup_steps, start_lr, ref_lr, t_max, final_lr=0.0):
    """Reference `WarmupCosineSchedule` (`schedulers.py:41-68`).

    t_max here is the TOTAL schedule length (reference passes
    ``ipe_scale * epochs * ipe`` and subtracts warmup internally).
    """
    step = jnp.asarray(step, jnp.float32) + 1.0  # reference increments first
    # jnp.maximum (not python max): warmup_steps/t_max may be traced (vmapped
    # probe grids pass per-probe schedules).
    t_cos = jnp.maximum(1.0, jnp.asarray(t_max, jnp.float32) - warmup_steps)
    warm = start_lr + (step / jnp.maximum(1.0, jnp.asarray(warmup_steps, jnp.float32))) * (
        ref_lr - start_lr
    )
    progress = (step - warmup_steps) / t_cos
    cos = final_lr + (ref_lr - final_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    cos = jnp.maximum(final_lr, cos)
    return jnp.where(step < warmup_steps, warm, cos)


def cosine_wd(step, *, ref_wd, t_max, final_wd=0.0):
    """Reference `CosineWDSchedule` (`schedulers.py:71-93`)."""
    step = jnp.asarray(step, jnp.float32) + 1.0
    progress = step / t_max
    wd = final_wd + (ref_wd - final_wd) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    # clamp toward final_wd on both ramp directions; jnp.where (not python
    # if): ref_wd/final_wd are traced under the vmapped probe grids
    return jnp.where(jnp.asarray(final_wd) <= ref_wd,
                     jnp.maximum(final_wd, wd), jnp.minimum(final_wd, wd))


def wsd_lr(step, *, warmup_steps, anneal_steps, t_max, start_lr, ref_lr, final_lr=0.0):
    """Warmup-Stable-Decay, reference `WSDSchedule` (`schedulers.py:9-38`).

    t_max is the TOTAL length; the stable phase is
    t_max - warmup_steps - anneal_steps.
    """
    step = jnp.asarray(step, jnp.float32) + 1.0
    stable_end = t_max - anneal_steps
    warm = start_lr + (step / max(1, warmup_steps)) * (ref_lr - start_lr)
    anneal_progress = (step - stable_end) / max(1, anneal_steps)
    anneal = ref_lr + anneal_progress * (final_lr - ref_lr)
    return jnp.where(step < warmup_steps, warm, jnp.where(step < stable_end, ref_lr, anneal))


def ema_momentum(step, *, ema_start, ema_end, t_max):
    """Linear EMA momentum ramp (reference `app/vjepa/train.py:286-289`)."""
    step = jnp.asarray(step, jnp.float32)
    return ema_start + step * (ema_end - ema_start) / t_max
