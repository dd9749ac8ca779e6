"""Scheduler golden tests vs the reference's stateful implementations
(`src/utils/schedulers.py`) re-derived as plain python."""

import math

import numpy as np

from vjepa2_tpu.core.schedulers import cosine_wd, ema_momentum, warmup_cosine_lr, wsd_lr


def ref_warmup_cosine(step1, warmup_steps, start_lr, ref_lr, T_total, final_lr=0.0):
    T_max = T_total - warmup_steps
    if step1 < warmup_steps:
        progress = step1 / max(1, warmup_steps)
        return start_lr + progress * (ref_lr - start_lr)
    progress = (step1 - warmup_steps) / max(1, T_max)
    return max(final_lr, final_lr + (ref_lr - final_lr) * 0.5 * (1 + math.cos(math.pi * progress)))


def test_warmup_cosine_matches_reference():
    kw = dict(warmup_steps=40, start_lr=0.1, ref_lr=1.0, t_max=1000, final_lr=0.01)
    for step in [0, 1, 10, 39, 40, 100, 500, 959, 1100]:
        ours = float(warmup_cosine_lr(step, **kw))
        ref = ref_warmup_cosine(step + 1, 40, 0.1, 1.0, 1000, 0.01)
        np.testing.assert_allclose(ours, ref, rtol=1e-6, err_msg=f"step {step}")


def test_cosine_wd_matches_reference():
    for step in [0, 10, 499, 999]:
        ours = float(cosine_wd(step, ref_wd=0.04, t_max=1000, final_wd=0.4))
        progress = (step + 1) / 1000
        ref = 0.4 + (0.04 - 0.4) * 0.5 * (1 + math.cos(math.pi * progress))
        ref = min(0.4, ref)  # final > ref: clamp upward
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_wsd_phases():
    kw = dict(warmup_steps=10, anneal_steps=20, t_max=100, start_lr=0.0, ref_lr=1.0, final_lr=0.0)
    assert float(wsd_lr(0, **kw)) < 0.2  # warming
    assert abs(float(wsd_lr(50, **kw)) - 1.0) < 1e-6  # stable
    assert float(wsd_lr(95, **kw)) < 1.0  # annealing
    assert float(wsd_lr(98, **kw)) < 0.1


def test_ema_ramp():
    np.testing.assert_allclose(
        float(ema_momentum(0, ema_start=0.998, ema_end=1.0, t_max=100)), 0.998, rtol=1e-6
    )
    np.testing.assert_allclose(float(ema_momentum(100, ema_start=0.998, ema_end=1.0, t_max=100)), 1.0)
