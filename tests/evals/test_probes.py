"""Probe-grid tests: vmapped grid trains, separates configs, learns.

The key check mirrors the reference's behaviour claim: a grid of probes with
different LRs produces *different* probes, and a sane LR learns a linearly
separable synthetic task from frozen 'features'.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid


def make_synthetic(n=256, tokens=8, dim=32, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, classes, size=n)
    centers = rng.randn(classes, dim) * 3
    feats = centers[labels][:, None, :] + rng.randn(n, tokens, dim) * 0.5
    return feats.astype(np.float32), labels


def test_probe_grid_learns_and_separates():
    feats, labels = make_synthetic()
    grid = ProbeGrid(
        [ProbeConfig(lr=1e-2, weight_decay=0.0), ProbeConfig(lr=1e-7, weight_decay=0.0)],
        embed_dim=32,
        num_classes=4,
        num_heads=4,
        total_steps=50,
        seed=0,
    )
    params, opt, step = grid.init(feats.shape[1:])
    for i in range(30):
        b = slice((i * 64) % 192, (i * 64) % 192 + 64)
        params, opt, step, m = grid.train_step(
            params, opt, step, jnp.asarray(feats[b]), jnp.asarray(labels[b])
        )
    accs = np.asarray(m["acc"])
    assert accs.shape == (2,)
    # high-lr probe learns the separable task; dead-lr probe doesn't
    assert accs[0] > 0.9, f"lr=1e-2 probe failed to learn: {accs}"
    assert accs[0] > accs[1] + 0.2, f"probes not separated: {accs}"
    # eval path
    correct = grid.eval_correct(params, jnp.asarray(feats[192:]), jnp.asarray(labels[192:]))
    assert correct.shape == (2,)
    assert correct[0] > 0.8 * 64
