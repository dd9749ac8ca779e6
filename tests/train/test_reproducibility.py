"""Determinism: same seed -> identical init, masks, and step losses."""

import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams,
    build_models,
    init_params,
    make_optimizer,
    make_train_step,
)
from vjepa2_tpu.train.state import TrainState

CFG = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
        "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]


def run_steps(seed, n=3):
    import jax

    B, T, S = 4, 4, 32
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T, pred_depth=1,
        pred_embed_dim=64, pred_num_heads=2, use_rope=True, dtype=jnp.float32,
    )
    coll = MaskCollator(CFG, dataset_fpcs=[T], crop_size=(S, S), seed=seed)
    hp = PretrainHParams(lr=1e-3, start_lr=1e-3, warmup_epochs=0, epochs=1, ipe=10)
    tx = make_optimizer(hp)
    coll.step()
    me, mp = coll(T, B)
    params, target = init_params(
        encoder, predictor, seed, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0])
    )
    state = TrainState.create(params, target, tx)
    step = jax.jit(make_train_step(encoder, predictor, tx, hp))
    clips = jnp.asarray(np.random.RandomState(seed).rand(B, T, S, S, 3), jnp.float32)
    losses = []
    for _ in range(n):
        coll.step()
        me, mp = coll(T, B)
        state, m = step(state, clips, tuple(map(jnp.asarray, me)), tuple(map(jnp.asarray, mp)))
        losses.append(float(m["loss"]))
    return losses


def test_same_seed_same_losses():
    a = run_steps(7)
    b = run_steps(7)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_different_seed_different_losses():
    a = run_steps(7)
    c = run_steps(8)
    assert a != c


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
