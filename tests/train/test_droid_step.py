"""AC post-training step: loss decreases, rollout loss computed."""

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.models.ac_predictor import vit_ac_predictor
from vjepa2_tpu.models.vision_transformer import vit_tiny
from vjepa2_tpu.train.droid import (
    DroidHParams,
    init_droid_params,
    make_droid_optimizer,
    make_droid_train_step,
)
from vjepa2_tpu.train.state import TrainState


def test_droid_step_loss_decreases():
    B, T, S = 2, 4, 32
    encoder = vit_tiny(img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True)
    predictor = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=192, predictor_embed_dim=64, depth=2, num_heads=2,
    )
    hp = DroidHParams(lr=1e-3, start_lr=1e-3, warmup_steps=0, anneal_steps=10,
                      total_steps=100, auto_steps=2)
    tx = make_droid_optimizer(hp)
    params, enc_params, tpf = init_droid_params(encoder, predictor, 0, (B, T, S, S, 3))
    assert tpf == 4  # 2x2 spatial, 1 temporal
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       target_params=enc_params, opt_state=tx.init(params))
    step = jax.jit(make_droid_train_step(encoder, predictor, tx, hp, tpf))

    rs = np.random.RandomState(0)
    clips = jnp.asarray(rs.rand(B, T, S, S, 3), jnp.float32)
    actions = jnp.asarray(rs.rand(B, T - 1, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(B, T, 7), jnp.float32)

    losses = []
    for _ in range(6):
        state, m = step(state, clips, actions, states)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"droid loss did not decrease: {losses}"
    assert float(m["loss_rollout"]) > 0


def test_droid_step_u8_matches_float():
    """uint8 clips + device normalization == host-normalized float clips
    (the `data.normalize_on_device` contract extends to the AC trainer)."""
    from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    B, T, S = 2, 4, 32
    encoder = vit_tiny(img_size=(S, S), num_frames=2, tubelet_size=2, use_rope=True)
    predictor = vit_ac_predictor(
        img_size=(S, S), patch_size=16, num_frames=2 * T, tubelet_size=2,
        embed_dim=192, predictor_embed_dim=64, depth=2, num_heads=2,
    )
    hp = DroidHParams(lr=1e-3, start_lr=1e-3, warmup_steps=0, anneal_steps=10,
                      total_steps=100, auto_steps=1)
    tx = make_droid_optimizer(hp)
    params, enc_params, tpf = init_droid_params(encoder, predictor, 0, (B, T, S, S, 3))
    mk = lambda ns: jax.jit(make_droid_train_step(encoder, predictor, tx, hp, tpf,
                                                  norm_stats=ns))
    step_u8 = mk((IMAGENET_MEAN, IMAGENET_STD))
    step_f = mk(None)

    rs = np.random.RandomState(1)
    u8 = rs.randint(0, 255, (B, T, S, S, 3), np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    actions = jnp.asarray(rs.rand(B, T - 1, 7) * 0.1, jnp.float32)
    states = jnp.asarray(rs.rand(B, T, 7), jnp.float32)

    def fresh():
        return TrainState(step=jnp.zeros([], jnp.int32), params=params,
                          target_params=enc_params, opt_state=tx.init(params))

    _, m_u8 = step_u8(fresh(), jnp.asarray(u8), actions, states)
    _, m_f = step_f(fresh(), jnp.asarray(f32, jnp.float32), actions, states)
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f["loss"]),
                               rtol=1e-5, atol=1e-6)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
