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
