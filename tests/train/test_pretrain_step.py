"""End-to-end pretrain-step test on an 8-virtual-device CPU mesh.

Covers the gap called out in SURVEY.md §4: the reference has no integration
test of a full train step and no distributed test. Here the full jitted step
(dual encoder fwd + predictor + loss + AdamW + EMA) runs sharded over
data x fsdp and must decrease the loss on a fixed synthetic batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.core.mesh import MeshConfig, make_mesh
from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.pretrain import (
    PretrainHParams,
    build_models,
    init_params,
    jit_train_step,
    make_optimizer,
    make_train_step,
    shard_state,
)
from vjepa2_tpu.train.state import TrainState

MASK_CFGS = [
    {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0), "aspect_ratio": (0.75, 1.5), "num_blocks": 4},
    {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0), "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
]


@pytest.mark.parametrize("use_rope", [True, False])
def test_pretrain_step_loss_decreases(use_rope):
    B, T, S = 8, 4, 32
    encoder, predictor = build_models(
        model_name="vit_tiny",
        crop_size=S,
        patch_size=16,
        num_frames=T,
        tubelet_size=2,
        pred_depth=2,
        pred_embed_dim=192,
        pred_num_heads=3,
        use_rope=use_rope,
        num_mask_tokens=2,
        dtype=jnp.float32,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    masks_enc, masks_pred = coll(T, B)

    hp = PretrainHParams(lr=1e-3, start_lr=1e-3, final_lr=1e-3, warmup_epochs=0, epochs=1, ipe=100)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(masks_enc[0]), jnp.asarray(masks_pred[0])
    )
    state = TrainState.create(params, target, tx)

    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    state = shard_state(state, mesh)
    step = jit_train_step(make_train_step(encoder, predictor, tx, hp), mesh)

    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3), jnp.float32)
    me = tuple(jnp.asarray(m) for m in masks_enc)
    mp = tuple(jnp.asarray(m) for m in masks_pred)

    losses = []
    for _ in range(8):
        state, metrics = step(state, clips, me, mp)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 8


def test_ema_target_moves():
    B, T, S = 2, 2, 32
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T, pred_depth=1,
        pred_embed_dim=64, pred_num_heads=2, use_rope=True, dtype=jnp.float32,
    )
    coll = MaskCollator(MASK_CFGS[:1], dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    masks_enc, masks_pred = coll(T, B)
    hp = PretrainHParams(ema=(0.5, 0.5), lr=1e-2, start_lr=1e-2, warmup_epochs=0)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(masks_enc[0]), jnp.asarray(masks_pred[0])
    )
    state = TrainState.create(params, target, tx)
    step_fn = make_train_step(encoder, predictor, tx, hp)
    clips = jnp.ones((B, T, S, S, 3), jnp.float32)
    new_state, _ = jax.jit(step_fn)(state, clips, tuple(map(jnp.asarray, masks_enc)), tuple(map(jnp.asarray, masks_pred)))
    # after one step with m=0.5, target = 0.5*(old_target + new_online)
    leaf_old = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    leaf_new = jax.tree_util.tree_leaves(new_state.params["encoder"])[0]
    leaf_tgt = jax.tree_util.tree_leaves(new_state.target_params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf_tgt), 0.5 * np.asarray(leaf_old) + 0.5 * np.asarray(leaf_new), atol=1e-6
    )


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
