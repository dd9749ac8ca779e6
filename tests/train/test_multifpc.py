"""Within-step multi-fpc semantics (VERDICT r2 #4).

The reference averages the JEPA loss over every (fpc x mask-config) pair
inside ONE optimizer step (`app/vjepa/train.py:425-435`,
`src/masks/multiseq_multiblock3d.py:63-74`). These tests check the
multi-bucket step composes exactly like the per-bucket step, the batch
grouping wrapper, and the full Pretrainer path with a 2-fpc config.
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from vjepa2_tpu.core.config import PretrainConfig
from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.train.loop import Pretrainer, group_fpc_batches
from vjepa2_tpu.train.pretrain import (
    PretrainHParams,
    build_models,
    init_params,
    make_multifpc_train_step,
    make_optimizer,
    make_train_step,
)
from vjepa2_tpu.train.state import TrainState

B, S = 4, 32
MASK_CFGS = [
    {"aspect_ratio": (0.75, 1.5), "num_blocks": 2, "spatial_scale": (0.7, 0.7),
     "temporal_scale": (1.0, 1.0)},
]


def _setup(fpc=4):
    enc, pred = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=fpc,
        pred_depth=1, pred_embed_dim=64, pred_num_heads=2,
        use_rope=True, num_mask_tokens=2, dtype=jnp.float32,
    )
    coll = MaskCollator(MASK_CFGS, dataset_fpcs=[fpc], crop_size=(S, S))
    coll.step()
    me, mp = coll(fpc, B)
    hp = PretrainHParams(ipe=4, epochs=1)
    tx = make_optimizer(hp)
    params, target = init_params(enc, pred, 0, (B, fpc, S, S, 3),
                                 jnp.asarray(me[0]), jnp.asarray(mp[0]))
    state = TrainState.create(params, target, tx)
    clips = jnp.asarray(np.random.RandomState(0).rand(B, fpc, S, S, 3), jnp.float32)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    return enc, pred, tx, hp, state, clips, me, mp


def test_multifpc_step_matches_single_bucket_composition():
    """With two IDENTICAL buckets the multi-bucket step must equal the
    single-bucket step exactly (the pair-mean collapses), proving the loss/
    grad composition: mean over pairs -> one update."""
    enc, pred, tx, hp, state, clips, me, mp = _setup()

    single = jax.jit(make_train_step(enc, pred, tx, hp, mask_indices=[0]))
    multi = jax.jit(make_multifpc_train_step(enc, pred, tx, hp, num_mask_cfgs=1))

    # multi with bucket-identical inputs; mask_index differs per bucket
    # (bucket 1 uses token index 1) so zero-init mask tokens keep z equal
    s1, m1 = single(state, clips, me, mp)
    s2, m2 = multi(state, (clips, clips), (me, me), (mp, mp))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    # every SHARED parameter updates identically; mask_tokens intentionally
    # differ (bucket 1 trains token row 1, which the single step never sees)
    f1 = jax.tree_util.tree_leaves_with_path(s1.params)
    f2 = jax.tree_util.tree_leaves_with_path(s2.params)
    for (p1, a), (p2, b) in zip(f1, f2):
        assert p1 == p2
        if "mask_tokens" in jax.tree_util.keystr(p1):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6,
                                   rtol=1e-5, err_msg=jax.tree_util.keystr(p1))


def test_multifpc_loss_is_pair_mean():
    """Distinct buckets: loss == mean of the per-bucket losses."""
    enc, pred, tx, hp, state, clips, me, mp = _setup()
    clips2 = clips * 0.5 + 0.1

    single = jax.jit(make_train_step(enc, pred, tx, hp, mask_indices=[0]))
    single_b1 = jax.jit(make_train_step(enc, pred, tx, hp, mask_indices=[1]))
    multi = jax.jit(make_multifpc_train_step(enc, pred, tx, hp, num_mask_cfgs=1))

    _, ma = single(state, clips, me, mp)
    _, mb = single_b1(state, clips2, me, mp)
    _, mm = multi(state, (clips, clips2), (me, me), (mp, mp))
    np.testing.assert_allclose(
        float(mm["loss"]), (float(ma["loss"]) + float(mb["loss"])) / 2, rtol=1e-6
    )


def test_group_fpc_batches():
    def batches():
        rs = np.random.RandomState(0)
        for f in [4, 4, 8, 4, 8, 8, 4, 8]:
            yield [rs.rand(2, f, 8, 8, 3)], np.zeros(2), [None]

    groups = list(group_fpc_batches(batches(), [8, 4]))
    assert len(groups) >= 3
    for g in groups:
        shapes = [np.asarray(b[0][0]).shape[1] for b in g]
        assert shapes == [4, 8]  # sorted fpc order


def test_group_fpc_batches_bounds_backlog():
    def batches():
        rs = np.random.RandomState(0)
        for f in [4] * 20 + [8]:
            yield [rs.rand(1, f, 8, 8, 3)], np.zeros(1), [None]

    groups = list(group_fpc_batches(batches(), [4, 8], max_pending=3))
    assert len(groups) == 1  # only one 8-batch arrived


CFG = """
app: vjepa
folder: "{folder}"
mesh: {{data: -1, fsdp: 1, model: 1}}
data:
  datasets: []
  batch_size: 8
  crop_size: 32
  patch_size: 16
  dataset_fpcs: [4, 8]
  tubelet_size: 2
  num_workers: 0
mask:
- {{aspect_ratio: [0.75, 1.5], num_blocks: 2, spatial_scale: [0.7, 0.7], temporal_scale: [1.0, 1.0]}}
meta: {{dtype: float32, seed: 0, load_checkpoint: false, eval_freq: 0}}
model:
  model_name: vit_tiny
  pred_depth: 1
  pred_embed_dim: 64
  pred_num_heads: 2
  use_mask_tokens: true
  use_rope: true
optimization:
  multifpc_within_step: true
  ema: [0.99, 0.99]
  epochs: 1
  ipe: 6
  lr: 0.001
  start_lr: 0.001
  final_lr: 0.001
  warmup: 0
  weight_decay: 0.01
  final_weight_decay: 0.01
"""


def test_pretrainer_multifpc_within_step(tmp_path):
    raw = yaml.safe_load(CFG.format(folder=str(tmp_path / "run")))
    cfg = PretrainConfig.from_dict(raw)
    t = Pretrainer(cfg, synthetic_data=True)
    assert t.multifpc
    out = t.run(epochs=1)
    assert np.isfinite(out["loss"])
    # ipe=6 raw batches alternating 2 fpcs -> 3 grouped steps
    assert out["step"] == 3


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
