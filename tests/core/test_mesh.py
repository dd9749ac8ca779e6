"""Mesh/sharding tests: FSDP + tensor-parallel rules on the virtual 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.core.mesh import MeshConfig, make_mesh, param_spec
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


class _K:
    def __init__(self, key):
        self.key = key


def _spec(path_str, shape):
    path = tuple(_K(p) for p in path_str.split("/"))
    return param_spec(path, np.zeros(shape))


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert _spec("blocks_0/attn/qkv/kernel", (64, 192)) == P("fsdp", "model")
    assert _spec("blocks_0/attn/proj/kernel", (64, 64)) == P("model", "fsdp")
    assert _spec("blocks_0/mlp/fc1/kernel", (64, 256)) == P("fsdp", "model")
    assert _spec("blocks_0/mlp/fc2/kernel", (256, 64)) == P("model", "fsdp")  # Mlp out
    assert _spec("blocks_0/mlp/fc2/kernel", (64, 256)) == P("fsdp", "model")  # SwiGLU value
    assert _spec("blocks_0/mlp/fc3/kernel", (256, 64)) == P("model", "fsdp")  # SwiGLU out
    assert _spec("norm/scale", (64,)) == P()
    # conv kernel: largest-dim fsdp
    s = _spec("patch_embed/proj/kernel", (2, 16, 16, 3, 64))
    assert "model" not in jax.tree_util.tree_leaves(s)


def test_param_spec_cp_rules():
    """CP mode: the model axis carries tokens, so params ZeRO-shard over the
    combined ('fsdp','model') axes and the TP matmul rules are off."""
    from jax.sharding import PartitionSpec as P

    def cp_spec(path_str, shape):
        path = tuple(_K(p) for p in path_str.split("/"))
        return param_spec(path, np.zeros(shape), tp=False, cp=True)

    assert cp_spec("blocks_0/attn/qkv/kernel", (64, 192)) == P(None, ("fsdp", "model"))
    assert cp_spec("blocks_0/mlp/fc1/kernel", (256, 64)) == P(("fsdp", "model"), None)
    assert cp_spec("norm/scale", (64,)) == P()
    with pytest.raises(ValueError):
        param_spec((_K("x"),), np.zeros((4, 4)), tp=True, cp=True)


def test_mesh_resolve():
    cfg = MeshConfig(data=-1, fsdp=2, model=2)
    assert cfg.resolve(8) == (2, 2, 2, 1)
    with pytest.raises(AssertionError):
        MeshConfig(data=3, fsdp=2, model=2).resolve(8)


def test_arrange_hybrid_groups_slices():
    """Multi-slice pods: same-slice devices contiguous, slice on the slowest
    axis, so fsdp/model collectives ride ICI and only 'data' crosses DCN."""
    from vjepa2_tpu.core.mesh import arrange_hybrid

    class FakeDev:
        def __init__(self, id, slice_index):
            self.id = id
            self.slice_index = slice_index

        def __repr__(self):
            return f"d{self.id}s{self.slice_index}"

    # interleaved arrival order (process-major), 2 slices x 4 chips
    devs = [FakeDev(i, i % 2) for i in range(8)]
    out = arrange_hybrid(devs)
    assert [d.slice_index for d in out] == [0] * 4 + [1] * 4
    # stable within a slice by id
    assert [d.id for d in out] == [0, 2, 4, 6, 1, 3, 5, 7]
    # a 4x2x1 mesh then puts the slice boundary between data rows 1 and 2:
    # every (fsdp, model) row is intra-slice
    rows = np.asarray(out).reshape(4, 2, 1)
    for r in range(4):
        assert len({d.slice_index for d in rows[r].flat}) == 1
    # CPU / single-slice devices (no slice_index) keep their GIVEN order —
    # an explicit caller-chosen layout is never re-sorted
    class Plain:
        def __init__(self, id):
            self.id = id

    plain = [Plain(i) for i in (2, 3, 0, 1)]
    assert [d.id for d in arrange_hybrid(plain)] == [2, 3, 0, 1]
    # devices-per-slice must divide fsdp*model, else fsdp/model collectives
    # would cross DCN every layer: make_mesh rejects the layout
    from vjepa2_tpu.core.mesh import make_mesh

    with pytest.raises(AssertionError, match="cross DCN"):
        make_mesh(MeshConfig(data=-1, fsdp=8, model=1), devices=devs)
    # injected slice assignment (virtual-device rehearsal path): plain
    # devices with a synthetic slice_of behave exactly like slice_index
    out2 = arrange_hybrid(plain, slice_of=lambda d: d.id % 2)
    assert [d.id for d in out2] == [0, 2, 1, 3]
    with pytest.raises(AssertionError, match="cross DCN"):
        make_mesh(MeshConfig(data=-1, fsdp=8, model=1),
                  devices=[Plain(i) for i in range(8)],
                  slice_of=lambda d: d.id % 2)


def test_train_step_with_tensor_parallel():
    """Full pretrain step over a data=2 x fsdp=2 x model=2 mesh."""
    B, T, S = 4, 4, 32
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T, tubelet_size=2,
        pred_depth=1, pred_embed_dim=64, pred_num_heads=2, use_rope=True,
        dtype=jnp.float32,
    )
    coll = MaskCollator(
        [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
          "aspect_ratio": (0.75, 1.5), "num_blocks": 2}],
        dataset_fpcs=[T], crop_size=(S, S),
    )
    coll.step()
    me, mp = coll(T, B)
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)
    tx = make_optimizer(hp)
    params, target = init_params(
        encoder, predictor, 0, (B, T, S, S, 3), jnp.asarray(me[0]), jnp.asarray(mp[0])
    )
    state = TrainState.create(params, target, tx)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, model=2))
    state = shard_state(state, mesh)
    step = jit_train_step(make_train_step(encoder, predictor, tx, hp), mesh)
    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3), jnp.float32)
    state, metrics = step(
        state, clips, tuple(jnp.asarray(m) for m in me), tuple(jnp.asarray(m) for m in mp)
    )
    assert np.isfinite(float(metrics["loss"]))
    # a qkv kernel is actually sharded over both fsdp and model axes
    leaf = state.params["encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert len(leaf.sharding.device_set) == 8 or leaf.sharding.is_fully_replicated is False


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
