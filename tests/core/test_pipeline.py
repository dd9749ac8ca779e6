"""Pipeline parallelism (core/pipeline.py): the GPipe schedule over the
mesh 'pipe' axis must match the plain sequential encoder bit-for-bit-ish
(fp32 tolerance), and the PP train step must reproduce the unsharded
step's loss and parameter update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vjepa2_tpu.core.mesh import MeshConfig, make_mesh
from vjepa2_tpu.core.pipeline import (
    from_pp_params,
    make_pp_encode,
    make_pp_train_step,
    merge_block_params,
    pp_wd_mask,
    shard_pp_state,
    split_block_params,
    to_pp_params,
)
from vjepa2_tpu.masks.multiblock3d import MaskCollator
from vjepa2_tpu.models.predictor import VisionTransformerPredictor
from vjepa2_tpu.models.vision_transformer import VisionTransformer
from vjepa2_tpu.train.pretrain import (
    PretrainHParams,
    init_params,
    make_optimizer,
    make_train_step,
    shard_state,
)
from vjepa2_tpu.train.state import TrainState

B, T, S, DEPTH = 8, 4, 32, 4


def _encoder(**kw):
    return VisionTransformer(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, depth=DEPTH, num_heads=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32, **kw)


def _mesh(pipe, model=1, fsdp=1):
    n = jax.device_count()
    return make_mesh(MeshConfig(data=n // (pipe * model * fsdp), fsdp=fsdp,
                                model=model, pipe=pipe),
                     devices=jax.devices()[:n])


@pytest.fixture(scope="module")
def setup():
    enc = _encoder()
    clips = jnp.asarray(np.random.RandomState(0).rand(B, T, S, S, 3),
                        jnp.float32)
    variables = jax.jit(lambda c: enc.init(jax.random.PRNGKey(0), c))(clips)
    return enc, clips, variables["params"]


def test_split_merge_roundtrip(setup):
    _, _, params = setup
    rest, stacked = split_block_params(params)
    assert jax.tree_util.tree_leaves(stacked)[0].shape[0] == DEPTH
    back = merge_block_params(rest, stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back)


@pytest.mark.parametrize("n_microbatch", [2, 4])
def test_pp_encode_matches_sequential_unmasked(setup, n_microbatch):
    enc, clips, params = setup
    mesh = _mesh(pipe=4)
    rest, stacked = split_block_params(params)
    encode = make_pp_encode(enc, mesh, n_microbatch=n_microbatch)
    ref = jax.jit(lambda p, c: enc.apply({"params": p}, c))(params, clips)
    out = jax.jit(lambda r, s, c: encode(r, s, c))(rest, stacked, clips)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_encode_matches_sequential_masked(setup):
    enc, clips, params = setup
    mesh = _mesh(pipe=4)
    rest, stacked = split_block_params(params)
    n_tok = (T // 2) * (S // 16) ** 2
    rs = np.random.RandomState(1)
    masks = jnp.asarray(
        np.stack([np.sort(rs.choice(n_tok, size=n_tok // 2, replace=False))
                  for _ in range(B)]), jnp.int32)
    encode = make_pp_encode(enc, mesh, n_microbatch=2)
    ref = jax.jit(lambda p, c, m: enc.apply({"params": p}, c, [m]))(
        params, clips, masks)
    out = jax.jit(lambda r, s, c, m: encode(r, s, c, [m]))(
        rest, stacked, clips, masks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_encode_gradients_match(setup):
    enc, clips, params = setup
    mesh = _mesh(pipe=4)
    rest, stacked = split_block_params(params)
    encode = make_pp_encode(enc, mesh, n_microbatch=2)

    def loss_ref(p, c):
        return (enc.apply({"params": p}, c) ** 2).mean()

    def loss_pp(rs_, c):
        r, s = rs_
        return (encode(r, s, c) ** 2).mean()

    g_ref = jax.jit(jax.grad(loss_ref))(params, clips)
    g_pp = jax.jit(jax.grad(loss_pp))((rest, stacked), clips)
    g_ref_rest, g_ref_stacked = split_block_params(g_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        (g_ref_rest, g_ref_stacked), (g_pp[0], g_pp[1]))


def test_pp_train_step_matches_unsharded():
    enc = _encoder()
    pred = VisionTransformerPredictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=64, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]
    coll = MaskCollator(cfgs, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    clips = jnp.asarray(np.random.RandomState(2).rand(B, T, S, S, 3),
                        jnp.float32)
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)

    params, target = init_params(enc, pred, 0, (B, T, S, S, 3), me[0], mp[0])

    # ---- unsharded reference step
    tx = make_optimizer(hp)
    st_ref = TrainState.create(params, target, tx)
    step_ref = jax.jit(make_train_step(enc, pred, tx, hp))
    st_ref, m_ref = step_ref(st_ref, clips, me, mp)

    # ---- pipelined step on a pipe=4 x data=2 mesh
    mesh = _mesh(pipe=4)
    pp_params, pp_target = to_pp_params(params, target)
    tx_pp = make_optimizer(hp, mask=pp_wd_mask)
    st_pp = TrainState.create(pp_params, pp_target, tx_pp)
    st_pp = shard_pp_state(st_pp, mesh)
    step_pp = jax.jit(
        make_pp_train_step(enc, pred, tx_pp, hp, mesh, n_microbatch=2))
    st_pp, m_pp = step_pp(st_pp, clips, me, mp)

    assert np.isfinite(float(m_pp["loss"]))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-4)

    # updated params agree leaf-for-leaf after unstacking
    up_params, up_target = from_pp_params(st_pp.params, st_pp.target_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        up_params, st_ref.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        up_target, st_ref.target_params)


def test_pp_train_step_with_grad_accum_matches_fullbatch():
    """grad_accum composes with the GPipe schedule: two accumulation
    microbatches, each running the full pipeline pass, must reproduce the
    unsharded full-batch update (loss is a mean over equal microbatches;
    every per-sample computation is independent)."""
    enc = _encoder()
    pred = VisionTransformerPredictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=64, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]
    coll = MaskCollator(cfgs, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    clips = jnp.asarray(np.random.RandomState(3).rand(B, T, S, S, 3),
                        jnp.float32)
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)

    params, target = init_params(enc, pred, 0, (B, T, S, S, 3), me[0], mp[0])

    # ---- unsharded full-batch reference step
    tx = make_optimizer(hp)
    st_ref = TrainState.create(params, target, tx)
    step_ref = jax.jit(make_train_step(enc, pred, tx, hp))
    st_ref, m_ref = step_ref(st_ref, clips, me, mp)

    # ---- pipelined step with grad_accum=2 on a pipe=4 x data=2 mesh
    mesh = _mesh(pipe=4)
    pp_params, pp_target = to_pp_params(params, target)
    tx_pp = make_optimizer(hp, mask=pp_wd_mask)
    st_pp = TrainState.create(pp_params, pp_target, tx_pp)
    st_pp = shard_pp_state(st_pp, mesh)
    step_pp = jax.jit(make_pp_train_step(
        enc, pred, tx_pp, hp, mesh, n_microbatch=2, grad_accum=2))
    a, b = 2, B // 2
    clips2 = clips.reshape(a, b, T, S, S, 3)
    me2 = tuple(m.reshape(a, b, -1) for m in me)
    mp2 = tuple(m.reshape(a, b, -1) for m in mp)
    st_pp, m_pp = step_pp(st_pp, clips2, me2, mp2)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    up_params, up_target = from_pp_params(st_pp.params, st_pp.target_params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6),
        up_params, st_ref.params)


def test_pp_train_step_with_tensor_parallel():
    """Megatron-style TP composes INSIDE pipeline stages: stacked qkv/mlp
    kernels shard over 'model' (col/row-parallel) while the schedule stays
    manual over 'pipe' only. The step must match the unsharded update."""
    enc = _encoder()
    pred = VisionTransformerPredictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=64, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]
    coll = MaskCollator(cfgs, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    clips = jnp.asarray(np.random.RandomState(5).rand(B, T, S, S, 3),
                        jnp.float32)
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)
    params, target = init_params(enc, pred, 0, (B, T, S, S, 3), me[0], mp[0])

    tx = make_optimizer(hp)
    st_ref = TrainState.create(params, target, tx)
    step_ref = jax.jit(make_train_step(enc, pred, tx, hp))
    st_ref, m_ref = step_ref(st_ref, clips, me, mp)

    mesh = _mesh(pipe=2, model=2)  # pipe=2 x data=2 x model=2
    pp_params, pp_target = to_pp_params(params, target)
    tx_pp = make_optimizer(hp, mask=pp_wd_mask)
    st_pp = TrainState.create(pp_params, pp_target, tx_pp)
    st_pp = shard_pp_state(st_pp, mesh)
    # the stacked qkv kernel actually carries the 'model' axis
    qkv = st_pp.params["encoder_blocks"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec), qkv.sharding.spec
    step_pp = jax.jit(
        make_pp_train_step(enc, pred, tx_pp, hp, mesh, n_microbatch=2))
    st_pp, m_pp = step_pp(st_pp, clips, me, mp)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-5)
    # TP's model-axis all-reduce changes the fp32 reduction order, and
    # Adam's per-parameter normalization amplifies the ~1e-7 grad diffs to
    # ~1e-5 on the updated params (measured; loss/grad_norm match to 1e-7)
    up_params, _ = from_pp_params(st_pp.params, st_pp.target_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-3),
        up_params, st_ref.params)


def test_pp_train_step_all_four_axes():
    """The full mesh: pipe=2 x model=2 x fsdp=2 x data=1 in one program —
    GPipe schedule manual over 'pipe', Megatron TP + ZeRO param sharding
    auto inside each stage. Update equals the unsharded step."""
    enc = _encoder()
    pred = VisionTransformerPredictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=64, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]
    coll = MaskCollator(cfgs, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(m) for m in me)
    mp = tuple(jnp.asarray(m) for m in mp)
    clips = jnp.asarray(np.random.RandomState(7).rand(B, T, S, S, 3),
                        jnp.float32)
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)
    params, target = init_params(enc, pred, 0, (B, T, S, S, 3), me[0], mp[0])

    tx = make_optimizer(hp)
    st_ref = TrainState.create(params, target, tx)
    step_ref = jax.jit(make_train_step(enc, pred, tx, hp))
    st_ref, m_ref = step_ref(st_ref, clips, me, mp)

    mesh = _mesh(pipe=2, model=2, fsdp=2)
    pp_params, pp_target = to_pp_params(params, target)
    tx_pp = make_optimizer(hp, mask=pp_wd_mask)
    st_pp = TrainState.create(pp_params, pp_target, tx_pp)
    st_pp = shard_pp_state(st_pp, mesh)
    qkv = st_pp.params["encoder_blocks"]["attn"]["qkv"]["kernel"]
    spec = str(qkv.sharding.spec)
    assert "model" in spec and "fsdp" in spec, spec
    step_pp = jax.jit(
        make_pp_train_step(enc, pred, tx_pp, hp, mesh, n_microbatch=2))
    st_pp, m_pp = step_pp(st_pp, clips, me, mp)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-5)
    up_params, _ = from_pp_params(st_pp.params, st_pp.target_params)
    # same measured Adam-amplified reduction-order tolerance as the TP test
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-3),
        up_params, st_ref.params)


def test_pp_multifpc_step_matches_unsharded():
    """Within-step multi-fpc semantics compose with the pipeline: every
    bucket's encoder forwards run the GPipe schedule, and the update matches
    the plain multifpc step."""
    from vjepa2_tpu.train.pretrain import make_multifpc_train_step

    enc = _encoder()
    pred = VisionTransformerPredictor(
        img_size=(S, S), patch_size=16, num_frames=T, tubelet_size=2,
        embed_dim=64, predictor_embed_dim=64, depth=2, num_heads=2,
        use_mask_tokens=True, num_mask_tokens=2, use_rope=True,
        uniform_power=True, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (0.75, 1.5), "num_blocks": 2}]
    coll = MaskCollator(cfgs, dataset_fpcs=[2, T], crop_size=(S, S))
    coll.step()
    me2, mp2 = coll(2, B)
    me4, mp4 = coll(T, B)
    as_j = lambda t: tuple(jnp.asarray(m) for m in t)  # noqa: E731
    me_tup = (as_j(me2), as_j(me4))
    mp_tup = (as_j(mp2), as_j(mp4))
    rs = np.random.RandomState(4)
    clips_tup = (jnp.asarray(rs.rand(B, 2, S, S, 3), jnp.float32),
                 jnp.asarray(rs.rand(B, T, S, S, 3), jnp.float32))
    hp = PretrainHParams(epochs=1, ipe=10, warmup_epochs=0)
    params, target = init_params(
        enc, pred, 0, (B, T, S, S, 3), me_tup[1][0], mp_tup[1][0])

    # ---- unsharded multifpc reference step
    tx = make_optimizer(hp)
    st_ref = TrainState.create(params, target, tx)
    step_ref = jax.jit(make_multifpc_train_step(enc, pred, tx, hp,
                                                num_mask_cfgs=1))
    st_ref, m_ref = step_ref(st_ref, clips_tup, me_tup, mp_tup)

    # ---- pipelined multifpc step on a pipe=4 x data=2 mesh
    mesh = _mesh(pipe=4)
    pp_params, pp_target = to_pp_params(params, target)
    tx_pp = make_optimizer(hp, mask=pp_wd_mask)
    st_pp = TrainState.create(pp_params, pp_target, tx_pp)
    st_pp = shard_pp_state(st_pp, mesh)
    step_pp = jax.jit(make_multifpc_train_step(
        enc, pred, tx_pp, hp, num_mask_cfgs=1,
        pp_mesh=mesh, pp_microbatches=2))
    st_pp, m_pp = step_pp(st_pp, clips_tup, me_tup, mp_tup)

    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    up_params, _ = from_pp_params(st_pp.params, st_pp.target_params)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6),
        up_params, st_ref.params)


def test_pp_wd_mask_matches_reference_rule():
    """Stacked-bias leaves (ndim 2 after stacking) must NOT get weight decay;
    stacked kernels (ndim >= 3) must."""
    params = {
        "encoder": {"norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
                    "patch_embed": {"proj": {"kernel": jnp.ones((4, 8))}}},
        "encoder_blocks": {"norm1": {"bias": jnp.zeros((DEPTH, 8))},
                           "attn": {"qkv": {"kernel": jnp.ones((DEPTH, 8, 24))}}},
    }
    m = pp_wd_mask(params)
    assert m["encoder"]["patch_embed"]["proj"]["kernel"] is True
    assert m["encoder"]["norm"]["scale"] is False
    assert m["encoder_blocks"]["norm1"]["bias"] is False
    assert m["encoder_blocks"]["attn"]["qkv"]["kernel"] is True


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
