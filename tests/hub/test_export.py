"""AOT serving export (`hub/export.py`): serialize -> reload -> call with
no model code in the loop, symbolic batch, numerics matching the live
module."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.hub import export as hx
from vjepa2_tpu.models.vision_transformer import vit_tiny


def _tiny():
    enc = vit_tiny(img_size=(32, 32), num_frames=2, tubelet_size=2,
                   use_rope=True)
    clips = jnp.zeros((1, 2, 32, 32, 3), jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)
    return enc, params


def test_export_roundtrip_symbolic_batch(tmp_path):
    enc, params = _tiny()
    out = hx.export_encoder(enc, params, str(tmp_path / "srv"), batch="B")
    assert os.path.exists(os.path.join(out, "encode.stablehlo"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["num_frames"] == 2 and meta["img_size"] == [32, 32]

    fn, _ = hx.load_encoder(out)
    rs = np.random.RandomState(0)
    for B in (1, 3):  # one artifact, multiple batch sizes
        clips = rs.rand(B, 2, 32, 32, 3).astype(np.float32)
        got = np.asarray(fn(clips))
        want = np.asarray(enc.apply(params, jnp.asarray(clips)))
        assert got.shape == want.shape == (B, 4, 192)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_export_fixed_batch(tmp_path):
    enc, params = _tiny()
    out = hx.export_encoder(enc, params, str(tmp_path / "srv2"), batch=2)
    fn, meta = hx.load_encoder(out)
    assert meta["batch"] == 2
    clips = np.zeros((2, 2, 32, 32, 3), np.float32)
    assert np.asarray(fn(clips)).shape == (2, 4, 192)


def test_preprocessor_stats():
    s = hx.export_preprocessor_stats()
    assert len(s["mean"]) == 3 and len(s["std"]) == 3


def test_export_world_model_roundtrip(tmp_path):
    """The planning stack (frame encode + CEM plan) serializes to two
    StableHLO programs and reproduces the live WorldModel exactly (same
    seed -> identical plan; no model code on the load path)."""
    from vjepa2_tpu.models.ac_predictor import VisionTransformerPredictorAC
    from vjepa2_tpu.planning.cem import CEMConfig
    from vjepa2_tpu.planning.world_model import WorldModel

    enc, enc_vars = _tiny()
    N, D = 4, 192  # 32/16=2 -> 2x2 tokens per 2-frame clip, vit_tiny width
    pred = VisionTransformerPredictorAC(
        img_size=(32, 32), patch_size=16, num_frames=2, tubelet_size=2,
        embed_dim=D, predictor_embed_dim=64, depth=1, num_heads=2,
        use_rope=True, dtype=jnp.float32)
    reps = jnp.zeros((1, N, D), jnp.float32)
    acts = jnp.zeros((1, 1, 7), jnp.float32)
    pred_params = jax.jit(pred.init)(
        jax.random.PRNGKey(1), reps, acts, acts)["params"]

    wm = WorldModel(
        enc, enc_vars["params"], pred, pred_params, tokens_per_frame=N,
        cem_config=CEMConfig(rollout=1, cem_steps=2, samples=8, topk=2))
    rs = np.random.RandomState(2)
    frame = rs.rand(32, 32, 3).astype(np.float32)
    rep = wm.encode(frame)
    goal = wm.encode(rs.rand(32, 32, 3).astype(np.float32))
    pose = np.zeros(7, np.float32)

    out = hx.export_world_model(wm, str(tmp_path / "wm"))
    assert os.path.exists(os.path.join(out, "plan.stablehlo"))
    swm = hx.load_world_model(out)

    got_rep = np.asarray(swm.encode(frame))
    np.testing.assert_allclose(got_rep, np.asarray(rep), atol=1e-5, rtol=1e-5)

    want_plan = np.asarray(wm.infer_next_action(
        rep, pose, goal, rng=jax.random.PRNGKey(7)))
    got_plan = swm.plan(got_rep, pose, np.asarray(goal), seed=7)
    assert got_plan.shape == (1, 7)
    np.testing.assert_allclose(got_plan, want_plan, atol=1e-5, rtol=1e-4)


def test_export_world_model_preprocessor(tmp_path):
    """A WorldModel built with the hub Preprocessor must serve raw frames
    identically: the export records the preprocessor in meta.json and
    ServingWorldModel.encode re-applies it host-side (it cannot ride the
    StableHLO program — resize input shapes are data-dependent)."""
    import pytest

    from vjepa2_tpu.hub.preprocessor import vjepa2_preprocessor
    from vjepa2_tpu.models.ac_predictor import VisionTransformerPredictorAC
    from vjepa2_tpu.planning.cem import CEMConfig
    from vjepa2_tpu.planning.world_model import WorldModel

    enc, enc_vars = _tiny()
    N, D = 4, 192
    pred = VisionTransformerPredictorAC(
        img_size=(32, 32), patch_size=16, num_frames=2, tubelet_size=2,
        embed_dim=D, predictor_embed_dim=64, depth=1, num_heads=2,
        use_rope=True, dtype=jnp.float32)
    reps = jnp.zeros((1, N, D), jnp.float32)
    acts = jnp.zeros((1, 1, 7), jnp.float32)
    pred_params = jax.jit(pred.init)(
        jax.random.PRNGKey(1), reps, acts, acts)["params"]

    wm = WorldModel(
        enc, enc_vars["params"], pred, pred_params, tokens_per_frame=N,
        preprocessor=vjepa2_preprocessor(crop_size=32),
        cem_config=CEMConfig(rollout=1, cem_steps=1, samples=4, topk=2))

    # raw camera frame: odd size, uint8 — the preprocessor's whole job
    raw = np.random.RandomState(3).randint(0, 255, (48, 40, 3), np.uint8)
    want = np.asarray(wm.encode(raw))

    out = hx.export_world_model(wm, str(tmp_path / "wmpp"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["frame_preprocessor"] == {"kind": "vjepa2", "crop_size": 32}
    swm = hx.load_world_model(out)
    np.testing.assert_allclose(np.asarray(swm.encode(raw)), want,
                               atol=1e-5, rtol=1e-5)

    # arbitrary callables cannot be reconstructed on the load side: refuse
    wm_bad = WorldModel(
        enc, enc_vars["params"], pred, pred_params, tokens_per_frame=N,
        preprocessor=lambda clip: clip,
        cem_config=CEMConfig(rollout=1, cem_steps=1, samples=4, topk=2))
    with pytest.raises(ValueError, match="preprocess frames host-side"):
        hx.export_world_model(wm_bad, str(tmp_path / "wmbad"))


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
