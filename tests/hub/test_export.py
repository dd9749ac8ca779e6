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
