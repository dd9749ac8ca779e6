"""End-to-end VideoClassificationEval on CPU: multi-clip features, probe
grid training, multi-view eval aggregation, probe checkpoint roundtrip."""

import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.evals.probes import ProbeConfig
from vjepa2_tpu.evals.video_classification import VideoClassificationEval
from vjepa2_tpu.models.vision_transformer import vit_tiny

import jax


def make_eval(tmp=None):
    S, T = 32, 4
    enc = vit_tiny(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    clips = jnp.ones((1, T, S, S, 3))
    ep = jax.jit(enc.init)(jax.random.PRNGKey(0), clips)["params"]
    ev = VideoClassificationEval(
        encoder=enc,
        enc_params=ep,
        num_classes=3,
        probe_configs=[ProbeConfig(lr=0.01, weight_decay=0.001)],
        num_heads=4,
        total_steps=40,
    )
    return ev, S, T


def synth_batch(B, nc, T, S, num_classes, seed):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size=B)
    clips = rng.normal(size=(B, nc, T, S, S, 3)).astype(np.float32) * 0.1
    clips += labels[:, None, None, None, None, None] / num_classes
    ci = np.tile(np.arange(T), (B, nc, 1))
    return clips, labels, ci


def test_video_eval_end_to_end(tmp_path):
    ev, S, T = make_eval()
    train = [synth_batch(8, 2, T, S, 3, i) for i in range(12)]
    val = [synth_batch(8, 2, T, S, 3, 100 + i) for i in range(2)]
    out = ev.run(train, val, epochs=2, probe_ckpt=str(tmp_path / "probes"))
    assert out["top1"] > 0.5, out

    # probe checkpoint restores into a fresh eval
    ev2, _, _ = make_eval()
    feats = ev2.features(val[0][0], val[0][2])
    ev2.restore_probes(str(tmp_path / "probes"), feats.shape[1:])
    out2 = ev2.run([], val, epochs=0)
    assert abs(out2["top1"] - out["top1"]) < 0.2


def test_multi_view_aggregation():
    ev, S, T = make_eval()
    clips, labels, ci = synth_batch(4, 2, T, S, 3, 0)
    ev.init_probes(ev.features(clips, ci).shape[1:])
    # 2 views stacked along the clip axis -> split and averaged
    two_view = np.concatenate([clips, clips], axis=1)  # [B, 2*nc, ...]
    c = ev.eval_batch(two_view, labels, ci, num_views=2)
    c1 = ev.eval_batch(clips, labels, ci, num_views=1)
    np.testing.assert_array_equal(c, c1)  # identical views -> same prediction


def test_temporal_pos_embed_path():
    from vjepa2_tpu.evals.wrappers import encode_clips

    ev, S, T = make_eval()
    clips, labels, ci = synth_batch(2, 2, T, S, 3, 0)
    # different clip frame offsets -> different temporal embeds
    ci2 = ci.copy()
    ci2[:, 1] += 40
    f1 = encode_clips(ev.encoder, ev.enc_params, jnp.asarray(clips), jnp.asarray(ci),
                      use_pos_embed=True)
    f2 = encode_clips(ev.encoder, ev.enc_params, jnp.asarray(clips), jnp.asarray(ci2),
                      use_pos_embed=True)
    n_per_clip = f1.shape[1] // 2
    # clip 0 unchanged, clip 1 differs
    np.testing.assert_allclose(np.asarray(f1[:, :n_per_clip]), np.asarray(f2[:, :n_per_clip]), atol=1e-6)
    assert np.abs(np.asarray(f1[:, n_per_clip:]) - np.asarray(f2[:, n_per_clip:])).max() > 1e-3


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
