import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.evals.action_anticipation import (
    ClassMeanRecall,
    MultiHeadAttentiveClassifier,
    anticipative_features,
    sigmoid_focal_loss,
)
from vjepa2_tpu.models.predictor import vit_predictor
from vjepa2_tpu.models.vision_transformer import vit_tiny


def test_focal_loss_basic():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    good = sigmoid_focal_loss(logits, jnp.asarray([0, 1]))
    bad = sigmoid_focal_loss(logits, jnp.asarray([1, 0]))
    assert float(good) < float(bad)


def test_class_mean_recall():
    m = ClassMeanRecall(num_classes=4, k=1)
    logits = np.eye(4)[[0, 1, 2, 3]]  # perfect
    m.update(logits, np.arange(4))
    out = m.compute()
    assert abs(out["recall"] - 100.0) < 1e-3 and out["accuracy"] == 100.0
    m2 = ClassMeanRecall(num_classes=4, k=1)
    m2.update(logits, np.asarray([1, 0, 3, 2]))  # all wrong
    out2 = m2.compute()
    assert out2["recall"] == 0.0


def test_multihead_classifier_shapes():
    m = MultiHeadAttentiveClassifier(embed_dim=32, num_heads=4, num_verbs=5, num_nouns=7, num_actions=9)
    x = jnp.ones((2, 10, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    v, n, a = m.apply(params, x)
    assert v.shape == (2, 5) and n.shape == (2, 7) and a.shape == (2, 9)


def test_anticipative_features():
    S, T = 32, 4
    enc = vit_tiny(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    pred = vit_predictor(
        img_size=(S, S), num_frames=T, tubelet_size=2, embed_dim=192,
        predictor_embed_dim=64, depth=1, num_heads=2, use_mask_tokens=True,
        num_mask_tokens=1, use_rope=True,
    )
    clips = jnp.ones((2, T, S, S, 3))
    ep = enc.init(jax.random.PRNGKey(0), clips)["params"]
    N = 2 * 2 * 2  # t' * h' * w'
    hp_, wp_ = 2, 2
    x = enc.apply({"params": ep}, clips)
    pp = pred.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2, N), jnp.int32), jnp.zeros((2, 4), jnp.int32), 0
    )["params"]
    feats = anticipative_features(
        enc, ep, pred, pp, clips,
        anticipation_times=jnp.asarray([1.0, 2.0]),
        frames_per_second=2.0, tubelet_size=2, grid_size=2,
        num_output_frames=2, num_steps=2, h_patches=hp_, w_patches=wp_,
    )
    n_pred = 4  # grid 2x2, one tubelet-frame
    assert feats.shape == (2, N + 2 * n_pred, 192)


def test_anticipation_eval_runner():
    from vjepa2_tpu.evals.action_anticipation import AnticipationEval

    S, T = 32, 4
    enc = vit_tiny(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    pred = vit_predictor(
        img_size=(S, S), num_frames=T, tubelet_size=2, embed_dim=192,
        predictor_embed_dim=64, depth=1, num_heads=2, use_mask_tokens=True,
        num_mask_tokens=1, use_rope=True,
    )
    clips = jnp.ones((2, T, S, S, 3))
    ep = enc.init(jax.random.PRNGKey(0), clips)["params"]
    x = enc.apply({"params": ep}, clips)
    N = x.shape[1]
    pp = pred.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2, N), jnp.int32), jnp.zeros((2, 4), jnp.int32), 0
    )["params"]

    ev = AnticipationEval(
        enc, ep, pred, pp, num_verbs=3, num_nouns=4, num_actions=5,
        frames_per_second=2.0, grid_size=2, h_patches=2, w_patches=2,
        num_heads=4, lr=5e-3,
    )
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 3, size=8)
    clips_b = (np.ones((8, T, S, S, 3)) * labels[:, None, None, None, None] / 3).astype(np.float32)
    at = np.ones(8, np.float32)
    for _ in range(10):
        loss = ev.train_batch(clips_b, at, labels, labels, labels)
    assert np.isfinite(loss)
    loader = [(clips_b, at, labels, labels, labels)]
    out = ev.evaluate(loader, k=1)
    assert {"verb", "noun", "action"} <= set(out)
    assert out["verb"]["recall"] > 50  # separable synthetic labels


def _tiny_eval(probe_configs, seed=0, total_steps=40):
    from vjepa2_tpu.evals.action_anticipation import AnticipationEval

    S, T = 32, 4
    enc = vit_tiny(img_size=(S, S), num_frames=T, tubelet_size=2, use_rope=True)
    pred = vit_predictor(
        img_size=(S, S), num_frames=T, tubelet_size=2, embed_dim=192,
        predictor_embed_dim=64, depth=1, num_heads=2, use_mask_tokens=True,
        num_mask_tokens=1, use_rope=True,
    )
    clips = jnp.ones((2, T, S, S, 3))
    ep = enc.init(jax.random.PRNGKey(0), clips)["params"]
    x = enc.apply({"params": ep}, clips)
    N = x.shape[1]
    pp = pred.init(
        jax.random.PRNGKey(1), x, jnp.zeros((2, N), jnp.int32), jnp.zeros((2, 4), jnp.int32), 0
    )["params"]
    return AnticipationEval(
        enc, ep, pred, pp, num_verbs=3, num_nouns=4, num_actions=5,
        frames_per_second=2.0, grid_size=2, h_patches=2, w_patches=2,
        num_heads=4, probe_configs=probe_configs, total_steps=total_steps,
        seed=seed,
    ), (S, T)


def test_anticipation_probe_grid_max_beats_first_entry(tmp_path):
    """Grid training: a dead-lr first entry loses to a real-lr second entry,
    so reporting grid max (reference `eval.py:705-725`) beats reporting the
    first probe; a val-only rerun from the probe checkpoint reproduces the
    recall (reference `eval.py:292-308`)."""
    from vjepa2_tpu.evals.probes import ProbeConfig

    probes = [
        ProbeConfig(lr=1e-9, weight_decay=0.0),  # frozen: stays at init
        ProbeConfig(lr=5e-3, weight_decay=0.0),  # actually learns
    ]
    ev, (S, T) = _tiny_eval(probes)
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 3, size=8)
    clips_b = (np.ones((8, T, S, S, 3)) * labels[:, None, None, None, None] / 3).astype(np.float32)
    at = np.ones(8, np.float32)
    for _ in range(15):
        ev.train_batch(clips_b, at, labels, labels, labels)
    loader = [(clips_b, at, labels, labels, labels)]
    out = ev.evaluate(loader, k=1)
    per_probe = out["per_probe"]["verb"]
    assert out["verb"]["recall"] == max(d["recall"] for d in per_probe)
    # the trained probe must beat the dead-lr first entry
    assert per_probe[1]["recall"] > per_probe[0]["recall"]
    assert out["best_probe"]["verb"] == 1

    # -- probe checkpoint round trip: fresh runner, restore, same recall
    ckpt = str(tmp_path / "probes")
    ev.save_probes(ckpt)
    ev2, _ = _tiny_eval(probes, seed=123)  # different init seed
    ev2.restore_probes(ckpt, ev2.features_for(clips_b[:1], at[:1]))
    out2 = ev2.evaluate(loader, k=1)
    assert out2["verb"]["recall"] == out["verb"]["recall"]
    assert out2["per_probe"] == out["per_probe"]


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
