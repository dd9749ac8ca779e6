"""Deferred device-side normalization (`VideoTransform(normalize_on_device)`
-> uint8 collate/H2D -> `_device_normalize` inside the jit step).

The host path computes crop+bilinear-resize in fp32 then normalizes; the
deferred path rounds the resize output to uint8 (as torchvision's uint8
resize in the reference does) and normalizes on device — so outputs may
differ by at most 0.5/255 per channel pre-normalization."""

import numpy as np
import pytest

from vjepa2_tpu.data import native
from vjepa2_tpu.data.transforms import (IMAGENET_MEAN, IMAGENET_STD,
                                        VideoTransform)


def _clip(seed=0, t=4, h=80, w=96):
    return np.random.RandomState(seed).randint(0, 255, (t, h, w, 3), np.uint8)


@pytest.mark.parametrize("use_native", [True, False])
def test_u8_transform_matches_float_path(use_native):
    if use_native and not native.supports_u8():
        pytest.skip("native u8 op not built")
    clip = _clip()
    tol = 0.5 / 255 / IMAGENET_STD.min() + 1e-6
    for seed in range(3):
        tf = VideoTransform(crop_size=64, use_native=use_native,
                            horizontal_flip=True)
        tu = VideoTransform(crop_size=64, use_native=use_native,
                            horizontal_flip=True, normalize_on_device=True)
        rng_f = np.random.default_rng(seed)
        rng_u = np.random.default_rng(seed)
        out_f = tf(clip, rng=rng_f)
        out_u = tu(clip, rng=rng_u)
        assert out_u.dtype == np.uint8 and out_f.dtype == np.float32
        assert out_u.shape == out_f.shape == (4, 64, 64, 3)
        # device-side formula applied on host for the comparison
        norm_u = (out_u.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(norm_u, out_f, atol=tol)


def test_float_input_clip_normalizes_on_host_and_once():
    """A float [0,1] input clip (uint8 round-trips through color_jitter, but a
    float-emitting dataset or aug can produce one) must (a) NOT be rescaled
    by 255 a second time in the tail, and (b) be normalized on the HOST even
    under normalize_on_device — the device step only normalizes uint8 clips,
    so passing the float through would silently train on un-normalized
    pixels."""
    clip = _clip().astype(np.float32) / 255.0
    tu = VideoTransform(crop_size=64, normalize_on_device=True)
    out = tu(clip, rng=np.random.default_rng(0))
    assert out.dtype == np.float32
    # normalized range, not [0,1]: min well below -0.5 for imagenet stats
    assert out.min() < -0.5, out.min()

    tf = VideoTransform(crop_size=64)
    out_f = tf(clip, rng=np.random.default_rng(0))
    # if the tail divided a [0,1] float clip by 255 again, values collapse
    # toward (0 - mean)/std ~ [-2.1, -1.8] with std ~ 0.01
    assert out_f.std() > 0.3, out_f.std()
    np.testing.assert_allclose(out, out_f, atol=1e-6)


def test_native_u8_matches_numpy_u8():
    """The C++ u8 kernel agrees with the numpy fallback bit-for-bit up to
    bilinear rounding (<= 1 LSB)."""
    if not native.supports_u8():
        pytest.skip("native u8 op not built")
    clip = _clip(seed=3)
    for seed in range(3):
        tn = VideoTransform(crop_size=64, use_native=True,
                            normalize_on_device=True)
        tp = VideoTransform(crop_size=64, use_native=False,
                            normalize_on_device=True)
        a = tn(clip, rng=np.random.default_rng(seed))
        b = tp(clip, rng=np.random.default_rng(seed))
        assert a.dtype == b.dtype == np.uint8
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        # cv2's fixed-point bilinear and the C++ float bilinear round ties
        # differently on ~12% of pixels — but never disagree by more than
        # one count
        assert diff.max() <= 1, diff.max()
        assert diff.mean() < 0.2


def test_device_normalize_in_train_step():
    """A uint8-fed train step runs and matches the float-fed step's loss."""
    import jax
    import jax.numpy as jnp

    from vjepa2_tpu.masks.multiblock3d import MaskCollator
    from vjepa2_tpu.train.pretrain import (PretrainHParams, build_models,
                                           init_params, make_optimizer,
                                           make_train_step)
    from vjepa2_tpu.train.state import TrainState

    B, T, S = 2, 4, 64
    encoder, predictor = build_models(
        model_name="vit_tiny", crop_size=S, num_frames=T, pred_depth=2,
        pred_embed_dim=64, pred_num_heads=2, use_rope=True,
        num_mask_tokens=1, dtype=jnp.float32)
    cfgs = [{"spatial_scale": (0.4, 0.4), "temporal_scale": (1.0, 1.0),
             "aspect_ratio": (1.0, 1.0), "num_blocks": 1}]
    coll = MaskCollator(cfgs, dataset_fpcs=[T], crop_size=(S, S))
    coll.step()
    me, mp = coll(T, B)
    me = tuple(jnp.asarray(x) for x in me)
    mp = tuple(jnp.asarray(x) for x in mp)
    hp = PretrainHParams(ipe=4, epochs=1)
    tx = make_optimizer(hp)
    params, target = init_params(encoder, predictor, 0, (B, T, S, S, 3),
                                 me[0], mp[0])

    u8 = _clip(seed=1, t=T, h=S, w=S)[None].repeat(B, axis=0).reshape(B, T, S, S, 3)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    norm = (IMAGENET_MEAN, IMAGENET_STD)
    step_u8 = jax.jit(make_train_step(encoder, predictor, tx, hp,
                                      norm_stats=norm))
    step_f = jax.jit(make_train_step(encoder, predictor, tx, hp))

    s1 = TrainState.create(params, target, tx)
    s2 = TrainState.create(params, target, tx)
    _, m_u8 = step_u8(s1, jnp.asarray(u8), me, mp)
    _, m_f = step_f(s2, jnp.asarray(f32, jnp.float32), me, mp)
    assert np.isfinite(float(m_u8["loss"]))
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f["loss"]),
                               rtol=1e-5, atol=1e-6)


def test_pretrainer_end_to_end_u8(tmp_path):
    """Full Pretrainer epoch on real mp4s with normalize_on_device=True."""
    import cv2

    from vjepa2_tpu.core.config import PretrainConfig
    from vjepa2_tpu.train.loop import Pretrainer

    S, T, B = 64, 4, 8  # batch divisible by the 8-virtual-device test mesh
    man = tmp_path / "train.csv"
    with open(man, "w") as f:
        for i in range(4):
            p = str(tmp_path / f"v{i}.mp4")
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (S, S))
            rs = np.random.RandomState(i)
            base = rs.randint(0, 255, (S, S, 3), np.uint8)
            for t in range(T * 4):
                w.write(np.roll(base, 3 * t, axis=1))
            w.release()
            f.write(f"{p} 0\n")
    cfg = PretrainConfig.from_dict({
        "folder": str(tmp_path / "out"),
        "data": {"datasets": [str(man)], "batch_size": B, "crop_size": S,
                 "dataset_fpcs": [T], "num_workers": 0,
                 "normalize_on_device": True},
        "mask": [{"spatial_scale": (0.4, 0.4), "temporal_scale": (1.0, 1.0),
                  "aspect_ratio": (1.0, 1.0), "num_blocks": 1}],
        "meta": {"dtype": "float32", "seed": 0, "load_checkpoint": False},
        "model": {"model_name": "vit_tiny", "pred_depth": 2,
                  "pred_embed_dim": 64, "pred_num_heads": 2,
                  "use_rope": True, "use_mask_tokens": True},
        "optimization": {"epochs": 1, "ipe": 3, "warmup": 0, "lr": 1e-3,
                         "start_lr": 1e-4, "final_lr": 1e-5,
                         "weight_decay": 0.04, "final_weight_decay": 0.4},
    })
    result = Pretrainer(cfg).run(epochs=1, log_every=1)
    assert np.isfinite(result["loss"])


def test_u8_survives_worker_ipc(tmp_path):
    """uint8 clips stay uint8 through spawn-worker IPC and collate."""
    import cv2

    from vjepa2_tpu.data.manager import init_video_data
    from vjepa2_tpu.data.transforms import VideoTransform

    S, T = 64, 4
    man = tmp_path / "t.csv"
    with open(man, "w") as f:
        for i in range(4):
            p = str(tmp_path / f"v{i}.mp4")
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (S, S))
            for t in range(T * 4):
                w.write(np.full((S, S, 3), (10 * i + t) % 255, np.uint8))
            w.release()
            f.write(f"{p} 0\n")
    tf = VideoTransform(crop_size=S, normalize_on_device=True)
    _, loader, _ = init_video_data(
        data_paths=[str(man)], batch_size=2, transform=tf,
        dataset_fpcs=[T], fps=4, num_workers=2, ipe=2)
    batches = list(loader)
    assert batches, "loader yielded nothing"
    clips = np.asarray(batches[0][0][0])
    assert clips.dtype == np.uint8
    assert clips.shape == (2, T, S, S, 3)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
