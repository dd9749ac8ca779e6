"""Native host-ops: parity with the numpy/cv2 path + a perf sanity check."""

import time

import numpy as np
import pytest

from vjepa2_tpu.data import native
from vjepa2_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, VideoTransform
from vjepa2_tpu.data.video import synthetic_clip

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_normalize_clip_parity():
    clip = synthetic_clip(4, 32, 48)
    out = native.normalize_clip(clip, IMAGENET_MEAN, IMAGENET_STD, num_threads=2)
    ref = (clip.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crop_resize_normalize_parity_with_cv2():
    cv2 = pytest.importorskip("cv2")
    clip = synthetic_clip(3, 64, 96)
    T = clip.shape[0]
    top, left, h, w = 5, 10, 48, 72
    S = 32
    boxes = tuple(np.full(T, v, np.int32) for v in (top, left, h, w))
    out = native.crop_resize_normalize_clip(
        clip, *boxes, S, IMAGENET_MEAN, IMAGENET_STD, hflip=False, num_threads=2
    )
    # cv2 reference path
    ref = []
    for t in range(T):
        c = clip[t, top : top + h, left : left + w]
        r = cv2.resize(c, (S, S), interpolation=cv2.INTER_LINEAR)
        ref.append((r.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)
    ref = np.stack(ref)
    np.testing.assert_allclose(out, ref, atol=5e-2)  # interp rounding differs slightly
    # cv2 uses fixed-point bilinear; agreement is sub-uint8-quantization
    # (0.005 normalized ~= 0.3 of one 1/255 level)
    assert np.abs(out - ref).mean() < 1e-2


def test_hflip():
    clip = synthetic_clip(2, 40, 40)
    boxes = tuple(np.full(2, v, np.int32) for v in (0, 0, 40, 40))
    a = native.crop_resize_normalize_clip(clip, *boxes, 40, IMAGENET_MEAN, IMAGENET_STD, hflip=False)
    b = native.crop_resize_normalize_clip(clip, *boxes, 40, IMAGENET_MEAN, IMAGENET_STD, hflip=True)
    np.testing.assert_allclose(a, b[:, :, ::-1], atol=1e-6)


def test_video_transform_native_path():
    clip = synthetic_clip(8, 72, 96)
    t_native = VideoTransform(crop_size=32, use_native=True)
    t_numpy = VideoTransform(crop_size=32, use_native=False)
    rng1, rng2 = np.random.default_rng(0), np.random.default_rng(0)
    a = t_native(clip, rng=rng1)
    b = t_numpy(clip, rng=rng2)
    assert a.shape == b.shape == (8, 32, 32, 3)
    assert np.abs(a - b).mean() < 5e-2  # same crop box; interp differences only


# -- native libav decoder (`native/video_decode.cpp`) ------------------------


@pytest.fixture(scope="module")
def sample_mp4(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vids") / "clip.mp4")
    clip = synthetic_clip(90, 120, 160, seed=7)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (160, 120))
    for f in clip:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()
    return path


decoder_skip = pytest.mark.skipif(
    not native.decoder_available(), reason="libav decoder not built"
)


@decoder_skip
def test_decoder_metadata(sample_mp4):
    d = native.NativeVideoDecoder(sample_mp4)
    assert d.num_frames == 90
    assert abs(d.fps - 30.0) < 0.5
    assert (d.height, d.width) == (120, 160)
    d.close()


@decoder_skip
def test_decoder_matches_cv2_bit_exact(sample_mp4):
    """Same libav code decodes underneath cv2, so frames must be identical."""
    pytest.importorskip("cv2")
    from vjepa2_tpu.data.video import VideoReader

    idx = [0, 2, 2, 17, 44, 89]
    a = VideoReader(sample_mp4, backend="native").get_batch(idx)
    b = VideoReader(sample_mp4, backend="cv2").get_batch(idx)
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def long_mp4(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("vids") / "long.mp4")
    clip = synthetic_clip(600, 64, 64, seed=11)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for f in clip:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()
    return path


@decoder_skip
def test_decoder_cold_start_far_seek(long_mp4):
    """FIRST access seeks mid-file (past the kSeekGapFrames=256 re-seek
    threshold): the decoder must land on the exact requested frames, not a
    keyframe-shifted neighborhood — the pts origin must come from the stream
    start, never from the post-seek landing frame."""
    pytest.importorskip("cv2")
    from vjepa2_tpu.data.video import VideoReader

    idx = [500, 501, 510]
    a = VideoReader(long_mp4, backend="native").get_batch(idx)
    b = VideoReader(long_mp4, backend="cv2").get_batch(idx)
    np.testing.assert_array_equal(a, b)
    # and a fresh decoder seeking BACKWARD after the far start
    d = native.NativeVideoDecoder(long_mp4)
    far = d.get_batch([400])
    near = d.get_batch([3])
    ref = VideoReader(long_mp4, backend="cv2").get_batch([400, 3])
    np.testing.assert_array_equal(far[0], ref[0])
    np.testing.assert_array_equal(near[0], ref[1])
    d.close()


@decoder_skip
def test_decoder_unsorted_and_reverse(sample_mp4):
    d = native.NativeVideoDecoder(sample_mp4)
    fwd = d.get_batch([5, 30, 60])
    rev = d.get_batch([60, 30, 5])  # forces a rewind seek mid-stream
    np.testing.assert_array_equal(fwd, rev[::-1])


@decoder_skip
def test_decoder_out_of_range_clamps(sample_mp4):
    d = native.NativeVideoDecoder(sample_mp4)
    out = d.get_batch([88, 89, 200, 500])
    np.testing.assert_array_equal(out[2], out[1])
    np.testing.assert_array_equal(out[3], out[1])


@decoder_skip
def test_decoder_is_default_backend(sample_mp4):
    from vjepa2_tpu.data.video import VideoReader

    vr = VideoReader(sample_mp4)
    assert vr.backend == "native"
    assert len(vr) == 90 and abs(vr.avg_fps - 30.0) < 0.5


@decoder_skip
def test_decoder_open_failure_raises():
    from vjepa2_tpu.data.video import VideoReadError, VideoReader

    with pytest.raises((RuntimeError, VideoReadError)):
        native.NativeVideoDecoder("/tmp/definitely_missing_video.mp4")
    import os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        f.write(b"not a video at all" * 10)
        f.flush()
        with pytest.raises(VideoReadError):
            VideoReader(f.name, backend="native").get_batch([0])


@decoder_skip
def test_decoder_reuse_after_eof_clamp(sample_mp4):
    """A batch that clamps at EOF leaves the codec in draining mode; the
    SAME decoder must then serve a later in-range batch (shard datasets
    reuse one reader across annotations — `epickitchens._decode_shard`),
    and an entirely-past-EOF batch must clamp to the last decodable frame
    (cv2 behavior on truncated/over-reported files) instead of erroring."""
    d = native.NativeVideoDecoder(sample_mp4)
    first = d.get_batch([85, 89, 120])  # clamps at EOF -> codec drains
    np.testing.assert_array_equal(first[2], first[1])

    ref = native.NativeVideoDecoder(sample_mp4)
    again = d.get_batch([87, 88])  # forward, within the seek gap
    np.testing.assert_array_equal(again, ref.get_batch([87, 88]))

    past = d.get_batch([300, 400])  # every index past EOF: clamp
    last = ref.get_batch([89])
    np.testing.assert_array_equal(past[0], last[0])
    np.testing.assert_array_equal(past[1], last[0])
    ref.close()
    d.close()


@decoder_skip
def test_decoder_fresh_open_entirely_past_eof(sample_mp4):
    d = native.NativeVideoDecoder(sample_mp4)
    out = d.get_batch([400])
    ref = native.NativeVideoDecoder(sample_mp4).get_batch([89])
    np.testing.assert_array_equal(out[0], ref[0])
    d.close()


@decoder_skip
def test_auto_backend_falls_back_per_file(sample_mp4, monkeypatch):
    """Auto backend selection must fall back to cv2 for a FILE the native
    decoder cannot open (system libav can lack codecs cv2's bundled ffmpeg
    has) instead of failing the sample."""
    pytest.importorskip("cv2")
    from vjepa2_tpu.data import native as nat
    from vjepa2_tpu.data import video as vid

    def boom(path, nthreads=0):
        raise RuntimeError("vd_open failed: synthetic codec gap")

    monkeypatch.setattr(nat, "NativeVideoDecoder", boom)
    vr = vid.VideoReader(sample_mp4)  # auto selection
    assert vr.backend == "cv2"
    assert vr.get_batch([0, 5]).shape == (2, 120, 160, 3)
    # explicit backend="native" must still surface the error
    with pytest.raises(vid.VideoReadError):
        vid.VideoReader(sample_mp4, backend="native")


def test_normalize_on_device_requires_normalize():
    with pytest.raises(ValueError, match="normalize_on_device"):
        VideoTransform(crop_size=32, normalize=False, normalize_on_device=True)
