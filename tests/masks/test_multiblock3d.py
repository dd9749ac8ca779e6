import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskCollator, MaskConfig, MaskGenerator


def make_gen(**kw):
    cfg = MaskConfig(
        spatial_scale=kw.pop("spatial_scale", (0.15, 0.15)),
        temporal_scale=kw.pop("temporal_scale", (1.0, 1.0)),
        aspect_ratio=kw.pop("aspect_ratio", (0.75, 1.5)),
        num_blocks=kw.pop("num_blocks", 8),
        **kw,
    )
    return MaskGenerator(cfg, crop_size=(256, 256), num_frames=16, spatial_patch_size=(16, 16), temporal_patch_size=2)


def test_static_shapes_across_steps():
    g = make_gen()
    shapes = set()
    for _ in range(5):
        g.step()
        e, p = g(batch_size=3)
        shapes.add((e.shape, p.shape))
    assert len(shapes) == 1  # jit-stable
    e, p = next(iter(shapes))
    assert e[0] == 3 and p[0] == 3
    assert e[1] == g.ctx_len and p[1] == g.pred_len


def test_disjoint_and_in_range():
    g = make_gen()
    g.step()
    e, p = g(batch_size=2)
    for b in range(2):
        es, ps = set(e[b].tolist()), set(p[b].tolist())
        assert not (es & ps), "context and prediction must be disjoint"
        assert max(es | ps) < g.num_tokens
        assert min(es | ps) >= 0
        assert len(es) == g.ctx_len  # context indices unique


def test_coverage_ratio_sane():
    # config 1 of the ViT-L pretrain yaml: 8 blocks @ 0.15 spatial.
    # Static lengths track the reference's batch-min-truncated statistic
    # (mean union is ~0.728, but the per-batch minimum the reference
    # actually trains on is ~0.52 at bs 8) — bound asserted precisely in
    # tests/masks/test_deviation_quantified.py.
    g = make_gen()
    frac = g.pred_len / g.num_tokens
    assert 0.4 < frac < 0.65


def test_seed_determinism():
    g1, g2 = make_gen(), make_gen()
    g1.step(), g2.step()
    e1, p1 = g1(2)
    e2, p2 = g2(2)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(p1, p2)
    # different steps -> different masks
    g1.step()
    e3, _ = g1(2)
    assert not np.array_equal(e1, e3)


def test_max_temporal_keep():
    g = make_gen(max_temporal_keep=0.5)
    g.step()
    e, _ = g(2)
    # context confined to the first half of the clip (duration 8 -> 4 frames)
    assert e.max() < 4 * 16 * 16


def test_collator_multi_config_multi_fpc():
    cfgs = [
        {"spatial_scale": (0.15, 0.15), "temporal_scale": (1.0, 1.0), "aspect_ratio": (0.75, 1.5), "num_blocks": 8},
        {"spatial_scale": (0.7, 0.7), "temporal_scale": (1.0, 1.0), "aspect_ratio": (0.75, 1.5), "num_blocks": 2},
    ]
    coll = MaskCollator(cfgs, dataset_fpcs=[16], crop_size=(256, 256))
    coll.step()
    enc, pred = coll(16, batch_size=4)
    assert len(enc) == 2 and len(pred) == 2
    assert enc[0].shape[0] == 4
    # config 2 covers more (91%) than config 1 (73%)
    assert pred[1].shape[1] > pred[0].shape[1]


def test_full_complement():
    g = make_gen(full_complement=True, num_blocks=2, spatial_scale=(0.7, 0.7))
    g.step()
    e, p = g(2)
    for b in range(2):
        assert set(e[b].tolist()) | set(p[b].tolist()) == set(range(g.num_tokens))
