"""Quantified bounds on the two deliberate TPU-first deviations from the
reference sampler (VERDICT r1 #10), so probe-parity debugging can exclude
this axis:

1. **Static mask lengths** vs the reference's per-batch-min truncation
   (`src/masks/multiseq_multiblock3d.py:211-215`): over many steps, our
   fixed (ctx_len, pred_len) must match the reference's mean truncated
   counts within a stated tolerance, and the per-frame coverage profile of
   predicted tokens must match.
2. **Upstream fpc bucketing** (`data/loader.py:FpcBucketSampler`) vs the
   reference's within-step multi-fpc sub-batches: bucket-emission
   frequencies must match the underlying sampling mass.

Tolerances (documented contract):
  * mean token-count fraction: |ours - ref| <= 0.06 absolute (6% of tokens)
  * per-frame pred-coverage profile: max abs diff <= 0.12
  * fpc draw frequency: within 4 sigma of the binomial expectation
"""

import math

import numpy as np

from vjepa2_tpu.masks.multiblock3d import MaskConfig, MaskGenerator

# the two pretrain mask configs (configs/train/*/pretrain-256px-16f.yaml)
CFG_SHORT = dict(spatial_scale=(0.15, 0.15), temporal_scale=(1.0, 1.0),
                 aspect_ratio=(0.75, 1.5), num_blocks=8)
CFG_LONG = dict(spatial_scale=(0.7, 0.7), temporal_scale=(1.0, 1.0),
                aspect_ratio=(0.75, 1.5), num_blocks=2)

H = W = 8   # 128px / 16
D = 8       # 16 frames / tubelet 2
N = D * H * W


class ReferenceSampler:
    """Numpy transcription of reference `_MaskGenerator.__call__`
    (`multiseq_multiblock3d.py:129-239`): shared per-step block size,
    unioned zero-blocks, per-batch-min truncation of both index lists."""

    def __init__(self, cfg: dict, seed=0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def _block_size(self):
        c = self.cfg
        t = max(1, int(D * (c["temporal_scale"][0] + self.rng.random()
                            * (c["temporal_scale"][1] - c["temporal_scale"][0]))))
        keep = int(H * W * (c["spatial_scale"][0] + self.rng.random()
                            * (c["spatial_scale"][1] - c["spatial_scale"][0])))
        ar = c["aspect_ratio"][0] + self.rng.random() * (c["aspect_ratio"][1] - c["aspect_ratio"][0])
        h = min(int(round(math.sqrt(keep * ar))), H)
        w = min(int(round(math.sqrt(keep / ar))), W)
        return t, h, w

    def __call__(self, batch_size):
        t, h, w = self._block_size()
        encs, preds = [], []
        min_e = min_p = N
        for _ in range(batch_size):
            while True:
                mask = np.ones((D, H, W), bool)  # 1 = context
                for _ in range(self.cfg["num_blocks"]):
                    top = self.rng.integers(0, H - h + 1)
                    left = self.rng.integers(0, W - w + 1)
                    start = self.rng.integers(0, D - t + 1)
                    mask[start:start + t, top:top + h, left:left + w] = False
                flat = mask.reshape(-1)
                e = np.flatnonzero(flat)
                p = np.flatnonzero(~flat)
                if len(e):
                    break
            min_e, min_p = min(min_e, len(e)), min(min_p, len(p))
            encs.append(e)
            preds.append(p)
        encs = np.stack([e[:min_e] for e in encs])
        preds = np.stack([p[:min_p] for p in preds])
        return encs, preds


def _profiles(cfg_dict, steps=200, bs=8, seed=0):
    ref = ReferenceSampler(cfg_dict, seed=seed)
    ours = MaskGenerator(
        MaskConfig.from_dict(cfg_dict), crop_size=(128, 128), num_frames=16,
        spatial_patch_size=(16, 16), temporal_patch_size=2, seed=seed,
    )
    ref_counts, ref_cov = [], np.zeros(N)
    our_cov = np.zeros(N)
    ref_n = our_n = 0
    for s in range(steps):
        e, p = ref(bs)
        ref_counts.append((e.shape[1], p.shape[1]))
        np.add.at(ref_cov, p.reshape(-1), 1.0)
        ref_n += p.size
        ours.step()
        e2, p2 = ours(bs)
        np.add.at(our_cov, p2.reshape(-1), 1.0)
        our_n += p2.size
    ref_counts = np.asarray(ref_counts, float)
    return ref_counts, ref_cov / ref_n, our_cov / our_n, ours


def test_static_lengths_match_reference_mean_counts():
    for cfg in (CFG_SHORT, CFG_LONG):
        ref_counts, _, _, ours = _profiles(cfg)
        ref_ctx_frac = ref_counts[:, 0].mean() / N
        ref_pred_frac = ref_counts[:, 1].mean() / N
        assert abs(ours.ctx_len / N - ref_ctx_frac) <= 0.06, (
            cfg, ours.ctx_len / N, ref_ctx_frac)
        assert abs(ours.pred_len / N - ref_pred_frac) <= 0.06, (
            cfg, ours.pred_len / N, ref_pred_frac)


def test_pred_coverage_profile_matches():
    """Predicted-token probability, aggregated per frame (the axis where the
    forced-coverage / truncation differences would show)."""
    for cfg in (CFG_SHORT, CFG_LONG):
        _, ref_cov, our_cov, _ = _profiles(cfg, steps=300)
        ref_frame = ref_cov.reshape(D, H * W).sum(1)
        our_frame = our_cov.reshape(D, H * W).sum(1)
        assert np.max(np.abs(ref_frame - our_frame)) <= 0.12, (
            cfg, ref_frame, our_frame)
        # spatial profile too (center-bias of block placement must match)
        ref_sp = ref_cov.reshape(D, H * W).sum(0)
        our_sp = our_cov.reshape(D, H * W).sum(0)
        assert np.max(np.abs(ref_sp - our_sp)) <= 0.12


def test_fpc_bucket_frequencies_match_sampling_mass():
    """FpcBucketSampler emits fpc-F batches at F's sampling mass (the
    reference instead mixes fpcs within a step; equal mass either way)."""
    from vjepa2_tpu.data.loader import FpcBucketSampler

    rng = np.random.default_rng(0)
    # dataset: 1000 samples fpc=16 (weight .75), 1000 fpc=8 (weight .25)
    fpc_of = lambda i: 16 if i < 1000 else 8
    probs = np.concatenate([np.full(1000, 0.75 / 1000), np.full(1000, 0.25 / 1000)])

    def infinite_sampler():
        while True:
            yield int(rng.choice(2000, p=probs))

    bs = 8
    sampler = FpcBucketSampler(infinite_sampler(), fpc_of, bs)
    draws = []
    it = iter(sampler)
    n_batches = 600
    for _ in range(n_batches):
        batch = next(it)
        fpcs = {fpc_of(i) for i in batch}
        assert len(fpcs) == 1  # single-fpc batches by construction
        draws.append(fpcs.pop())
    frac16 = np.mean(np.asarray(draws) == 16)
    sigma = math.sqrt(0.75 * 0.25 / n_batches)
    assert abs(frac16 - 0.75) <= 4 * sigma, (frac16, sigma)


# Tier marker (VERDICT r5 #7): heavy on a 1-core CI host -- the quick
# tier is `pytest -m "not slow"`; CI runs the slow tier separately.
import pytest as _pytest  # noqa: E402
pytestmark = (globals().get("pytestmark") or []) + [_pytest.mark.slow]
if not isinstance(pytestmark, list):  # pragma: no cover
    pytestmark = [pytestmark, _pytest.mark.slow]
