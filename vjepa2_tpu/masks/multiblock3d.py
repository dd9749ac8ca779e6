"""Host-side multi-block 3D mask sampling with *static* output shapes.

Semantics follow reference `src/masks/multiseq_multiblock3d.py`: per step, a
single block size is sampled from (temporal_scale, spatial_scale,
aspect_ratio) with a shared per-step seed, then `npred` randomly-placed
blocks are unioned per sample; predictor targets are the covered tokens,
encoder context the uncovered ones.

TPU-first deviation (SURVEY.md §7 hard part #2): the reference truncates both
index lists to the *per-batch minimum* length, so token counts vary per step
and would force an XLA recompile every iteration. Instead we fix
(ctx_len, pred_len) per mask config from the *expected* union coverage
(deterministic, config-only), and per sample adjust to the exact counts:

* covered tokens beyond ``pred_len`` are dropped (mirroring reference
  truncation, which likewise drops tokens from both sets);
* if too few tokens are uncovered to fill ``ctx_len``, surplus covered
  tokens are re-assigned to the context (rare at reference scales).

Outputs are int32 arrays [B, ctx_len] / [B, pred_len] — the same index-list
contract as the reference, always the same shape -> one compiled step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class MaskConfig:
    """One mask config (one entry of the YAML ``mask:`` list)."""

    spatial_scale: tuple[float, float] = (0.2, 0.8)
    temporal_scale: tuple[float, float] = (1.0, 1.0)
    aspect_ratio: tuple[float, float] = (0.3, 3.0)
    num_blocks: int = 1
    max_temporal_keep: float = 1.0
    max_keep: Optional[int] = None
    full_complement: bool = False
    pred_full_complement: bool = False
    inv_block: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "MaskConfig":
        return cls(
            spatial_scale=tuple(d.get("spatial_scale", (0.2, 0.8))),
            temporal_scale=tuple(d.get("temporal_scale", (1.0, 1.0))),
            aspect_ratio=tuple(d.get("aspect_ratio", (0.3, 3.0))),
            num_blocks=int(d.get("num_blocks", 1)),
            max_temporal_keep=float(d.get("max_temporal_keep", 1.0)),
            max_keep=d.get("max_keep"),
            full_complement=bool(d.get("full_complement", False)),
            pred_full_complement=bool(d.get("pred_full_complement", False)),
            inv_block=bool(d.get("inv_block", False)),
        )


class MaskGenerator:
    """Static-shape 3D multi-block mask sampler for one (config, fpc) pair."""

    def __init__(
        self,
        cfg: MaskConfig,
        crop_size: tuple[int, int] = (224, 224),
        num_frames: int = 16,
        spatial_patch_size: tuple[int, int] = (16, 16),
        temporal_patch_size: int = 2,
        seed: int = 0,
    ):
        self.cfg = cfg
        if not isinstance(crop_size, (tuple, list)):
            crop_size = (crop_size, crop_size)
        if not isinstance(spatial_patch_size, (tuple, list)):
            spatial_patch_size = (spatial_patch_size, spatial_patch_size)
        self.height = crop_size[0] // spatial_patch_size[0]
        self.width = crop_size[1] // spatial_patch_size[1]
        self.duration = num_frames // temporal_patch_size
        self.max_context_duration = max(1, int(self.duration * cfg.max_temporal_keep))
        self._step = -1
        self._seed = seed
        self.num_tokens = self.duration * self.height * self.width
        self.ctx_len, self.pred_len = self._static_lengths()

    # -- static length budget -------------------------------------------------
    def _static_lengths(self, mc_steps: int = 96, nominal_batch: int = 8) -> tuple[int, int]:
        """Token budget matched to the reference's *effective* statistics.

        The reference truncates both index lists to the per-batch minimum
        (`multiseq_multiblock3d.py:211-215`), so its effective lengths are
        the batch-min of the union coverage — substantially below the mean
        coverage for multi-block configs (e.g. 8 blocks @ 0.15 spatial: mean
        union ~0.70N but batch-min ~0.53N at bs 8). We Monte-Carlo that
        statistic once at construction (config-deterministic seed) and fix
        (ctx_len, pred_len) to the mean batch-min; the deviation bound is
        asserted in `tests/masks/test_deviation_quantified.py`.
        """
        rng = np.random.default_rng((self.num_tokens, self.cfg.num_blocks))
        D, H, W = self.duration, self.height, self.width
        min_ctx, min_pred = [], []
        for _ in range(mc_steps):
            t, h, w = self._sample_block_size(rng)
            step_min_c = step_min_p = self.num_tokens
            for _ in range(nominal_batch):
                covered = np.zeros((D, H, W), dtype=bool)
                for _ in range(self.cfg.num_blocks):
                    top = rng.integers(0, H - h + 1)
                    left = rng.integers(0, W - w + 1)
                    start = rng.integers(0, D - t + 1)
                    covered[start : start + t, top : top + h, left : left + w] = True
                if self.max_context_duration < D:
                    covered[self.max_context_duration :, :, :] = True
                n_cov = int(covered.sum())
                n_cov = min(max(n_cov, 1), self.num_tokens - 1)
                step_min_p = min(step_min_p, n_cov)
                step_min_c = min(step_min_c, self.num_tokens - n_cov)
            min_ctx.append(step_min_c)
            min_pred.append(step_min_p)
        ctx_len = max(1, int(round(float(np.mean(min_ctx)))))
        pred_len = max(1, int(round(float(np.mean(min_pred)))))
        if self.cfg.max_keep is not None:
            ctx_len = min(ctx_len, int(self.cfg.max_keep))
        if self.cfg.full_complement:
            pred_len = self.num_tokens - ctx_len
        elif self.cfg.pred_full_complement:
            ctx_len = self.num_tokens - pred_len
        return ctx_len, pred_len

    # -- per-step sampling ----------------------------------------------------
    def step(self) -> int:
        self._step += 1
        return self._step

    def set_step(self, step: int) -> None:
        """Fast-forward on resume (replaces the reference's replay loop)."""
        self._step = step

    def _sample_block_size(self, rng: np.random.Generator) -> tuple[int, int, int]:
        cfg = self.cfg
        t_scale = cfg.temporal_scale[0] + rng.random() * (cfg.temporal_scale[1] - cfg.temporal_scale[0])
        t = max(1, int(self.duration * t_scale))
        s_scale = cfg.spatial_scale[0] + rng.random() * (cfg.spatial_scale[1] - cfg.spatial_scale[0])
        spatial_keep = int(self.height * self.width * s_scale)
        ar = cfg.aspect_ratio[0] + rng.random() * (cfg.aspect_ratio[1] - cfg.aspect_ratio[0])
        h = min(int(round(math.sqrt(spatial_keep * ar))), self.height)
        w = min(int(round(math.sqrt(spatial_keep / ar))), self.width)
        return t, h, w

    def __call__(self, batch_size: int, step: Optional[int] = None) -> tuple[np.ndarray, np.ndarray]:
        """Sample (masks_enc [B, ctx_len], masks_pred [B, pred_len]) int32."""
        if step is None:
            step = self.step()
        # Block size shared across the batch for this step (reference seeds a
        # fresh generator with the shared counter, `multiseq_multiblock3d.py:179-187`).
        size_rng = np.random.default_rng((self._seed, step))
        t, h, w = self._sample_block_size(size_rng)
        place_rng = np.random.default_rng((self._seed, step, 1))

        D, H, W = self.duration, self.height, self.width
        ctx_batch = np.empty((batch_size, self.ctx_len), dtype=np.int32)
        pred_batch = np.empty((batch_size, self.pred_len), dtype=np.int32)

        for b in range(batch_size):
            covered = np.zeros((D, H, W), dtype=bool)
            for attempt in range(10):
                covered[:] = False
                for _ in range(self.cfg.num_blocks):
                    top = place_rng.integers(0, H - h + 1)
                    left = place_rng.integers(0, W - w + 1)
                    start = place_rng.integers(0, D - t + 1)
                    covered[start : start + t, top : top + h, left : left + w] = True
                if self.max_context_duration < D:
                    covered[self.max_context_duration :, :, :] = True
                flat = covered.reshape(-1)
                if 0 < int(flat.sum()) < self.num_tokens:
                    break
            flat = covered.reshape(-1)
            # Degenerate blocks (everything/nothing covered): force a split.
            if flat.all():
                flat[place_rng.integers(0, self.num_tokens)] = False
            elif not flat.any():
                flat[place_rng.integers(0, self.num_tokens)] = True

            ctx_idx = np.flatnonzero(~flat)
            pred_idx = np.flatnonzero(flat)

            # Exact-count adjustment: ctx_len + pred_len <= num_tokens always,
            # so one of the two moves below suffices; truncation then drops the
            # remainder (the reference's per-batch-min truncation drops tokens
            # from both sets the same way).
            if len(pred_idx) < self.pred_len:
                need = self.pred_len - len(pred_idx)
                take = place_rng.choice(len(ctx_idx), size=need, replace=False)
                pred_idx = np.sort(np.concatenate([pred_idx, ctx_idx[take]]))
                ctx_idx = np.delete(ctx_idx, take)
            elif len(ctx_idx) < self.ctx_len:
                need = self.ctx_len - len(ctx_idx)
                take = place_rng.choice(len(pred_idx), size=need, replace=False)
                ctx_idx = np.sort(np.concatenate([ctx_idx, pred_idx[take]]))
                pred_idx = np.delete(pred_idx, take)

            # keep-lowest-index truncation, matching the reference's
            # ``cm[:min_keep]`` bias (`multiseq_multiblock3d.py:211-215`)
            if len(ctx_idx) > self.ctx_len:
                ctx_idx = ctx_idx[: self.ctx_len]
            if len(pred_idx) > self.pred_len:
                pred_idx = pred_idx[: self.pred_len]

            ctx_batch[b] = ctx_idx
            pred_batch[b] = pred_idx

        if self.cfg.full_complement:
            pred_batch = self._complement(ctx_batch)
        elif self.cfg.pred_full_complement:
            ctx_batch = self._complement(pred_batch)

        if self.cfg.inv_block:
            return pred_batch, ctx_batch
        return ctx_batch, pred_batch

    def _complement(self, idx: np.ndarray) -> np.ndarray:
        out = np.empty((idx.shape[0], self.num_tokens - idx.shape[1]), dtype=np.int32)
        all_ids = np.arange(self.num_tokens)
        for b in range(idx.shape[0]):
            out[b] = np.setdiff1d(all_ids, idx[b], assume_unique=False)[: out.shape[1]]
        return out


class MaskCollator:
    """Per-step mask sampling for every (fpc, mask-config) pair.

    Mirrors reference `MaskCollator` but emits numpy index arrays of static
    shape; the shared step counter is advanced by the trainer via ``step()``.
    """

    def __init__(
        self,
        cfgs_mask: Sequence[dict | MaskConfig],
        dataset_fpcs: Sequence[int],
        crop_size: tuple[int, int] = (224, 224),
        patch_size: tuple[int, int] = (16, 16),
        tubelet_size: int = 2,
        seed: int = 0,
    ):
        self.mask_generators: dict[int, list[MaskGenerator]] = {}
        for fpc in sorted(set(dataset_fpcs)):
            gens = []
            for i, m in enumerate(cfgs_mask):
                cfg = m if isinstance(m, MaskConfig) else MaskConfig.from_dict(m)
                gens.append(
                    MaskGenerator(
                        cfg,
                        crop_size=crop_size,
                        num_frames=fpc,
                        spatial_patch_size=patch_size,
                        temporal_patch_size=tubelet_size,
                        seed=seed * 1000 + i,
                    )
                )
            self.mask_generators[fpc] = gens

    def step(self):
        for gens in self.mask_generators.values():
            for g in gens:
                g.step()

    def set_step(self, step: int):
        for gens in self.mask_generators.values():
            for g in gens:
                g.set_step(step)

    def __call__(self, fpc: int, batch_size: int):
        """Returns (masks_enc, masks_pred): lists (one per mask config) of
        int32 arrays [B, ctx_len_i] / [B, pred_len_i]."""
        enc, pred = [], []
        for g in self.mask_generators[fpc]:
            e, p = g(batch_size, step=g._step)
            enc.append(e)
            pred.append(p)
        return enc, pred
