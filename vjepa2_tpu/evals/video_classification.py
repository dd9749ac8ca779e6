"""Frozen video-classification eval (reference `evals/video_classification_frozen/eval.py`).

Pipeline: frozen encoder -> ClipAggregation features -> vmapped attentive
probe grid -> report max top-1 over probes. Multi-clip / multi-view
aggregation averages logits over spatial views at eval time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.core.logging import AverageMeter, get_logger
from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid
from vjepa2_tpu.evals.wrappers import encode_clips

logger = get_logger(__name__)


@dataclass
class VideoClassificationEval:
    """Trains a probe grid on frozen features and evaluates top-1."""

    encoder: object
    enc_params: object
    num_classes: int
    probe_configs: Sequence[ProbeConfig]
    num_heads: int = 12
    probe_depth: int = 1
    total_steps: int = 1000
    use_pos_embed: bool = False
    seed: int = 0
    extract_fn: Optional[object] = None  # plugin wrapper: (params, clips, clip_indices) -> feats

    def __post_init__(self):
        self.grid = ProbeGrid(
            self.probe_configs,
            embed_dim=self.encoder.embed_dim,
            num_classes=self.num_classes,
            num_heads=self.num_heads,
            depth=self.probe_depth,
            total_steps=self.total_steps,
            seed=self.seed,
        )
        self._probe_state = None
        # The feature extractor is pluggable by dotted module name from the
        # eval config (reference `video_classification_frozen/models.py:14-44`);
        # default is the multiclip ClipAggregation wrapper.
        extract = self.extract_fn or (
            lambda p, clips, ci: encode_clips(
                self.encoder, p, clips, ci, use_pos_embed=self.use_pos_embed
            )
        )
        # params are a jit ARGUMENT (closure-captured trees become HLO
        # constants and wreck ViT-L-scale compiles)
        self._encode = jax.jit(extract)

    def features(self, clips: np.ndarray, clip_indices: Optional[np.ndarray] = None) -> jnp.ndarray:
        """clips [B, nc, T, H, W, C] float32 -> frozen features (no grad)."""
        from vjepa2_tpu.ops.flash_attention import fwd_cap_override

        ci = None if clip_indices is None else jnp.asarray(clip_indices)
        # forward-only program: uncapped full-N flash blocks win here
        # (measured, `ops/flash_attention.py:fwd_cap_override` docstring)
        with fwd_cap_override(None):
            return jax.lax.stop_gradient(
                self._encode(self.enc_params, jnp.asarray(clips), ci))

    def init_probes(self, feat_shape):
        self._probe_state = self.grid.init(feat_shape)

    def train_batch(self, clips, labels, clip_indices=None) -> dict:
        feats = self.features(clips, clip_indices)
        if self._probe_state is None:
            self.init_probes(feats.shape[1:])
        params, opt, step = self._probe_state
        params, opt, step, metrics = self.grid.train_step(
            params, opt, step, feats, jnp.asarray(labels)
        )
        self._probe_state = (params, opt, step)
        return {k: np.asarray(v) for k, v in metrics.items()}

    def eval_batch(self, clips, labels, clip_indices=None, num_views: int = 1) -> np.ndarray:
        """Multi-view eval: clips [B, views*nc, T, H, W, C]; logits averaged
        over views (reference `eval.py:317-331`). Returns per-probe #correct."""
        params, _, _ = self._probe_state
        B = clips.shape[0]
        logits_acc = None
        views = np.split(np.asarray(clips), num_views, axis=1)
        for v in views:
            feats = self.features(v, clip_indices)
            lg = self.grid.eval_logits(params, feats)  # [P, B, C]
            logits_acc = lg if logits_acc is None else logits_acc + lg
        correct = (jnp.argmax(logits_acc, -1) == jnp.asarray(labels)[None, :]).sum(-1)
        return np.asarray(correct)

    def save_probes(self, path: str) -> None:
        """Checkpoint the probe grid (reference checkpoints probes,
        `evals/video_classification_frozen/eval.py:225-238`)."""
        from vjepa2_tpu.core.checkpoint import save_params

        assert self._probe_state is not None
        params, opt, step = self._probe_state
        save_params(path, {"params": params, "step": step})

    def restore_probes(self, path: str, feat_shape) -> None:
        from vjepa2_tpu.core.checkpoint import load_params

        if self._probe_state is None:
            self.init_probes(feat_shape)
        params, opt, step = self._probe_state
        restored = load_params(path, {"params": params, "step": step})
        self._probe_state = (restored["params"], opt, restored["step"])

    def run(self, train_loader, val_loader, epochs: int = 1, num_views: int = 1,
            probe_ckpt: str | None = None) -> dict:
        """Full loop. Loaders yield (clips [B, nc, T, H, W, C], labels, clip_indices)."""
        for epoch in range(epochs):
            meter = AverageMeter()
            for clips, labels, ci in train_loader:
                m = self.train_batch(clips, labels, ci)
                meter.update(float(m["acc"].max()))
            logger.info("epoch %d train acc(max probe) %.4f", epoch, meter.avg)
            if probe_ckpt is not None:
                self.save_probes(probe_ckpt)
        total, correct = 0, None
        for clips, labels, ci in val_loader:
            c = self.eval_batch(clips, labels, ci, num_views=num_views)
            correct = c if correct is None else correct + c
            total += len(labels)
        # cross-host reduction: each process evaluates a disjoint shard; the
        # reference all-reduces top-1 (`eval.py:329`)
        from vjepa2_tpu.core.distributed import global_sum

        correct = global_sum(correct)
        total = int(global_sum(np.int64(total)))
        top1 = correct / max(1, total)
        best = int(np.argmax(top1))
        return {
            "top1_per_probe": top1,
            "best_probe": best,
            "top1": float(top1[best]),
        }
