"""Frozen image-classification eval, IN1K-style
(reference `evals/image_classification_frozen/eval.py`).

Images are replicated to a fake 2-frame clip so the *video* encoder tokenizes
them (reference does this via a forward pre-hook,
`modelcustom/vit_encoder.py:56-66`), then the same vmapped probe grid trains
on the frozen features.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vjepa2_tpu.core.logging import AverageMeter, get_logger
from vjepa2_tpu.evals.probes import ProbeConfig, ProbeGrid
from vjepa2_tpu.evals.wrappers import image_as_video

logger = get_logger(__name__)


@dataclass
class ImageClassificationEval:
    encoder: object
    enc_params: object
    num_classes: int = 1000
    probe_configs: Sequence[ProbeConfig] = ()
    num_heads: int = 12
    probe_depth: int = 1
    total_steps: int = 1000
    img_as_video_nframes: int = 2  # fake-frame count fed to the video encoder
    seed: int = 0
    extract_fn: object = None  # plugin wrapper: (params, images, None) -> feats

    def __post_init__(self):
        self.grid = ProbeGrid(
            list(self.probe_configs),
            embed_dim=self.encoder.embed_dim,
            num_classes=self.num_classes,
            num_heads=self.num_heads,
            depth=self.probe_depth,
            total_steps=self.total_steps,
            seed=self.seed,
        )
        self._probe_state = None
        extract = self.extract_fn or (
            lambda p, imgs, _ci: self.encoder.apply(
                {"params": p}, image_as_video(imgs, self.img_as_video_nframes)
            )
        )
        self._encode = jax.jit(extract)

    def features(self, images: np.ndarray) -> jnp.ndarray:
        from vjepa2_tpu.ops.flash_attention import fwd_cap_override

        # forward-only program: uncapped full-N flash blocks (measured win,
        # `ops/flash_attention.py:fwd_cap_override`)
        with fwd_cap_override(None):
            return jax.lax.stop_gradient(
                self._encode(self.enc_params, jnp.asarray(images), None))

    def train_batch(self, images, labels) -> dict:
        feats = self.features(images)
        if self._probe_state is None:
            self._probe_state = self.grid.init(feats.shape[1:])
        params, opt, step = self._probe_state
        params, opt, step, metrics = self.grid.train_step(
            params, opt, step, feats, jnp.asarray(labels)
        )
        self._probe_state = (params, opt, step)
        return {k: np.asarray(v) for k, v in metrics.items()}

    def run(self, train_loader, val_loader, epochs: int = 1) -> dict:
        for epoch in range(epochs):
            meter = AverageMeter()
            for images, labels in train_loader:
                m = self.train_batch(images, labels)
                meter.update(float(m["acc"].max()))
            logger.info("epoch %d train acc(max probe) %.4f", epoch, meter.avg)
        total, correct = 0, None
        params, _, _ = self._probe_state
        for images, labels in val_loader:
            feats = self.features(images)
            c = self.grid.eval_correct(params, feats, jnp.asarray(labels))
            correct = c if correct is None else correct + c
            total += len(labels)
        # cross-host reduction over disjoint per-process shards
        # (reference `evals/video_classification_frozen/eval.py:329`)
        from vjepa2_tpu.core.distributed import global_sum

        correct = global_sum(correct)
        total = int(global_sum(np.int64(total)))
        top1 = correct / max(1, total)
        best = int(np.argmax(top1))
        return {"top1_per_probe": top1, "best_probe": best, "top1": float(top1[best])}
