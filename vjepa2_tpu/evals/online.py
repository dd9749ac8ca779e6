"""Online evals during pretraining (reference `app/vjepa/utils.py:25-87` +
`app/vjepa/train.py` eval_freq).

The reference schedules separate SLURM eval jobs from the eval YAMLs listed
under the pretrain config's ``evals`` key. TPU-native equivalent: run the
vmapped attentive-probe eval *in process* on the frozen EMA target encoder
at ``eval_freq`` — no job scheduler round-trip, and the probe grid is one
compiled program. The same eval YAMLs drive it; datasets fall back to
synthetic when paths are unset (CI / smoke runs).
"""

from __future__ import annotations

import yaml

from vjepa2_tpu.core.logging import get_logger

logger = get_logger(__name__)


def make_online_eval(eval_cfg_paths, ipe: int = 20, epochs: int = 1, tag: str = ""):
    """Build the Pretrainer.online_eval callable from eval config paths.

    Returns callable(encoder, target_params, epoch) -> {cfg_tag: top1}.
    The encoder passed in is the *pretraining* encoder module; its EMA
    target params are evaluated frozen (reference evaluates the saved
    target-encoder checkpoint, `configs/eval/*: checkpoint_key`).
    """
    cfgs = []
    for path in eval_cfg_paths or []:
        with open(path) as f:
            cfgs.append((path, yaml.safe_load(f)))

    def online_eval(encoder, target_params, epoch) -> dict:
        from vjepa2_tpu.cli.eval import (
            make_video_eval_loaders,
            probe_configs_from_multihead,
        )
        from vjepa2_tpu.evals.video_classification import VideoClassificationEval

        results = {}
        for path, cfg in cfgs:
            if cfg.get("eval_name", "video_classification_frozen") != "video_classification_frozen":
                logger.info("online eval: skipping %s (only probe evals run inline)", path)
                continue
            exp = cfg["experiment"]
            data_c = exp["data"]
            opt_c = exp["optimization"]
            cls_c = exp.get("classifier", {})
            num_classes = int(data_c.get("num_classes", 174))
            probes = probe_configs_from_multihead(
                (opt_c.get("multihead_kwargs") or [{}])[:4], ipe
            )
            ev = VideoClassificationEval(
                encoder=encoder,
                enc_params=target_params,
                num_classes=num_classes,
                probe_configs=probes,
                num_heads=int(cls_c.get("num_heads", encoder.num_heads)),
                probe_depth=1,  # shallow probe for the online signal
                total_steps=epochs * ipe,
            )
            # online evals use the pretrain clip geometry (the encoder is
            # built for it); dataset paths may be absent during pretraining,
            # in which case class-dependent synthetic clips keep the signal
            fpc = encoder.num_frames
            res = encoder.img_size[0]
            train_loader, val_loader = make_video_eval_loaders(
                data_c, int(opt_c.get("batch_size", 2)), fpc, res, 1, num_classes, ipe
            )
            out = ev.run(train_loader, val_loader, epochs=epochs)
            tag_i = cfg.get("tag", path)
            results[tag_i] = out["top1"]
        return results

    return online_eval
