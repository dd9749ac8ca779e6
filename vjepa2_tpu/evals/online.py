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

    def _run_video(encoder, target_params, cfg) -> float:
        from vjepa2_tpu.cli.eval import (
            make_video_eval_loaders,
            probe_configs_from_multihead,
        )
        from vjepa2_tpu.evals.video_classification import VideoClassificationEval

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
        return ev.run(train_loader, val_loader, epochs=epochs)["top1"]

    def _run_image(encoder, target_params, cfg) -> float:
        """IN1K-style probe inline (reference schedules any eval YAML from the
        pretrain config, `app/vjepa/utils.py:25-87` — this closes the r2 gap
        where only the video family ran inline)."""
        import numpy as np

        from vjepa2_tpu.cli.eval import probe_configs_from_multihead
        from vjepa2_tpu.evals.image_classification import ImageClassificationEval

        exp = cfg["experiment"]
        data_c = exp["data"]
        opt_c = exp["optimization"]
        cls_c = exp.get("classifier", {})
        num_classes = int(data_c.get("num_classes", 1000))
        batch_size = int(opt_c.get("batch_size", 4))
        res = encoder.img_size[0]
        # fake-frame replication must match the encoder's tubelet so the
        # tokenizer accepts it; the pretrain encoder is built for video
        nframes = max(2, encoder.tubelet_size)
        probes = probe_configs_from_multihead(
            (opt_c.get("multihead_kwargs") or [{}])[:4], ipe
        )
        ev = ImageClassificationEval(
            encoder=encoder,
            enc_params=target_params,
            num_classes=num_classes,
            probe_configs=probes,
            num_heads=int(cls_c.get("num_heads", encoder.num_heads)),
            probe_depth=1,
            total_steps=epochs * ipe,
            img_as_video_nframes=nframes,
        )
        root = data_c.get("root")
        if root:
            import jax

            from vjepa2_tpu.data.manager import init_image_data
            from vjepa2_tpu.data.transforms import ImageTransform

            _, train_loader, _ = init_image_data(
                root, batch_size, transform=ImageTransform(crop_size=res, train=True),
                train=True, world_size=jax.process_count(), rank=jax.process_index(),
                ipe=ipe,
            )
            _, val_loader, _ = init_image_data(
                data_c.get("root_val", root), batch_size,
                transform=ImageTransform(crop_size=res, train=False), train=False,
                world_size=jax.process_count(), rank=jax.process_index(),
            )
        else:
            logger.warning(
                "online eval %r: no dataset root in the eval config — "
                "probing on SYNTHETIC data; the logged top-1 is a smoke "
                "signal, NOT a benchmark number. Set `data.root` (and "
                "optionally `data.root_val`) to probe real data.",
                cfg.get("eval_name", "image_classification"))

            def synth(batches, seed):
                r = np.random.default_rng(seed)
                out = []
                for _ in range(batches):
                    labels = r.integers(0, num_classes, size=batch_size)
                    imgs = r.normal(size=(batch_size, res, res, 3)).astype(np.float32) * 0.1
                    imgs += labels[:, None, None, None] / num_classes
                    out.append((imgs, labels))
                return out

            train_loader = synth(ipe, 0)
            val_loader = synth(max(1, ipe // 4), 1)
        return ev.run(train_loader, val_loader, epochs=epochs)["top1"]

    def _run_anticipation(encoder, target_params, cfg, ctx) -> float:
        """EK100-style anticipation probe inline. Uses the LIVE pretrain
        predictor for the anticipative AR rollout (the reference's scheduled
        eval job loads it from the checkpoint instead). Returns action
        recall@k. Real EK100 annotations when configured; class-dependent
        synthetic batches otherwise (CI / smoke)."""
        import numpy as np

        from vjepa2_tpu.cli.eval import probe_configs_from_multihead
        from vjepa2_tpu.evals.action_anticipation import AnticipationEval

        predictor = ctx.get("predictor")
        pred_params = ctx.get("predictor_params")
        if predictor is None or pred_params is None:
            logger.info("online anticipation skipped: no live predictor in ctx")
            return float("nan")
        exp = cfg["experiment"]
        data_c = exp["data"]
        opt_c = exp["optimization"]
        cls_c = exp.get("classifier", {})
        batch_size = int(opt_c.get("batch_size", 2))
        fpc = encoder.num_frames
        res = encoder.img_size[0]
        hp = res // encoder.patch_size
        fps = float(data_c.get("frames_per_second", 4))
        probes = probe_configs_from_multihead(
            (opt_c.get("multihead_kwargs") or [{}])[:4], ipe
        )
        ann = data_c.get("annotations_train")
        if ann:
            from vjepa2_tpu.data.epickitchens import (
                EpicKitchensAnticipation, anticipation_collate)
            from vjepa2_tpu.data.loader import DataLoader
            from vjepa2_tpu.data.samplers import DistributedSampler
            from vjepa2_tpu.data.transforms import VideoTransform
            import jax

            train_ds = EpicKitchensAnticipation(
                ann, frames_per_clip=fpc, transform=VideoTransform(crop_size=res),
                anticipation_time_range=tuple(
                    data_c.get("anticipation_time", (1.0, 1.0))),
            )
            val_ds = EpicKitchensAnticipation(
                data_c.get("annotations_val", ann),
                label_space=train_ds.label_space, frames_per_clip=fpc,
                transform=VideoTransform(crop_size=res),
            )
            nv, nn_, na = (train_ds.num_verbs, train_ds.num_nouns,
                           train_ds.num_actions)
            valid_actions = train_ds.valid_action_classes()

            def make(ds, train):
                sampler = DistributedSampler(
                    len(ds), jax.process_count(), jax.process_index(),
                    shuffle=train)
                return DataLoader(
                    ds, sampler, batch_size,
                    num_workers=int(data_c.get("num_workers", 0)),
                    collate_fn=anticipation_collate,
                    epoch_len=ipe if train else None)

            train_batches, val_batches = make(train_ds, True), make(val_ds, False)
        else:
            logger.warning(
                "online eval %r: no annotation/dataset paths in the eval "
                "config — probing on SYNTHETIC clips; the logged recall is "
                "a smoke signal, NOT a benchmark number.",
                cfg.get("eval_name", "action_anticipation"))
            nv, nn_, na = (int(data_c.get("num_verbs", 5)),
                           int(data_c.get("num_nouns", 7)),
                           int(data_c.get("num_actions", 9)))
            valid_actions = None

            def synth(batches, seed):
                r = np.random.default_rng(seed)
                out = []
                for _ in range(batches):
                    labels = r.integers(0, nv, size=batch_size)
                    clips = r.normal(
                        size=(batch_size, fpc, res, res, 3)
                    ).astype(np.float32) * 0.1
                    clips += labels[:, None, None, None, None] / nv
                    at = np.ones(batch_size, np.float32)
                    out.append((clips, at, labels, labels % nn_, labels % na))
                return out

            train_batches, val_batches = synth(ipe, 0), synth(max(1, ipe // 4), 1)
        ev = AnticipationEval(
            encoder, target_params, predictor, pred_params,
            num_verbs=nv, num_nouns=nn_, num_actions=na,
            frames_per_second=fps, grid_size=hp, h_patches=hp, w_patches=hp,
            probe_configs=probes, total_steps=epochs * ipe,
            num_heads=int(cls_c.get("num_heads", encoder.num_heads)),
        )
        for _ in range(epochs):
            for batch in train_batches:
                ev.train_batch(*batch)
        result = ev.evaluate(val_batches, k=int(opt_c.get("recall_k", 5)),
                             valid_action_classes=valid_actions)
        return float(result["action"]["recall"])

    RUNNERS = {
        "video_classification_frozen":
            lambda enc, tp, cfg, ctx: _run_video(enc, tp, cfg),
        "image_classification_frozen":
            lambda enc, tp, cfg, ctx: _run_image(enc, tp, cfg),
        "action_anticipation_frozen": _run_anticipation,
    }

    def online_eval(encoder, target_params, epoch, **ctx) -> dict:
        results = {}
        for path, cfg in cfgs:
            name = cfg.get("eval_name", "video_classification_frozen")
            runner = RUNNERS.get(name)
            if runner is None:
                logger.info(
                    "online eval: skipping %s (family %r has no inline runner)",
                    path, name)
                continue
            results[cfg.get("tag", path)] = runner(encoder, target_params, cfg, ctx)
        return results

    return online_eval
