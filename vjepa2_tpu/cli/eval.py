"""Frozen-eval launcher (reference `evals/main.py` + `evals/scaffold.py`).

Config layout mirrors the reference eval YAMLs: ``eval_name``,
``experiment.{classifier,data,optimization}``, ``model_kwargs``. The probe
grid (``multihead_kwargs``) trains as one vmapped program.

Usage:
  python -m vjepa2_tpu.cli.eval --fname configs/eval/vitl/ssv2.yaml \
      [--checkpoint /path/to/torch_or_orbax_ckpt] [--synthetic-data]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
import yaml

from vjepa2_tpu.core.logging import get_logger
from vjepa2_tpu.evals.probes import ProbeConfig
from vjepa2_tpu.models.vision_transformer import MODEL_REGISTRY

logger = get_logger(__name__, force=True)


def probe_configs_from_multihead(multihead_kwargs, ipe: int) -> list[ProbeConfig]:
    out = []
    for g in multihead_kwargs:
        fwd = g.get("final_weight_decay", g.get("final_wd"))
        out.append(
            ProbeConfig(
                lr=float(g.get("lr", g.get("ref_lr", 1e-3))),
                start_lr=float(g.get("start_lr", g.get("lr", 1e-3))),
                final_lr=float(g.get("final_lr", 0.0)),
                weight_decay=float(g.get("weight_decay", g.get("ref_wd", 0.0))),
                warmup_steps=int(float(g.get("warmup", 0.0)) * ipe),
                final_wd=float(fwd) if fwd is not None else None,
            )
        )
    return out


class SyntheticEvalLoader:
    """Class-dependent synthetic clips so probes have signal to learn."""

    def __init__(self, batch_size, num_clips, fpc, crop, num_classes, batches, seed=0):
        self.rng = np.random.default_rng(seed)
        self.shape = (batch_size, num_clips, fpc, crop, crop, 3)
        self.num_classes = num_classes
        self.batches = batches
        self.fpc = fpc

    def __iter__(self):
        for _ in range(self.batches):
            labels = self.rng.integers(0, self.num_classes, size=self.shape[0])
            clips = self.rng.normal(size=self.shape).astype(np.float32) * 0.1
            clips += labels[:, None, None, None, None, None] / self.num_classes
            ci = np.tile(np.arange(self.fpc), (self.shape[0], self.shape[1], 1))
            yield clips, labels, ci


def build_encoder(model_kwargs: dict, resolution: int, fpc: int, checkpoint=None,
                  dtype=jnp.bfloat16, out_layers=None):
    pk = model_kwargs.get("pretrain_kwargs", {}) or {}
    if "encoder" in pk:  # reference nests encoder kwargs one level deeper
        pk = pk["encoder"]
    model_name = pk.get("model_name", model_kwargs.get("model_name", "vit_large"))
    enc = MODEL_REGISTRY[model_name](
        img_size=(resolution, resolution),
        num_frames=fpc,
        tubelet_size=pk.get("tubelet_size", 2),
        uniform_power=pk.get("uniform_power", True),
        use_rope=pk.get("use_rope", True),
        out_layers=tuple(out_layers) if out_layers else None,
        dtype=dtype,
    )
    params = None
    if checkpoint:
        if checkpoint.endswith(".pt"):
            from vjepa2_tpu.hub.converter import convert_encoder, load_torch_checkpoint

            ckpt = load_torch_checkpoint(checkpoint)
            sd = ckpt.get("target_encoder", ckpt.get("encoder", ckpt))
            params = convert_encoder(sd)
        else:
            from vjepa2_tpu.core.checkpoint import load_params

            params = _extract_encoder_params(load_params(checkpoint))
    return enc, params


def _extract_encoder_params(tree):
    """Normalize an orbax restore to the bare encoder param tree.

    Accepts (a) encoder-only params (hub-style `save_params` artifacts, the
    reference `checkpoint_key` analogue), (b) a whole pretrain TrainState
    (uses the EMA target, like the reference's `target_encoder` key), and
    (c) the pipeline-parallel layout (`core/pipeline.py` stacks blocks under
    'encoder_blocks'; unstacked here so evals see the plain blocks_i tree).
    """
    if isinstance(tree, dict) and "target_params" in tree:
        tree = tree["target_params"]
    if isinstance(tree, dict) and "encoder_blocks" in tree:
        from vjepa2_tpu.core.pipeline import merge_block_params

        return merge_block_params(tree["encoder"], tree["encoder_blocks"])
    if isinstance(tree, dict) and "encoder" in tree and "patch_embed" not in tree:
        return tree["encoder"]
    return tree


def make_video_eval_loaders(data_c, batch_size, fpc, res, num_clips, num_classes, ipe,
                            synthetic=False):
    """(train, val) loaders for probe evals; synthetic when paths unset."""
    if synthetic or not data_c.get("dataset_train"):
        if not synthetic:
            from vjepa2_tpu.core.logging import get_logger

            get_logger(__name__).warning(
                "video eval: no `data.dataset_train` in the eval config — "
                "probing on SYNTHETIC clips; the logged top-1 is a smoke "
                "signal, NOT a benchmark number.")
        return (
            SyntheticEvalLoader(batch_size, num_clips, fpc, res, num_classes, ipe),
            SyntheticEvalLoader(batch_size, num_clips, fpc, res, num_classes,
                                max(1, ipe // 4), seed=1),
        )
    import jax

    from vjepa2_tpu.data.loader import DataLoader
    from vjepa2_tpu.data.samplers import DistributedSampler
    from vjepa2_tpu.data.transforms import VideoTransform
    from vjepa2_tpu.data.video_dataset import VideoDataset

    def make(path, train):
        ds = VideoDataset(
            data_paths=[path],
            frames_per_clip=fpc,
            frame_step=data_c.get("frame_step", 4),
            fps=None,
            num_clips=num_clips,
            transform=VideoTransform(crop_size=res, horizontal_flip=train),
        )
        sampler = DistributedSampler(
            len(ds), jax.process_count(), jax.process_index(), shuffle=train
        )

        def collate(samples):
            clips = np.stack([np.stack(s[0]) for s in samples])  # [B, nc, T, S, S, 3]
            labels = np.asarray([s[1] for s in samples])
            ci = np.stack([np.stack([np.asarray(c) for c in s[2]]) for s in samples])
            return clips, labels, ci

        return DataLoader(ds, sampler, batch_size, num_workers=data_c.get("num_workers", 4),
                          collate_fn=collate, epoch_len=ipe if train else None,
                          rank=jax.process_index())

    return make(data_c["dataset_train"], True), make(data_c["dataset_val"], False)


def run_video_classification(cfg: dict, args) -> dict:
    exp = cfg["experiment"]
    data_c = exp["data"]
    opt_c = exp["optimization"]
    cls_c = exp.get("classifier", {})
    mdl_c = cfg.get("model_kwargs", {})

    fpc = int(data_c.get("frames_per_clip", 16))
    res = int(data_c.get("resolution", 256))
    num_classes = int(data_c.get("num_classes", 174))
    num_clips = int(data_c.get("num_segments", 1))
    batch_size = int(opt_c.get("batch_size", 4))
    epochs = args.epochs or int(opt_c.get("num_epochs", 1))

    ckpt = args.checkpoint or mdl_c.get("checkpoint")
    wrapper_kwargs = dict(mdl_c.get("wrapper_kwargs", {}) or {})
    encoder, enc_params = build_encoder(
        mdl_c, res, fpc, ckpt, out_layers=wrapper_kwargs.get("out_layers")
    )
    if enc_params is None:
        import jax

        logger.warning("no checkpoint given: using randomly-initialized encoder")
        dummy = jnp.zeros((1, fpc, res, res, 3), jnp.float32)
        enc_params = jax.jit(encoder.init)(jax.random.PRNGKey(0), dummy)["params"]

    ipe = int(opt_c.get("ipe", 100))
    probes = probe_configs_from_multihead(opt_c.get("multihead_kwargs", [{}]), ipe)

    # Feature extractor resolved by dotted module name, reference-style
    # (`evals/video_classification_frozen/models.py:14-44`).
    extract = None
    if mdl_c.get("module_name"):
        from vjepa2_tpu.evals import plugins

        extract = plugins.init_module(
            mdl_c["module_name"], encoder=encoder, enc_params=enc_params, **wrapper_kwargs
        )

    from vjepa2_tpu.evals.video_classification import VideoClassificationEval

    ev = VideoClassificationEval(
        encoder=encoder,
        enc_params=enc_params,
        num_classes=num_classes,
        probe_configs=probes,
        num_heads=int(cls_c.get("num_heads", encoder.num_heads)),
        probe_depth=int(cls_c.get("num_probe_blocks", 1)),
        total_steps=epochs * ipe,
        use_pos_embed=bool(wrapper_kwargs.get("use_pos_embed", False)),
        extract_fn=extract,
    )

    train_loader, val_loader = make_video_eval_loaders(
        data_c, batch_size, fpc, res, num_clips, num_classes, ipe,
        synthetic=args.synthetic_data,
    )

    val_only = args.val_only or bool(cfg.get("val_only", False))
    probe_ckpt = (cfg.get("model_kwargs", {}) or {}).get("probe_checkpoint")
    if val_only and probe_ckpt:
        first = next(iter(val_loader))
        feats = ev.features(first[0][:1], None if first[2] is None else first[2][:1])
        ev.restore_probes(probe_ckpt, feats.shape[1:])
    result = ev.run(train_loader, val_loader, epochs=0 if val_only else epochs)
    logger.info(
        "top-1 %.4f (probe %d of %d); per-probe: %s",
        result["top1"], result["best_probe"], len(probes),
        np.round(result["top1_per_probe"], 4),
    )
    print({"top1": result["top1"], "best_probe": result["best_probe"]})
    return result


def run_image_classification(cfg: dict, args) -> dict:
    """IN1K frozen probe (reference `evals/image_classification_frozen/eval.py`)."""
    import jax

    exp = cfg["experiment"]
    data_c = exp["data"]
    opt_c = exp["optimization"]
    cls_c = exp.get("classifier", {})
    mdl_c = cfg.get("model_kwargs", {})
    res = int(data_c.get("resolution", 256))
    num_classes = int(data_c.get("num_classes", 1000))
    batch_size = int(opt_c.get("batch_size", 16))
    ipe = int(opt_c.get("ipe", 100))
    epochs = args.epochs or int(opt_c.get("num_epochs", 1))

    ckpt = args.checkpoint or mdl_c.get("checkpoint")
    wrapper_kwargs = dict(mdl_c.get("wrapper_kwargs", {}) or {})
    # reference replicates each image to N fake frames so the *video*
    # encoder tokenizes it (`image_classification_frozen/modelcustom/
    # vit_encoder.py:56-66`; in1k configs use img_as_video_nframes: 16/18)
    nframes = int(wrapper_kwargs.get("img_as_video_nframes", 2))
    encoder, enc_params = build_encoder(mdl_c, res, nframes, ckpt)
    if enc_params is None:
        logger.warning("no checkpoint given: using randomly-initialized encoder")
        dummy = jnp.zeros((1, nframes, res, res, 3), jnp.float32)
        enc_params = jax.jit(encoder.init)(jax.random.PRNGKey(0), dummy)["params"]
    probes = probe_configs_from_multihead(opt_c.get("multihead_kwargs", [{}]), ipe)

    extract = None
    if mdl_c.get("module_name"):
        from vjepa2_tpu.evals import plugins

        extract = plugins.init_module(
            mdl_c["module_name"], encoder=encoder, enc_params=enc_params, **wrapper_kwargs
        )

    from vjepa2_tpu.evals.image_classification import ImageClassificationEval

    ev = ImageClassificationEval(
        encoder=encoder, enc_params=enc_params, num_classes=num_classes,
        probe_configs=probes, num_heads=int(cls_c.get("num_heads", encoder.num_heads)),
        probe_depth=int(cls_c.get("num_probe_blocks", 1)), total_steps=epochs * ipe,
        img_as_video_nframes=nframes, extract_fn=extract,
    )

    if args.synthetic_data or not data_c.get("root"):
        rng = np.random.default_rng(0)

        def synth(batches, seed):
            r = np.random.default_rng(seed)
            for _ in range(batches):
                labels = r.integers(0, num_classes, size=batch_size)
                imgs = r.normal(size=(batch_size, res, res, 3)).astype(np.float32) * 0.1
                imgs += labels[:, None, None, None] / num_classes
                yield imgs, labels

        train_loader = list(synth(ipe, 0))
        val_loader = list(synth(max(1, ipe // 4), 1))
    else:
        from vjepa2_tpu.data.manager import init_image_data
        from vjepa2_tpu.data.transforms import ImageTransform

        _, train_loader, _ = init_image_data(
            data_c["root"], batch_size, transform=ImageTransform(crop_size=res, train=True),
            train=True, world_size=jax.process_count(), rank=jax.process_index(), ipe=ipe,
        )
        _, val_loader, _ = init_image_data(
            data_c.get("root_val", data_c["root"]), batch_size,
            transform=ImageTransform(crop_size=res, train=False), train=False,
            world_size=jax.process_count(), rank=jax.process_index(),
        )
    result = ev.run(train_loader, val_loader, epochs=epochs)
    logger.info("IN1K top-1 %.4f (best probe %d)", result["top1"], result["best_probe"])
    print({"top1": result["top1"], "best_probe": result["best_probe"]})
    return result


def run_action_anticipation(cfg: dict, args) -> dict:
    """EK100 anticipation (reference `evals/action_anticipation_frozen/eval.py`)."""
    import jax

    from vjepa2_tpu.evals.action_anticipation import AnticipationEval
    from vjepa2_tpu.models.predictor import vit_predictor

    exp = cfg["experiment"]
    data_c = exp["data"]
    opt_c = exp["optimization"]
    mdl_c = cfg.get("model_kwargs", {})
    fpc = int(data_c.get("frames_per_clip", 16))
    res = int(data_c.get("resolution", 256))
    batch_size = int(opt_c.get("batch_size", 8))
    ipe = int(opt_c.get("ipe", 100))
    epochs = args.epochs or int(opt_c.get("num_epochs", 1))
    fps = float(data_c.get("frames_per_second", 4))

    ckpt = args.checkpoint or mdl_c.get("checkpoint")
    encoder, enc_params = build_encoder(mdl_c, res, fpc, ckpt)
    hp = res // 16
    predictor = vit_predictor(
        img_size=(res, res), num_frames=fpc, tubelet_size=2,
        embed_dim=encoder.embed_dim, predictor_embed_dim=384, depth=12,
        num_heads=12, num_mask_tokens=10, use_mask_tokens=True, use_rope=True,
    )
    pred_params = None
    if ckpt and str(ckpt).endswith(".pt"):
        from vjepa2_tpu.hub.converter import convert_predictor, load_torch_checkpoint

        t = load_torch_checkpoint(ckpt)
        if "predictor" in t:
            pred_params = convert_predictor(t["predictor"])
    if enc_params is None or pred_params is None:
        logger.warning("missing checkpoint: randomly-initialized encoder/predictor")
        dummy = jnp.zeros((1, fpc, res, res, 3), jnp.float32)
        if enc_params is None:
            enc_params = jax.jit(encoder.init)(jax.random.PRNGKey(0), dummy)["params"]
        if pred_params is None:
            x = encoder.apply({"params": enc_params}, dummy)
            N = x.shape[1]
            pred_params = jax.jit(
                lambda k: predictor.init(
                    k, x, jnp.zeros((1, N), jnp.int32), jnp.zeros((1, hp * hp), jnp.int32), 0
                )
            )(jax.random.PRNGKey(1))["params"]

    if args.synthetic_data or not data_c.get("annotations_train"):
        nv, nn_, na = 5, 7, 9
        r = np.random.default_rng(0)

        def synth(batches, seed):
            rr = np.random.default_rng(seed)
            out = []
            for _ in range(batches):
                labels = rr.integers(0, nv, size=batch_size)
                clips = rr.normal(size=(batch_size, fpc, res, res, 3)).astype(np.float32) * 0.1
                clips += labels[:, None, None, None, None] / nv
                at = np.ones(batch_size, np.float32)
                out.append((clips, at, labels, labels % nn_, labels % na))
            return out

        train_batches, val_batches = synth(ipe, 0), synth(max(1, ipe // 4), 1)
        valid_actions = None
    else:
        from vjepa2_tpu.data.epickitchens import EpicKitchensAnticipation, anticipation_collate
        from vjepa2_tpu.data.loader import DataLoader
        from vjepa2_tpu.data.samplers import DistributedSampler
        from vjepa2_tpu.data.transforms import VideoTransform

        train_ds = EpicKitchensAnticipation(
            data_c["annotations_train"], frames_per_clip=fpc,
            transform=VideoTransform(crop_size=res),
            anticipation_time_range=tuple(data_c.get("anticipation_time", (1.0, 1.0))),
        )
        val_ds = EpicKitchensAnticipation(
            data_c["annotations_val"], label_space=train_ds.label_space,
            frames_per_clip=fpc, transform=VideoTransform(crop_size=res),
        )
        nv, nn_, na = train_ds.num_verbs, train_ds.num_nouns, train_ds.num_actions
        valid_actions = train_ds.valid_action_classes()

        def make(ds, train):
            sampler = DistributedSampler(len(ds), jax.process_count(), jax.process_index(), shuffle=train)
            return DataLoader(ds, sampler, batch_size, num_workers=data_c.get("num_workers", 4),
                              collate_fn=anticipation_collate, epoch_len=ipe if train else None)

        train_batches, val_batches = make(train_ds, True), make(val_ds, False)

    # full probe grid, one vmapped program (reference trains one classifier
    # per multihead entry, `action_anticipation_frozen/eval.py:125,230`)
    probes = probe_configs_from_multihead(opt_c.get("multihead_kwargs", [{}]), ipe)
    ev = AnticipationEval(
        encoder, enc_params, predictor, pred_params,
        num_verbs=nv, num_nouns=nn_, num_actions=na,
        frames_per_second=fps, grid_size=hp, h_patches=hp, w_patches=hp,
        probe_configs=probes, total_steps=epochs * ipe,
    )
    val_only = args.val_only or bool(cfg.get("val_only", False))
    probe_ckpt = mdl_c.get("probe_checkpoint")
    if val_only:
        assert probe_ckpt, "val_only anticipation needs model_kwargs.probe_checkpoint"
        first = next(iter(val_batches))
        ev.restore_probes(probe_ckpt, ev.features_for(first[0][:1], first[1][:1]))
    else:
        loss = float("nan")  # stays NaN if the loader yields nothing
        for epoch in range(epochs):
            for batch in train_batches:
                loss = ev.train_batch(*batch)
            logger.info("anticipation epoch %d loss %.4f", epoch, loss)
        if probe_ckpt:
            ev.save_probes(probe_ckpt)
    result = ev.evaluate(val_batches, k=int(opt_c.get("recall_k", 5)), valid_action_classes=valid_actions)
    logger.info("anticipation: %s", result)
    print({k: result[k]["recall"] for k in ("verb", "noun", "action")})
    return result


def shrink_config(cfg: dict) -> dict:
    """Scale a real eval config down to vit_tiny/64px/2-probe for CI smoke
    runs; dispatch wiring (module_name, out_layers, grids) is preserved."""
    cfg = dict(cfg)
    exp = cfg.get("experiment", {})
    data_c = exp.get("data", {})
    opt_c = exp.get("optimization", {})
    data_c.update(resolution=64, frames_per_clip=4, num_segments=1, frame_step=1)
    data_c["num_classes"] = min(int(data_c.get("num_classes", 10)), 10)
    opt_c.update(batch_size=2, num_epochs=1, ipe=2)
    opt_c["multihead_kwargs"] = (opt_c.get("multihead_kwargs") or [{}])[:2]
    mdl = cfg.get("model_kwargs", {}) or {}
    pk = mdl.get("pretrain_kwargs", {}) or {}
    if "encoder" in pk:
        pk = pk["encoder"]
    pk["model_name"] = "vit_tiny"
    mdl["pretrain_kwargs"] = pk
    mdl["checkpoint"] = None
    wk = mdl.get("wrapper_kwargs", {}) or {}
    if wk.get("out_layers"):
        wk["out_layers"] = [4, 8, 11]  # vit_tiny has 12 blocks
    if "img_as_video_nframes" in wk:
        wk["img_as_video_nframes"] = 2
    return cfg


EVALS = {
    "video_classification_frozen": run_video_classification,
    "image_classification_frozen": run_image_classification,
    "action_anticipation_frozen": run_action_anticipation,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fname", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--synthetic-data", action="store_true")
    p.add_argument("--val-only", action="store_true")
    p.add_argument(
        "--tiny", action="store_true",
        help="CI smoke mode: shrink model/resolution/ipe but keep the exact "
        "config-driven dispatch path (plugin module_name, probe grid, ...)",
    )
    args = p.parse_args(argv)

    with open(args.fname) as f:
        cfg = yaml.safe_load(f)
    if args.tiny:
        cfg = shrink_config(cfg)
        args.synthetic_data = True
    name = cfg.get("eval_name", "video_classification_frozen")
    if name not in EVALS:
        raise SystemExit(f"unknown eval_name '{name}'; available: {', '.join(EVALS)}")
    return EVALS[name](cfg, args)


if __name__ == "__main__":
    main()
