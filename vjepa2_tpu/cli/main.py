"""CLI launcher (reference `app/main.py` / `evals/main.py`).

No per-GPU process spawning or NCCL rendezvous: one process per *host*, jax
handles devices. App dispatch is config-driven like the reference's
importlib scaffold (`app/scaffold.py`), but over an explicit registry.

Usage:
  python -m vjepa2_tpu.cli.main --fname configs/train/vitl16/pretrain-256px-16f.yaml
  python -m vjepa2_tpu.cli.main --fname cfg.yaml --app vjepa --synthetic-data --epochs 1
"""

from __future__ import annotations

import argparse
import pprint

import yaml

from vjepa2_tpu.core.config import PretrainConfig
from vjepa2_tpu.core.logging import get_logger

logger = get_logger(__name__, force=True)


def run_vjepa(cfg: PretrainConfig, args) -> dict:
    from vjepa2_tpu.core.provenance import PreemptionGuard
    from vjepa2_tpu.train.loop import Pretrainer

    trainer = Pretrainer(cfg, synthetic_data=args.synthetic_data)
    result = trainer.run(epochs=args.epochs, preemption_guard=PreemptionGuard())
    if result.get("preempted"):
        # non-zero exit signals the batch wrapper to requeue; the restarted
        # run resumes from the checkpoint just written (load_checkpoint)
        raise SystemExit(75)  # EX_TEMPFAIL
    return result


def run_vjepa_droid(cfg: PretrainConfig, args) -> dict:
    from vjepa2_tpu.train.droid_loop import DroidTrainer

    enc_params = None
    if cfg.meta.read_checkpoint:
        from vjepa2_tpu.hub.converter import convert_encoder, load_torch_checkpoint

        ckpt = load_torch_checkpoint(cfg.meta.read_checkpoint)
        enc_params = convert_encoder(ckpt.get("target_encoder", ckpt.get("encoder", ckpt)))
    trainer = DroidTrainer(cfg, enc_params=enc_params, synthetic_data=args.synthetic_data)
    return trainer.run(epochs=args.epochs)


APPS = {"vjepa": run_vjepa, "vjepa_droid": run_vjepa_droid}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fname", required=True, help="YAML config (reference-compatible sections)")
    p.add_argument("--app", default=None, help="override the config's app name")
    p.add_argument("--epochs", type=int, default=None, help="override epoch count")
    p.add_argument("--synthetic-data", action="store_true", help="run on synthetic clips")
    p.add_argument("--coordinator", default=None, help="multi-host coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    from vjepa2_tpu.core.distributed import init_distributed

    rank, world = init_distributed(args.coordinator, args.num_processes, args.process_id)
    if world > 1:
        logger.info("multi-host: process %d / %d", rank, world)

    with open(args.fname) as f:
        raw = yaml.safe_load(f)
    cfg = PretrainConfig.from_dict(raw)
    app = args.app or cfg.app
    if app not in APPS:
        raise SystemExit(f"unknown app '{app}'; available: {', '.join(APPS)}")
    logger.info("loaded config:\n%s", pprint.pformat(raw)[:2000])
    from vjepa2_tpu.core.provenance import dump_provenance

    dump_provenance(cfg.folder, raw, app=app)
    result = APPS[app](cfg, args)
    logger.info("done: %s", result)
    return result


if __name__ == "__main__":
    main()
