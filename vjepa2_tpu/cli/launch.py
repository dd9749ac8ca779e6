"""Requeue launcher (reference `app/main_distributed.py` role, TPU-native).

The reference leans on submitit: SLURM preemption triggers
``Trainer.checkpoint()`` which resubmits the job with resume_preempt=True
(`main_distributed.py:87-91`). Here the equivalent is a small supervisor:
it execs ``cli.main`` as a child, and when the child exits with
EX_TEMPFAIL (75 — what ``cli.main`` raises after a PreemptionGuard-driven
checkpoint) or dies to SIGTERM, it relaunches; the restart resumes from the
orbax checkpoint (``meta.load_checkpoint``). Any other exit code propagates.

Usage:
  python -m vjepa2_tpu.cli.launch --fname cfg.yaml [--max-requeues 100] [...]

All unknown arguments pass through to ``cli.main``.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

from vjepa2_tpu.core.logging import get_logger

logger = get_logger(__name__, force=True)

EX_TEMPFAIL = 75


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--max-requeues", type=int, default=100)
    p.add_argument("--requeue-delay", type=float, default=5.0)
    args, passthrough = p.parse_known_args(argv)

    cmd = [sys.executable, "-m", "vjepa2_tpu.cli.main", *passthrough]
    for attempt in range(args.max_requeues + 1):
        logger.info("launch attempt %d: %s", attempt, " ".join(cmd))
        rc = subprocess.run(cmd).returncode
        if rc == 0:
            logger.info("run completed")
            return 0
        if rc == EX_TEMPFAIL or rc == -15:  # preempted / SIGTERM'd
            logger.warning("preempted (rc=%s); requeueing in %.0fs", rc, args.requeue_delay)
            time.sleep(args.requeue_delay)
            continue
        logger.error("run failed with rc=%s (not a preemption); giving up", rc)
        return rc
    logger.error("exceeded max requeues (%d)", args.max_requeues)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
