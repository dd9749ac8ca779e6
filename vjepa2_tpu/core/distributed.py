"""Multi-host initialization (reference `src/utils/distributed.py:init_distributed`).

The reference rendezvouses NCCL via env vars + SLURM and a fixed port. The
JAX equivalent is `jax.distributed.initialize`: every host connects to a
coordinator, after which `jax.devices()` spans the slice/pod and the same
mesh code runs unchanged. On single-host (or TPU-VM auto-detected) setups
this is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize multi-host JAX. Returns (process_index, process_count).

    Arguments may come from the CLI or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax auto-detects and all
    three may be None.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def global_sum(x):
    """Sum a host-local numpy/scalar value across processes.

    The reference all-reduces eval statistics every epoch
    (`evals/video_classification_frozen/eval.py:329`,
    `evals/action_anticipation_frozen/metrics.py:48-50`); multi-host JAX's
    equivalent is a process allgather + sum. Identity on single-process runs.
    """
    import numpy as np

    if jax.process_count() == 1:
        return x
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(x))).sum(0)
