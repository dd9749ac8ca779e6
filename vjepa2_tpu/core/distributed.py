"""Multi-host initialization (reference `src/utils/distributed.py:init_distributed`).

The reference rendezvouses NCCL via env vars + SLURM and a fixed port. The
JAX equivalent is `jax.distributed.initialize`: every host connects to a
coordinator, after which `jax.devices()` spans the slice/pod and the same
mesh code runs unchanged. On single-host (or TPU-VM auto-detected) setups
this is a no-op.
"""

from __future__ import annotations

import os
import re
from typing import Mapping, Optional

import jax

# the reference rendezvouses on a fixed port (`src/utils/distributed.py:17`)
DEFAULT_COORDINATOR_PORT = 37129


def first_slurm_host(nodelist: str) -> str:
    """First hostname of a SLURM compressed nodelist.

    Handles 'node001', 'node[001-004]', 'node[3,7-9]', 'a[1-2],b[5]' — the
    formats `scontrol show hostnames` would expand (the reference instead
    relies on MASTER_ADDR/HOSTNAME being pre-set by its launcher).
    """
    first = nodelist.split(",")[0]
    m = re.match(r"^([^\[]+)\[([0-9]+)", first)
    if m:
        return m.group(1) + m.group(2)
    return first.split("[")[0]


def resolve_cluster(env: Mapping[str, str]) -> tuple[Optional[str], Optional[int], Optional[int]]:
    """(coordinator_address, num_processes, process_id) from scheduler envs.

    Priority: explicit JAX_* overrides > SLURM > Kubernetes/GKE JobSet >
    none (single host or TPU-pod auto-detection). Pure function of ``env``
    so multi-scheduler behavior is testable without a cluster (the same
    trick the reference's sampler tests use for rank/world, SURVEY.md §4).
    """
    coord = env.get("JAX_COORDINATOR_ADDRESS")
    num = int(env["JAX_NUM_PROCESSES"]) if env.get("JAX_NUM_PROCESSES") else None
    pid = int(env["JAX_PROCESS_ID"]) if env.get("JAX_PROCESS_ID") else None
    if coord or num is not None or pid is not None:
        # any JAX_* variable enters the override branch; a partial set is a
        # config error, not something to silently fall through to SLURM/GKE
        if num is not None and (coord is None or pid is None):
            raise ValueError(
                "Partial JAX_* cluster override: set JAX_COORDINATOR_ADDRESS, "
                f"JAX_NUM_PROCESSES and JAX_PROCESS_ID together (got coord={coord!r}, "
                f"num={num!r}, pid={pid!r})"
            )
        if pid is not None and num is None:
            raise ValueError(
                "JAX_PROCESS_ID set without JAX_NUM_PROCESSES/JAX_COORDINATOR_ADDRESS"
            )
        return coord, num, pid

    # SLURM (reference reads SLURM_NTASKS/SLURM_PROCID,
    # `src/utils/distributed.py:32-45`)
    if env.get("SLURM_PROCID") is not None and env.get("SLURM_NTASKS"):
        nodelist = env.get("SLURM_STEP_NODELIST") or env.get("SLURM_JOB_NODELIST", "")
        coord = env.get("MASTER_ADDR") or (first_slurm_host(nodelist) if nodelist else None)
        if coord and ":" not in coord:
            coord = f"{coord}:{env.get('MASTER_PORT', DEFAULT_COORDINATOR_PORT)}"
        return coord, int(env["SLURM_NTASKS"]), int(env["SLURM_PROCID"])

    # Kubernetes / GKE JobSet (TPU multi-host GKE sets JOB_COMPLETION_INDEX
    # per pod; the coordinator is pod 0 behind a headless service)
    if env.get("JOB_COMPLETION_INDEX") is not None and env.get("NUM_PROCESSES"):
        coord = env.get("COORDINATOR_ADDRESS")
        if coord and ":" not in coord:
            coord = f"{coord}:{env.get('COORDINATOR_PORT', DEFAULT_COORDINATOR_PORT)}"
        return coord, int(env["NUM_PROCESSES"]), int(env["JOB_COMPLETION_INDEX"])

    return None, None, None


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize multi-host JAX. Returns (process_index, process_count).

    Arguments may come from the CLI, from scheduler envs (JAX_* overrides,
    SLURM, GKE JobSet — see `resolve_cluster`), or on TPU pods from jax
    auto-detection with all three None.
    """
    if coordinator_address is None and num_processes is None and process_id is None:
        coordinator_address, num_processes, process_id = resolve_cluster(os.environ)

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
