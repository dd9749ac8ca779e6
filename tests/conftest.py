"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic
runs on any host (the TPU-equivalent of the reference's rank/world-size
parameterized sampler tests, SURVEY.md §4).

Note: the driver environment registers a TPU backend at interpreter startup
(sitecustomize) which wins over JAX_PLATFORMS env vars, so we override via
jax.config after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # single-core CI hosts interleave the 8 virtual device threads; the
    # default 40s collective rendezvous termination timeout is too tight.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# VJEPA2_TEST_TPU=1 keeps the attached TPU backend so the hardware-gated
# tests (tests/ops/test_flash_tpu.py) actually run:
#   VJEPA2_TEST_TPU=1 pytest tests/ops/test_flash_tpu.py
# everything else expects the 8-virtual-device CPU mesh and should NOT be
# run with the override.
if not os.environ.get("VJEPA2_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
