"""Host resource monitoring (reference `src/utils/monitoring.py:44-160`,
`src/datasets/utils/dataloader.py:68-141`).

A daemon thread samples psutil counters (cpu%, rss, io, ctx switches) every
``interval`` seconds into a buffered CSV — used to watch data-loader workers
feeding the TPU. TPU-side profiling is `jax.profiler` (see `start_trace`)."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass
from typing import Optional

try:
    import psutil
except Exception:  # pragma: no cover
    psutil = None


@dataclass
class ResourceSnapshot:
    ts: float
    cpu_percent: float
    rss_mb: float
    read_mb: float
    write_mb: float
    ctx_switches: int


class ResourceMonitoringThread(threading.Thread):
    def __init__(self, out_csv: str, interval: float = 5.0, pid: Optional[int] = None):
        super().__init__(daemon=True)
        if psutil is None:
            raise ImportError("psutil required for resource monitoring")
        self.proc = psutil.Process(pid or os.getpid())
        self.out_csv = out_csv
        self.interval = interval
        self._stop = threading.Event()
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        with open(out_csv, "a") as f:
            f.write("ts,cpu_percent,rss_mb,read_mb,write_mb,ctx_switches\n")

    def snapshot(self) -> ResourceSnapshot:
        with self.proc.oneshot():
            cpu = self.proc.cpu_percent()
            rss = self.proc.memory_info().rss / 1e6
            try:
                io = self.proc.io_counters()
                rd, wr = io.read_bytes / 1e6, io.write_bytes / 1e6
            except Exception:
                rd = wr = 0.0
            ctx = sum(self.proc.num_ctx_switches())
        return ResourceSnapshot(time.time(), cpu, rss, rd, wr, ctx)

    def run(self):
        while not self._stop.wait(self.interval):
            s = self.snapshot()
            with open(self.out_csv, "a") as f:
                f.write(
                    f"{s.ts:.1f},{s.cpu_percent:.1f},{s.rss_mb:.1f},"
                    f"{s.read_mb:.1f},{s.write_mb:.1f},{s.ctx_switches}\n"
                )

    def stop(self):
        self._stop.set()


def start_trace(log_dir: str):
    """Start a jax profiler trace (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)


def stop_trace():
    import jax

    jax.profiler.stop_trace()
