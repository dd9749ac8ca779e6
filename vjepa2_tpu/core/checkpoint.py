"""Checkpoint save/restore via Orbax (replaces torch.save single-file ckpts).

The reference saves `latest.pt` each epoch + periodic `e{N}.pt`
(`app/vjepa/train.py:315-333`) and *replays* schedulers on resume. Here the
whole TrainState (params, EMA target, optax state incl. step counts) is one
pytree — resume restores everything exactly; schedules are pure functions of
the restored step. Orbax writes are async-capable and multi-host-safe.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval_steps: int = 1,
                 keep_period: Optional[int] = None):
        """keep_period: steps divisible by it are kept FOREVER, outside the
        rolling max_to_keep window — the reference's permanent ``e{N}.pt``
        every ``save_every_freq`` epochs (`app/vjepa/train.py:516-521`)."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            keep_period=keep_period,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot param save (hub-style release artifacts)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Optional[Any] = None, retries: int = 3, backoff: float = 2.0) -> Any:
    """Param restore with exponential-backoff retry (reference
    `src/utils/checkpoint_loader.py:19-37` wraps flaky storage the same way)."""
    import time

    ckptr = ocp.StandardCheckpointer()
    last = None
    for attempt in range(retries):
        try:
            return ckptr.restore(os.path.abspath(path), target=template)
        except (OSError, ValueError) as e:
            last = e
            time.sleep(backoff**attempt)
    raise last
