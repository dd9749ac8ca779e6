"""Device prefetch: overlap host->device transfer with device compute.

The reference relies on pinned-memory + non_blocking H2D copies
(`app/vjepa/train.py:393-400`); the JAX equivalent keeps a small queue of
batches already `device_put` while the current step executes.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional

import jax


def device_prefetch(
    iterator: Iterable,
    size: int = 2,
    transform: Optional[Callable] = None,
    sharding=None,
) -> Iterator:
    """Yield items with up to ``size`` already transferred to device.

    transform: host-side fn applied before transfer (e.g., collate/cast).
    sharding: optional jax.sharding.Sharding for the device_put.
    """
    queue = collections.deque()

    def put(item):
        if transform is not None:
            item = transform(item)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, item
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
