"""Device prefetch: overlap host work and H2D transfer with device compute.

The reference relies on pinned-memory + non_blocking H2D copies
(`app/vjepa/train.py:393-400`); the JAX equivalent keeps a small queue of
batches already `device_put` while the current step executes.

The default is a PRODUCER THREAD: decode/transform/`device_put` all happen
off the training thread, so on hosts where the loader is inline
(num_workers=0 — the fastest configuration on 1-core machines) the batch
pipeline still overlaps the device step. Decode (native libav), numpy
transforms, and the device_put RPC all release the GIL, and the training
thread is idle waiting on the device for most of each step, so one thread
is enough to hide the host time up to ~one full step per batch.
"""

from __future__ import annotations

import collections
import queue as _queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def _stage(item, transform, sharding):
    if transform is not None:
        item = transform(item)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, item
    )


def device_prefetch(
    iterator: Iterable,
    size: int = 2,
    transform: Optional[Callable] = None,
    sharding=None,
    threaded: bool = True,
) -> Iterator:
    """Yield items with up to ``size`` already transferred to device.

    transform: host-side fn applied before transfer (e.g., collate/cast).
    sharding: optional jax.sharding.Sharding for the device_put.
    threaded: stage batches on a producer thread (overlaps host work with
        device compute even when the loader itself is in-process). False
        restores the synchronous look-ahead (host work runs on the calling
        thread between yields — only the transfer-ahead overlap remains).
    """
    if not threaded:
        yield from _sync_prefetch(iterator, size, transform, sharding)
        return

    q: _queue.Queue = _queue.Queue(maxsize=max(1, size))
    stop = threading.Event()
    sentinel = object()
    failure: list[BaseException] = []

    def _put(item) -> bool:
        # bounded-blocking put that aborts if the consumer went away
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except _queue.Full:
                continue
        return False

    def producer():
        try:
            for raw in iterator:
                if not _put(_stage(raw, transform, sharding)):
                    return
        except BaseException as e:  # noqa: BLE001 — repropagated below
            failure.append(e)
        finally:
            _put(sentinel)

    thread = threading.Thread(target=producer, daemon=True, name="device-prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
        # drain anything the producer managed to enqueue between the
        # consumer's exit and stop being observed — releases already-staged
        # device buffers (HBM) promptly instead of holding them until GC
        try:
            while True:
                q.get_nowait()
        except _queue.Empty:
            pass


def _sync_prefetch(iterator, size, transform, sharding):
    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(_stage(next(it), transform, sharding))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(_stage(next(it), transform, sharding))
        except StopIteration:
            pass
        yield out
