"""Multiprocess prefetching data loader (host side).

Replaces torch DataLoader + the reference's `NondeterministicDataLoader`
(`src/datasets/utils/dataloader.py:144-223`): worker processes decode +
transform; the main process collates per-fpc batches. ``ordered=False``
returns batches as workers finish (out-of-order, kills head-of-line blocking
— the reference's "sloppy" iterator); ``ordered=True`` reorders.

The mask collator runs in the *trainer* (cheap numpy), not in workers — the
reference needed a shared mp.Value to sync per-step block sizes across
workers (`src/masks/multiseq_multiblock3d.py:119-127`); sampling masks on the
main process removes that race by construction.
"""

from __future__ import annotations

import itertools
import multiprocessing as mp
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def default_collate(samples):
    """Collate [(clips_list, label, clip_indices), ...] -> batched numpy.

    Returns (clips [num_clips][B,T,H,W,C], labels [B], clip_indices)."""
    num_clips = len(samples[0][0])
    clips = [np.stack([s[0][c] for s in samples]) for c in range(num_clips)]
    labels = np.asarray([s[1] for s in samples])
    clip_indices = [np.stack([np.asarray(s[2][c]) for s in samples]) for c in range(len(samples[0][2]))]
    return clips, labels, clip_indices


class FpcBucketSampler:
    """Wraps an index sampler so every emitted batch has ONE frames-per-clip.

    The reference's MaskCollator splits a mixed batch into per-fpc
    sub-batches of different sequence lengths inside one step
    (`src/masks/multiseq_multiblock3d.py:57-74`); under jit one shape = one
    program, so we instead bucket *upstream*: indices accumulate per fpc and
    a batch is released when its bucket fills. Statistically equivalent for
    weighted infinite samplers (each step still draws one fpc's batch with
    probability proportional to its sampling mass).
    """

    def __init__(self, sampler, fpc_of_index, batch_size: int):
        self.sampler = sampler
        self.fpc_of_index = fpc_of_index
        self.batch_size = batch_size

    def __iter__(self):
        buckets: dict[int, list[int]] = {}
        for idx in self.sampler:
            fpc = self.fpc_of_index(idx)
            b = buckets.setdefault(fpc, [])
            b.append(idx)
            if len(b) == self.batch_size:
                yield list(b)
                b.clear()


def _worker_loop(dataset, index_queue, result_queue, seed, monitor_dir=None, worker_id=0, rank=0):
    # Rank-aware, collision-free worker seeding: distinct streams per
    # (base_seed, rank, worker) — replaces the reference's Lightning LCG
    # sequence (`src/datasets/utils/worker_init_fn.py:33-76`), which exists
    # for exactly this cross-host collision problem.
    ss = np.random.SeedSequence([seed, rank, worker_id])
    np.random.seed(ss.generate_state(4))
    if monitor_dir is not None:
        # per-worker psutil sampling (reference `MonitoredDataset`,
        # `src/datasets/utils/dataloader.py:68-141`)
        try:
            from vjepa2_tpu.core.monitoring import ResourceMonitoringThread

            ResourceMonitoringThread(
                f"{monitor_dir}/worker_{worker_id}.csv", interval=5.0
            ).start()
        except Exception:
            pass
    while True:
        item = index_queue.get()
        if item is None:
            return
        batch_id, indices = item
        try:
            samples = [dataset[i] for i in indices]
            result_queue.put((batch_id, samples, None))
        except Exception as e:  # pragma: no cover
            result_queue.put((batch_id, None, e))


class DataLoader:
    def __init__(
        self,
        dataset,
        sampler: Iterable[int],
        batch_size: int,
        num_workers: int = 0,
        collate_fn: Callable = default_collate,
        drop_last: bool = True,
        ordered: bool = False,
        prefetch_factor: int = 2,
        seed: int = 0,
        epoch_len: Optional[int] = None,
        batch_sampler: Optional[Iterable[list[int]]] = None,
        monitor_dir: Optional[str] = None,
        rank: int = 0,
        mp_context: str = "spawn",
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.collate_fn = collate_fn
        self.drop_last = drop_last
        self.ordered = ordered
        self.prefetch_factor = prefetch_factor
        self.seed = seed
        self.epoch_len = epoch_len
        self.batch_sampler = batch_sampler
        self.monitor_dir = monitor_dir
        self.rank = rank
        self.mp_context = mp_context

    def _batched_indices(self) -> Iterator[list[int]]:
        if self.batch_sampler is not None:
            it = iter(self.batch_sampler)
            for n, batch in enumerate(it):
                if self.epoch_len is not None and n >= self.epoch_len:
                    return
                yield batch
            return
        it = iter(self.sampler)
        n = 0
        while True:
            if self.epoch_len is not None and n >= self.epoch_len:
                return
            batch = list(itertools.islice(it, self.batch_size))
            if len(batch) < self.batch_size:
                if batch and not self.drop_last:
                    yield batch
                return
            n += 1
            yield batch

    def __iter__(self):
        if self.num_workers == 0:
            for batch in self._batched_indices():
                yield self.collate_fn([self.dataset[i] for i in batch])
            return
        yield from self._iter_workers()

    def _iter_workers(self):
        # spawn, never fork: the trainer process holds a live (multi-threaded)
        # device runtime; forking it risks deadlock. The reference spawns for
        # the same reason (`app/main.py:82`).
        ctx = mp.get_context(self.mp_context)
        index_queue = ctx.Queue()
        result_queue = ctx.Queue()
        workers = [
            ctx.Process(
                target=_worker_loop,
                args=(self.dataset, index_queue, result_queue, self.seed,
                      self.monitor_dir, w, self.rank),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        try:
            batch_iter = enumerate(self._batched_indices())
            in_flight = 0
            max_in_flight = self.num_workers * self.prefetch_factor
            exhausted = False
            next_emit = 0
            held: dict[int, object] = {}

            def submit():
                nonlocal in_flight, exhausted
                while not exhausted and in_flight < max_in_flight:
                    try:
                        bid, idxs = next(batch_iter)
                    except StopIteration:
                        exhausted = True
                        return
                    index_queue.put((bid, idxs))
                    in_flight += 1

            submit()
            while in_flight > 0:
                bid, samples, err = result_queue.get()
                in_flight -= 1
                submit()
                if err is not None:
                    raise err
                batch = self.collate_fn(samples)
                if not self.ordered:
                    yield batch
                else:
                    held[bid] = batch
                    while next_emit in held:
                        yield held.pop(next_emit)
                        next_emit += 1
            for b in sorted(held):
                yield held[b]
        finally:
            for _ in workers:
                index_queue.put(None)
            for w in workers:
                w.join(timeout=5)
                if w.is_alive():
                    w.terminate()
