"""Sampler tests — multi-host behavior without a cluster, via explicit
(rank, world) args (the reference's technique, SURVEY.md §4)."""

import numpy as np
import pytest

from vjepa2_tpu.data.samplers import (
    DistributedSampler,
    DistributedWeightedSampler,
    MemoryEfficientDistributedWeightedSampler,
    MemoryEfficientDistributedWeightedSamplerLessRepeat,
)


def test_distributed_sampler_partition():
    world = 4
    seen = []
    for rank in range(world):
        s = DistributedSampler(103, world, rank, seed=7)
        idx = list(s)
        assert len(idx) == s.num_samples
        seen += idx
    # covers every index (with padding duplicates allowed)
    assert set(seen) == set(range(103))


def test_distributed_sampler_epoch_changes_order():
    s = DistributedSampler(50, 2, 0, seed=3)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b
    assert sorted(set(a)) != [] and len(a) == len(b)


def test_weighted_sampler_respects_weights():
    w = np.concatenate([np.full(100, 0.9 / 100), np.full(100, 0.1 / 100)])
    counts = np.zeros(200, int)
    for rank in range(2):
        s = DistributedWeightedSampler(w, 2, rank, seed=0)
        for i in list(s):
            counts[i] += 1
    first = counts[:100].sum() / counts.sum()
    assert 0.8 < first < 0.97


def test_memory_efficient_rank_disjoint():
    """Rank stride guarantees no cross-rank duplicate draws."""
    sizes, weights = [40, 60], [0.5, 0.5]
    world = 4
    draws = {r: set() for r in range(world)}
    for r in range(world):
        s = MemoryEfficientDistributedWeightedSampler(sizes, weights, world, r, seed=0)
        for _ in range(50):
            draws[r].add(next(s))
    for a in range(world):
        for b in range(a + 1, world):
            assert not (draws[a] & draws[b]), f"ranks {a},{b} overlap"


def test_memory_efficient_no_shuffle_round_robin():
    s = MemoryEfficientDistributedWeightedSampler([10, 10], [1, 1], 2, 0, shuffle=False)
    first = [next(s) for _ in range(4)]
    # alternates datasets (offsets 0 and 10), rank-0 strided
    assert first[0] < 10 and first[1] >= 10


def test_less_repeat_cycles_permutations():
    s = MemoryEfficientDistributedWeightedSamplerLessRepeat([16, 16], [1.0, 1.0], 2, 0, seed=0)
    draws = [next(s) for _ in range(64)]
    # every drawn index belongs to rank 0's stride subset
    for d in draws:
        local = d if d < 16 else d - 16
        assert local % 2 == 0  # rank 0 of world 2
    # within ~one pass per dataset, repeats are bounded
    from collections import Counter

    c = Counter(draws)
    assert max(c.values()) <= 6


def test_integer_weights_required_when_not_shuffling():
    with pytest.raises(ValueError):
        MemoryEfficientDistributedWeightedSampler([10], [0.5], 1, 0, shuffle=False)


def test_fpc_bucket_sampler():
    from vjepa2_tpu.data.loader import FpcBucketSampler

    # indices 0-49 have fpc 16, 50-99 have fpc 8
    fpc_of = lambda i: 16 if i < 50 else 8
    src = list(range(100))
    np.random.RandomState(0).shuffle(src)
    bs = FpcBucketSampler(src, fpc_of, batch_size=4)
    batches = list(bs)
    assert all(len(b) == 4 for b in batches)
    for b in batches:
        fpcs = {fpc_of(i) for i in b}
        assert len(fpcs) == 1, f"mixed-fpc batch {b}"
    # everything except incomplete tails is emitted
    total = sum(len(b) for b in batches)
    assert total >= 96


def test_device_prefetch():
    import pytest

    from vjepa2_tpu.data.prefetch import device_prefetch

    items = [np.ones((2, 2)) * i for i in range(5)]
    for threaded in (True, False):
        out = list(device_prefetch(items, size=2, threaded=threaded))
        assert len(out) == 5
        for i, o in enumerate(out):
            assert float(np.asarray(o)[0, 0]) == i
        # with a transform
        out2 = list(device_prefetch(items, size=3, transform=lambda x: x * 2,
                                    threaded=threaded))
        assert float(np.asarray(out2[1])[0, 0]) == 2.0

    # producer exceptions surface on the consuming thread, after the
    # already-staged items drain
    def boom():
        yield np.zeros((2, 2))
        yield np.ones((2, 2))
        raise RuntimeError("decode failed")

    it = device_prefetch(boom(), size=2)
    assert float(np.asarray(next(it))[0, 0]) == 0.0
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)

    # early consumer exit stops the producer thread (no hang on the
    # bounded queue even with an infinite source)
    import itertools
    import threading
    import time

    def prefetch_threads():
        # track the producer thread BY NAME: global active_count() is flaky
        # (JAX runtime / pytest plugin threads can start mid-test)
        return [t for t in threading.enumerate()
                if t.name.startswith("device-prefetch")]

    before = prefetch_threads()
    gen = device_prefetch(
        (np.full((1,), i) for i in itertools.count()), size=1)
    assert float(np.asarray(next(gen))[0]) == 0.0
    assert len(prefetch_threads()) == len(before) + 1
    gen.close()
    deadline = time.time() + 10
    while len(prefetch_threads()) > len(before) and time.time() < deadline:
        time.sleep(0.05)
    assert len(prefetch_threads()) <= len(before), "prefetch thread leaked"
