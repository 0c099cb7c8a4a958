"""Prefetch pipeline tests: ordering, exceptions, early close, and real
producer/consumer overlap."""

import time

import pytest

from vstar_tpu.data.prefetch import PrefetchIterator, prefetch, prefetch_map


def test_prefetch_preserves_order_and_stops():
    out = list(prefetch(iter(range(20)), depth=3))
    assert out == list(range(20))


def test_prefetch_propagates_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("producer died")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="producer died"):
        next(it)
    with pytest.raises(StopIteration):
        next(it)


def test_prefetch_close_midway_releases_thread():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()
    assert not it._thread.is_alive()
    assert len(produced) < 1000  # did not drain the epoch


def test_prefetch_overlaps_producer_with_consumer():
    # 6 batches x 30ms producer + 6 x 30ms consumer: serial = ~360ms,
    # overlapped ~190ms. Assert well under serial (generous margin for CI).
    def gen():
        for i in range(6):
            time.sleep(0.03)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(gen(), depth=2):
        time.sleep(0.03)
    dt = time.perf_counter() - t0
    assert dt < 0.31, f"no overlap: {dt:.3f}s"


def test_prefetch_map_ordered_and_parallel():
    def slow_square(x):
        time.sleep(0.02)
        return x * x

    t0 = time.perf_counter()
    out = list(prefetch_map(slow_square, range(10), workers=4, depth=8))
    dt = time.perf_counter() - t0
    assert out == [x * x for x in range(10)]
    assert dt < 0.15, f"not parallel: {dt:.3f}s"  # serial would be ~0.2s


def test_prefetch_map_exception_propagates():
    def boom(x):
        if x == 3:
            raise RuntimeError("bad sample")
        return x

    out = []
    with pytest.raises(RuntimeError, match="bad sample"):
        for v in prefetch_map(boom, range(6), workers=2, depth=2):
            out.append(v)
    assert out == [0, 1, 2]


def test_prefetch_iterator_reentrant_epochs():
    # the trainer builds one PrefetchIterator per epoch; partial
    # consumption then close must leave no residue for the next epoch
    for _ in range(3):
        it = PrefetchIterator(iter(range(50)), depth=2)
        assert [next(it) for _ in range(5)] == list(range(5))
        it.close()
