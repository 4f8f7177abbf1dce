"""Tests for the prefetching pipeline."""

import time

import numpy as np
import pytest

from votenet_tpu.data.prefetch import ParallelSceneLoader, PrefetchIterator, prefetch


class TestPrefetchIterator:
    def test_preserves_items_and_order(self):
        items = list(range(100))
        assert list(prefetch(iter(items))) == items

    def test_overlaps_producer_and_consumer(self):
        def slow_gen():
            for i in range(6):
                time.sleep(0.05)
                yield i

        t0 = time.time()
        for _ in prefetch(slow_gen(), buffer_size=8):
            time.sleep(0.05)  # consumer work overlaps producer work
        elapsed = time.time() - t0
        assert elapsed < 0.55  # serial would be ~0.6s

    def test_propagates_exceptions(self):
        def bad_gen():
            yield 1
            raise ValueError("boom")

        it = prefetch(bad_gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            list(it)

    def test_empty(self):
        assert list(prefetch(iter([]))) == []


def _square(i):
    return i * i if i % 2 == 0 else None  # odd ids filtered like empty scenes


class TestParallelSceneLoader:
    def test_serial(self):
        out = sorted(ParallelSceneLoader(_square, range(10), num_workers=0))
        assert out == [0, 4, 16, 36, 64]

    def test_parallel(self):
        out = sorted(ParallelSceneLoader(_square, range(10), num_workers=2))
        assert out == [0, 4, 16, 36, 64]
