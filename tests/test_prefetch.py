"""Ordered background prefetching."""

import threading
import time

import pytest

from kmers_anno_tpu.utils.prefetch import Prefetcher, prefetch_map


def test_order_preserved():
    items = list(range(50))
    got = list(prefetch_map(items, lambda x: x * x, depth=3, workers=4))
    assert got == [x * x for x in items]


def test_exception_propagates_in_position():
    def load(x):
        if x == 5:
            raise ValueError("boom")
        return x

    out = []
    with pytest.raises(ValueError, match="boom"):
        for v in prefetch_map(range(10), load, depth=2, workers=2):
            out.append(v)
    assert out == [0, 1, 2, 3, 4]


def test_depth_bounds_lookahead():
    max_ahead = [0]
    consumed = [0]
    lock = threading.Lock()

    def load(x):
        with lock:
            max_ahead[0] = max(max_ahead[0], x - consumed[0])
        return x

    for v in Prefetcher(range(100), load, depth=3, workers=2):
        consumed[0] = v + 1
        time.sleep(0.001)
    # claimed index never runs more than depth + workers past the consumer
    assert max_ahead[0] <= 3 + 2 + 1


def test_empty_and_single():
    assert list(prefetch_map([], lambda x: x)) == []
    assert list(prefetch_map([7], lambda x: x + 1)) == [8]
