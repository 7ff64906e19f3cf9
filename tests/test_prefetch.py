"""Prefetcher correctness: termination, ordering, error propagation.

Regression tests for the round-2 review finding: the producer's
end-of-iteration sentinel was dropped (put_nowait + queue.Full pass) when
the consumer lagged, hanging the consumer forever in q.get().
"""

import time

import pytest

from visinger_tpu.data.prefetch import prefetch


def test_prefetch_yields_all_items_in_order():
    assert list(prefetch(range(50), depth=2)) == list(range(50))


def test_prefetch_slow_consumer_terminates():
    """Producer finishes while the depth-2 queue is full (consumer slower
    than producer) — the sentinel must still arrive."""
    out = []
    for item in prefetch(range(5), depth=2):
        time.sleep(0.05)  # let the producer fill the queue and finish
        out.append(item)
    assert out == list(range(5))


def test_prefetch_propagates_producer_exception_to_slow_consumer():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    out = []
    with pytest.raises(RuntimeError, match="boom"):
        for item in prefetch(gen(), depth=1):
            time.sleep(0.05)
            out.append(item)
    assert out == [1, 2]


def test_prefetch_consumer_abandons_early():
    """Generator close must unblock the producer (no dangling put)."""
    it = prefetch(range(100), depth=2)
    assert next(it) == 0
    it.close()  # must not hang or leak a blocked thread
