"""BatchPrefetcher tests — ordering, stall accounting, failure propagation
(the host-side pipelining the reference gets from DataLoader workers,
train.py:341-352)."""
import time

import pytest

from adascale.data.prefetch import BatchPrefetcher


def test_prefetch_order_and_accounting():
    counter = {"n": 0}

    def make_batch():
        v = counter["n"]
        counter["n"] += 1
        return v

    pf = BatchPrefetcher(make_batch, depth=2)
    got = [pf.get() for _ in range(8)]
    assert got == list(range(8))
    assert pf.batches_served == 8
    pf.reset_stall_accounting()
    assert pf.stall_seconds == 0.0 and pf.batches_served == 0
    pf.stop()


def test_prefetch_overlaps_slow_producer():
    def make_batch():
        time.sleep(0.05)
        return 1

    pf = BatchPrefetcher(make_batch, depth=2)
    # Let the queue fill while the consumer is "computing".
    time.sleep(0.3)
    t0 = time.perf_counter()
    pf.get()
    first_wait = time.perf_counter() - t0
    assert first_wait < 0.04  # already queued -> no stall
    pf.stop()


def test_prefetch_propagates_exceptions():
    state = {"n": 0}

    def make_batch():
        if state["n"] >= 1:
            raise ValueError("generator broke")
        state["n"] += 1
        return 0

    pf = BatchPrefetcher(make_batch, depth=1)
    assert pf.get() == 0
    with pytest.raises(RuntimeError, match="prefetch thread failed"):
        pf.get()
    pf.stop()


def test_prefetch_stop_idempotent():
    pf = BatchPrefetcher(lambda: 0, depth=1)
    pf.get()
    pf.stop()
    pf.stop()
