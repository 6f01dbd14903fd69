"""Host->device batch prefetching.

The reference overlaps data generation with training via DataLoader worker
processes (train.py:341-352); the pool here covers the *generation* side,
but the per-batch host tail (pull pairs -> collate -> device_put/shard) was
strictly serial with the device step. ``BatchPrefetcher`` runs that tail on
a background thread with a small bounded queue, so batch N+1 is collated
and already on device while the chip runs step N. With a deep enough
generator pool this drives the train loop's data-stall time to ~0 and the
steps/s to the device-only rate.

The prefetcher also accounts its consumer-visible stall time (seconds the
train loop spent blocked waiting on a batch) so the loop can report a
data-stall fraction per epoch.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Optional


class BatchPrefetcher:
    """Runs ``make_batch()`` on a daemon thread, keeping up to ``depth``
    ready batches queued. ``get()`` blocks until a batch is ready and
    accumulates the blocked time in ``stall_seconds``.

    Exceptions in ``make_batch`` are captured and re-raised from ``get()``
    (the loop must fail loudly, mirroring the dataset's bounded-refill
    error contract, adascale/data/dataset.py).
    """

    def __init__(self, make_batch: Callable[[], Any], depth: int = 2):
        assert depth >= 1
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self.stall_seconds = 0.0
        self.batches_served = 0
        self._thread = threading.Thread(
            target=self._worker, name="batch-prefetch", daemon=True
        )
        self._thread.start()

    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                batch = self._make()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # noqa: BLE001 — surfaced via get()
            self._exc = exc

    def get(self) -> Any:
        """Next ready batch; blocks (and accounts the block) if none is."""
        t0 = time.perf_counter()
        while True:
            if self._exc is not None and self._q.empty():
                raise RuntimeError("batch prefetch thread failed") from self._exc
            try:
                batch = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                if not self._thread.is_alive() and self._exc is None:
                    raise RuntimeError("batch prefetch thread exited early")
        self.stall_seconds += time.perf_counter() - t0
        self.batches_served += 1
        return batch

    def reset_stall_accounting(self) -> None:
        self.stall_seconds = 0.0
        self.batches_served = 0

    def stop(self) -> None:
        """Stop the thread and drop queued batches."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)
