"""Bounded background prefetch for the training input pipeline.

The TPU-native stand-in for the reference's DataLoader worker processes
(reference basics/base_task.py:346, ``num_workers=ds_workers``): instead of
process fan-out, a daemon thread runs one pipeline stage ahead of the
consumer through a bounded queue. Two chained stages split the host work by
resource — CPU collate on one thread, host→device commit (`jax.device_put`,
which waits on DMA/network, releasing the GIL) on another — so batch k+2 is
collated while batch k+1 uploads and batch k computes on the device
(measured overlap: docs/perf/overlap_probe.json).

Queue depth bounds both host memory and device HBM held by staged batches;
dispatch depth is unaffected (the training loop still holds at most one
in-flight step — see training/base_task.py backpressure notes).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class PrefetchIterator(Iterator):
    """Iterate ``it`` on a daemon thread, keeping up to ``depth`` items ready.

    - Order-preserving (FIFO).
    - Exceptions raised by the producer re-raise at the consumer.
    - ``close()`` stops the producer and unblocks chained stages; iterating a
      closed prefetcher ends (StopIteration).
    """

    _END = object()

    def __init__(self, it: Iterable, depth: int = 2, name: str = "ds-prefetch"):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = threading.Event()
        self._err: BaseException | None = None

        def _put(item) -> bool:
            """Blocking put that aborts when close() is requested."""
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def _work():
            try:
                for item in it:
                    if not _put(item):
                        return
            except BaseException as e:  # noqa: BLE001 — propagate to consumer
                self._err = e
            finally:
                _put(self._END)

        self._t = threading.Thread(target=_work, daemon=True, name=name)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            self._q.put(self._END)  # stay terminated on repeated next()
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            raise StopIteration
        return item

    def close(self):
        """Stop the producer thread and release queued items.

        Safe against a producer blocked mid-put: drain, then signal END so
        any chained downstream stage also terminates.
        """
        self._stop.set()
        for _ in range(200):  # retries cover an in-flight producer put
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            try:
                self._q.put_nowait(self._END)
                break
            except queue.Full:
                continue
        self._t.join(timeout=5.0)
