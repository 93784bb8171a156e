"""Background-thread prefetching loader.

The reference uses torch DataLoader workers (train_ds.py:381-393 via the
DeepSpeed engine). Here a thread pool builds collated numpy batches ahead
of the device while the TPU computes — double-buffered host->HBM
(BASELINE.json: "double-buffered prefetch")."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class PrefetchLoader:
    def __init__(self, make_batch: Callable[[int], dict],
                 num_batches: int, prefetch: int = 2):
        self.make_batch = make_batch
        self.num_batches = num_batches
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        try:
            for i in range(self.num_batches):
                self.q.put(self.make_batch(i))
            self.q.put(None)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
            self.q.put(None)

    def __iter__(self) -> Iterator[dict]:
        while True:
            item = self.q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item
