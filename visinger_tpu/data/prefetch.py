"""Background-thread batch prefetcher.

The reference overlaps host data work with device compute via torch
DataLoader workers (ds_workers); here a single producer thread builds the
next batches (decode + collate + pad) while the device runs the current
step.  jax dispatch is async, so together with the dataset RAM cache this
hides essentially all host-side batch time.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate `iterable` on a daemon thread, `depth` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
