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
    """Iterate `iterable` on a daemon thread, `depth` items ahead.

    If the consumer abandons the generator early (e.g. the trainer breaks
    out at max_updates mid-epoch), generator close sets ``stop`` and drains
    the queue so the producer exits instead of blocking forever in
    ``q.put`` while pinning up to depth+1 device-resident batches.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []
    stop = threading.Event()

    def producer():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            # The sentinel MUST reach the consumer or it blocks forever in
            # q.get(); use the same stop-aware blocking loop as items (a
            # put_nowait here silently drops the sentinel whenever the
            # queue is full, i.e. whenever the producer outpaces the
            # consumer — the common case).
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # release any batches the producer already queued
            try:
                q.get_nowait()
            except queue.Empty:
                break
