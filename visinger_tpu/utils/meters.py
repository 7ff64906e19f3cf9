"""Running-average meters and device-synchronized timers.

Parity target: reference utils/commons/meters.py (AvgrageMeter, the
CUDA-synchronized Timer) — the timer here blocks on jax async dispatch
instead of cuda.synchronize, making it a correct wall-clock probe around
jitted calls.
"""

from __future__ import annotations

import time
from collections import defaultdict


class AvgMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.avg, self.sum, self.cnt = 0.0, 0.0, 0

    def update(self, val: float, n: int = 1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / self.cnt


class Timer:
    """Accumulating named timer; `sync=True` drains the jax dispatch queue on
    both edges so the measured span is device wall-clock."""

    timer_map: dict[str, float] = defaultdict(float)

    def __init__(self, name: str, sync: bool = False, print_time: bool = False):
        self.name = name
        self.sync = sync
        self.print_time = print_time

    def _barrier(self):
        if self.sync:
            import jax

            (jax.device_put(0.0) + 0).block_until_ready()

    def __enter__(self):
        self._barrier()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._barrier()
        Timer.timer_map[self.name] += time.perf_counter() - self.t0
        if self.print_time:
            print(self.name, round(Timer.timer_map[self.name], 4))
