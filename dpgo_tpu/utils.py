"""Small shared utilities.

`Stopwatch` reproduces the reference's Optimization::Util::Stopwatch
tick/tock chrono wrapper (Optimization/Util/Stopwatch.h:15-29) — the timer
behind every reported time in the reference driver (dist_pgo.cpp:496-521).
On an accelerator behind the axon tunnel, `tock(sync=...)` accepts a device
array to device_get first, because `jax.block_until_ready` can return before
remote execution completes (see CLAUDE.md gotchas).
"""

from __future__ import annotations

import time

import numpy as np


class Stopwatch:
    """tick()/tock() wall-clock timer; tock returns seconds since tick."""

    def __init__(self):
        self._t0 = None

    def tick(self) -> None:
        self._t0 = time.perf_counter()

    def tock(self, sync=None) -> float:
        if sync is not None:
            np.asarray(sync)  # device_get: the only reliable tunnel sync
        if self._t0 is None:
            raise RuntimeError("tock() before tick()")
        return time.perf_counter() - self._t0
