"""Profiling: per-stage wall-clock timers and jax.profiler traces.

The reference instruments the epoch loop with ``std::chrono`` and prints
``temps:`` in ms (``processing/CPP/main.cpp:462-516``); its benchmark
methodology is the 4-language table of
``experiments/221219_twoway/README.md:30-39``.  Here: a stage timer with
device synchronization (on the axon relay only a device->host transfer
truly synchronizes — ``block_until_ready`` does not) and an optional
``jax.profiler`` trace context.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

__all__ = ["StageTimer", "device_sync", "trace"]


def device_sync(x) -> None:
    """Force completion of a device value: a tiny d2h transfer.

    ``jax.block_until_ready`` returns early through the axon relay; the
    transfer of one element is the reliable fence.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    >>> t = StageTimer()
    >>> with t.stage("fft"):
    ...     y = do_work()
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]*1e3:.1f} ms "
                f"({self.counts[name]}x)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str | None):
    """``jax.profiler`` trace context (no-op when ``logdir`` is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
