"""Profiling & observability helpers.

Reference: the Timer context with cuda synchronize bracketing (utils.py:25-36)
and per-question wall timing in the eval scripts (gen_spec_answer_sqa.py:
264-276).  On TPU the analogue is block_until_ready bracketing plus
`jax.profiler` trace capture for kernel-level breakdowns.
"""

from __future__ import annotations

import contextlib
import time
import jax


class Timer:
    """`with Timer("verify"):` — device-synchronized wall timing."""

    def __init__(self, name: str, sync_on=None, silent: bool = False):
        self.name = name
        self.sync_on = sync_on
        self.silent = silent
        self.elapsed = 0.0

    def __enter__(self):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.elapsed = time.perf_counter() - self.start
        if not self.silent:
            print(f"{self.name} took {self.elapsed:.6f} seconds")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vispec_trace"):
    """Capture a jax.profiler trace around a block (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort HBM usage of the first device."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}
