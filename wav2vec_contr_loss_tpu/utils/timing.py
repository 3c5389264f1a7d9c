"""Step timing / throughput instrumentation.

The reference has no profiling beyond tqdm bars and SLURM wall clocks
(SURVEY.md §5). Here: a `block_until_ready`-based step timer reporting
clips/sec/chip (the BASELINE.md north-star metric), plus a context-manager
hook for `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax

__all__ = ["StepTimer", "Throughput", "profiler_trace"]


class StepTimer:
    """Wall-clock timer that synchronizes on device outputs."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync_on) -> float:
        for x in sync_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self, drop_first: int = 1) -> dict:
        ts = self.times[drop_first:] if len(self.times) > drop_first else self.times
        if not ts:
            return {"mean_s": 0.0, "min_s": 0.0, "steps": 0}
        return {
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "steps": len(ts),
        }


class Throughput:
    """clips/sec (/chip) accumulator over train steps."""

    def __init__(self, clips_per_step: int, n_chips: int = 1):
        self.clips_per_step = clips_per_step
        self.n_chips = max(1, n_chips)
        self.timer = StepTimer()

    def start(self):
        self.timer.start()

    def stop(self, *sync_on):
        return self.timer.stop(*sync_on)

    def clips_per_sec(self, drop_first: int = 1) -> float:
        s = self.timer.summary(drop_first)
        return 0.0 if s["mean_s"] == 0 else self.clips_per_step / s["mean_s"]

    def clips_per_sec_per_chip(self, drop_first: int = 1) -> float:
        return self.clips_per_sec(drop_first) / self.n_chips


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
