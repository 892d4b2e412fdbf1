"""Lightweight observability: counters + stage timers + profiler hook.

SURVEY.md section 5: the reference has log-field timings only (its
ComputationTime is a dead stub); the rebuild adds real counters
(frames/sec, bytes) and wall-clock stage timing around pipeline stages,
plus a jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class Metrics:
    """Thread-safe counters + timing accumulators."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = defaultdict(float)
        self._timings: Dict[str, list] = defaultdict(list)

    def count(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    @contextlib.contextmanager
    def timer(self, stage: str, block_on=None) -> Iterator[None]:
        """Wall-clock a stage; pass a jax array/pytree as `block_on` to
        include device completion in the measurement."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            with self._lock:
                self._timings[stage].append(time.perf_counter() - t0)

    def record_audio(self, seconds: float, frames: int = 0) -> None:
        self.count("audio_seconds", seconds)
        self.count("frames", frames)

    def snapshot(self) -> dict:
        with self._lock:
            out = {"counters": dict(self._counters), "stages": {}}
            for stage, ts in self._timings.items():
                total = sum(ts)
                out["stages"][stage] = {
                    "calls": len(ts),
                    "total_s": total,
                    "mean_ms": total / len(ts) * 1000 if ts else 0.0,
                }
            audio_s = self._counters.get("audio_seconds", 0.0)
            wall = sum(sum(ts) for ts in self._timings.values())
            if wall > 0 and audio_s > 0:
                out["throughput_audio_hours_per_hour"] = audio_s / wall
            if wall > 0 and self._counters.get("frames"):
                out["frames_per_sec"] = self._counters["frames"] / wall
            return out

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._timings.clear()


_global = Metrics()


def get_global_metrics() -> Metrics:
    return _global


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (SURVEY.md section 5 tracing plan)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
