"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints
(``train.py:102,173,193``). Here: a ``jax.profiler`` trace context manager
(view in TensorBoard/XProf or Perfetto) plus a throughput meter that tracks
the framework's north-star metric, audio-seconds per second per chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Sliding throughput counters for the training loop."""

    def __init__(self, window_audio_s: float, samples_per_step: int, n_chips: int = 1):
        self.window_audio_s = window_audio_s
        self.samples_per_step = samples_per_step
        self.n_chips = max(1, n_chips)
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1) -> None:
        self._steps += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def audio_seconds_per_second_per_chip(self) -> Optional[float]:
        if self._steps == 0 or self.elapsed <= 0:
            return None
        audio = self._steps * self.samples_per_step * self.window_audio_s
        return audio / self.elapsed / self.n_chips

    def steps_per_second(self) -> Optional[float]:
        if self._steps == 0 or self.elapsed <= 0:
            return None
        return self._steps / self.elapsed
