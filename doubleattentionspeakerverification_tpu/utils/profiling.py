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


class StepProfiler:
    """Trace a window of optimizer steps to ``log_dir``.

    The reference has no profiler at all (SURVEY §5); here a bounded
    ``jax.profiler`` capture of steps ``[start_step, start_step+num_steps)``
    — long enough to see steady-state fusion/overlap in XProf/Perfetto,
    short enough not to distort a production run. Call :meth:`before_step`
    at the top of the step loop with the upcoming step index; pass the
    previous step's device metrics as ``sync`` so the capture closes only
    after real device work (on relayed backends ``block_until_ready`` does
    not wait — a host read does).
    """

    def __init__(self, log_dir: str, start_step: int, num_steps: int):
        self.log_dir = log_dir
        self.start = start_step
        self.num_steps = max(1, num_steps)
        self.active = False
        self.done = not log_dir

    def _sync(self, sync) -> None:
        if sync is not None:
            import numpy as np

            np.asarray(sync)  # host read = true device sync

    def before_step(self, step: int, sync=None) -> Optional[str]:
        """Returns 'started' / 'stopped' on transitions, else None."""
        if self.done:
            return None
        import jax

        if not self.active and step >= self.start:
            jax.profiler.start_trace(self.log_dir)
            self.active = True
            return "started"
        if self.active and step >= self.start + self.num_steps:
            self._sync(sync)
            jax.profiler.stop_trace()
            self.active = False
            self.done = True
            return "stopped"
        return None

    def close(self, sync=None) -> None:
        """Stop a still-open capture (training ended inside the window)."""
        if self.active:
            import jax

            self._sync(sync)
            jax.profiler.stop_trace()
            self.active = False
            self.done = True


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
