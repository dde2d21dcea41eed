"""Shared relay-robust device timing for the perf tools.

Two-point latency-corrected chains (only a host read synchronizes on the
axon relay, and each read carries a large constant RPC latency that
differencing cancels), median over repetitions (session speed drifts ~25%;
single estimates can even go negative — tools/int8_probe.py r4)."""

from __future__ import annotations

import time

import numpy as np


def timed_ms(run, k1: int = 8, k2: int = 40, reps: int = 5) -> float:
    """Median per-call milliseconds of ``run`` (a thunk returning a device
    value whose host fetch forces the sync)."""
    run()

    def chain(k):
        t0 = time.perf_counter()
        last = None
        for _ in range(k):
            last = run()
        np.asarray(last)
        return time.perf_counter() - t0

    return float(
        np.median([(chain(k2) - chain(k1)) / (k2 - k1) * 1e3 for _ in range(reps)])
    )
