"""Host data-pipeline throughput: batches/s of TrainLoader by worker count.

The jitted train step consumes one (G, B, T, 80) group per optimizer step;
the host pipeline must assemble them faster than the device consumes them
(109.8 ms/step for the flagship config on v5e — BASELINE.md). This tool
measures assembly throughput for the feature-pickle and wav sources at
several ``num_workers`` settings on synthetic data.

Usage: python tools/loader_bench.py [--steps N] [--mode features|wav|both]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_features(root: str, n_utts: int, frames: int) -> list:
    rng = np.random.default_rng(0)
    lines = []
    os.makedirs(root, exist_ok=True)
    for i in range(n_utts):
        feats = rng.standard_normal((80, frames)).astype(np.float32)
        with open(os.path.join(root, f"u{i}.pickle"), "wb") as f:
            pickle.dump(feats, f)
        lines.append(f"u{i} {i % 64} -1\n")
    return lines


def make_wavs(root: str, n_utts: int, seconds: float, sr: int = 16000) -> list:
    from doubleattentionspeakerverification_tpu.data.wav import write_wav

    rng = np.random.default_rng(0)
    lines = []
    os.makedirs(root, exist_ok=True)
    for i in range(n_utts):
        y = rng.standard_normal(int(seconds * sr)).astype(np.float32) * 0.1
        write_wav(os.path.join(root, f"u{i}.wav"), y, sr)
        lines.append(f"u{i} {i % 64} -1\n")
    return lines


def run(loader, n_steps: int) -> float:
    it = loader.epoch(0)
    next(it)  # exclude thread spin-up
    t0 = time.perf_counter()
    done = 1
    for _ in it:
        done += 1
        if done >= n_steps:
            break
    return (done - 1) / (time.perf_counter() - t0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30,
                    help="batches per measurement (first one excluded)")
    ap.add_argument("--mode", default="features",
                    choices=["features", "wav", "wav_host_dsp", "both", "all"])
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args()
    if args.steps < 2:
        ap.error("--steps must be >= 2 (the first batch is warm-up)")

    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        FeatureConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.data.dataset import (
        FeaturePickleSource,
        HostDspWavSource,
        TrainLoader,
        WavSource,
    )
    from doubleattentionspeakerverification_tpu.data.manifest import parse_train_manifest

    tc = TrainConfig(window_size=3.5, batch_size=64, gradient_accumulation=2)
    window = int(tc.window_size * 100)
    audio_s_per_batch = tc.batch_size * tc.gradient_accumulation * tc.window_size
    n_utts = args.steps * tc.batch_size * tc.gradient_accumulation

    modes = {
        "both": ["features", "wav"],
        "all": ["features", "wav", "wav_host_dsp"],
    }.get(args.mode, [args.mode])
    with tempfile.TemporaryDirectory() as tmp:
        for mode in modes:
            root = os.path.join(tmp, mode)
            if mode == "features":
                manifest = parse_train_manifest(make_features(root, n_utts, 500))
                source = FeaturePickleSource(root, "cmn", window)
                is_wave = False
            elif mode == "wav_host_dsp":
                manifest = parse_train_manifest(make_wavs(root, n_utts, 5.0))
                source = HostDspWavSource(root, FeatureConfig(), window)
                is_wave = False
            else:
                manifest = parse_train_manifest(make_wavs(root, n_utts, 5.0))
                source = WavSource(root, FeatureConfig(), window)
                is_wave = True
            for w in args.workers:
                loader = TrainLoader(
                    manifest, source, tc, DataConfig(num_workers=w, prefetch=4),
                    is_wave=is_wave,
                )
                bps = run(loader, args.steps)
                print(
                    f"{mode:>8} workers={w}: {bps:6.2f} batches/s "
                    f"({1000 / bps:5.1f} ms/batch vs ~110 ms/step device budget) = "
                    f"{bps * audio_s_per_batch:8.0f} audio-s/s"
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
