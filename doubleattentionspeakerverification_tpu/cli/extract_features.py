"""Feature-extraction CLI (reference ``scripts/featureExtractor.py:35-51``).

Reads a list of wav paths and writes ``<base>.pickle`` files containing the
raw (80, T) log-mel matrix — the exact on-disk format the reference training
pipeline consumes (normalization happens at load time, ``data.py:21-30``).

Differences by design: audio is decoded by our native/python WAV reader and
the mel chain runs as a single jitted JAX program (batched over files of
equal length buckets is unnecessary here — extraction is IO-bound); the
reference's ``[:-5]`` filename slicing (which requires rows to end in
``.wav``) is replaced by proper extension handling.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from ..config import FeatureConfig
from ..data.wav import read_wav
from ..dsp.features import log_mel_spectrogram, make_bucketed_logmel


def extract_file(audio_path: str, cfg: FeatureConfig, extractor=None) -> np.ndarray:
    """wav -> raw (n_mels, T) log-mel, reference ``mfsc`` layout.

    ``extractor`` (from ``make_bucketed_logmel``) runs one compiled XLA
    program per length bucket; without it the mel chain dispatches eagerly
    op-by-op (fine for a file, slow for a corpus).
    """
    wave, sr = read_wav(audio_path)
    if sr != cfg.sample_rate:
        raise ValueError(f"{audio_path}: sample rate {sr} != {cfg.sample_rate}")
    wave = wave.astype(np.float32)
    if extractor is not None:
        feats = extractor(wave)
    else:
        feats = np.asarray(log_mel_spectrogram(wave, cfg))
    return feats.T  # (T, 80) -> (80, T) on-disk layout


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Extract log-mel features from a list of wav files."
    )
    parser.add_argument("--audioFilesList", "-i", type=str, required=True,
                        help="text file with one wav path per line")
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--bucket_seconds", type=float, default=2.0,
                        help="pad waves to this grid: one XLA compilation "
                             "per bucket instead of one per file length")
    parser.add_argument("--use_pallas_dsp", action="store_true",
                        help="fused Pallas log-mel kernel (TPU)")
    parser.add_argument("--host_dsp", action="store_true",
                        help="native C++ log-mel kernel on the host — no "
                             "accelerator or XLA compile needed (CPU-only boxes)")
    params = parser.parse_args(argv)

    cfg = FeatureConfig(sample_rate=params.sample_rate)
    if params.host_dsp:
        from ..utils.native import NativeLogmel

        native = NativeLogmel(cfg)  # raises if no C++ toolchain
        extractor = native.compute
    else:
        extractor = make_bucketed_logmel(
            cfg, bucket_seconds=params.bucket_seconds, use_pallas=params.use_pallas_dsp
        )
    with open(params.audioFilesList, "r") as files:
        for line in files:
            path = line.strip()
            if not path:
                continue
            print(path)
            feats = extract_file(path, cfg, extractor)
            base = path[:-4] if path.endswith(".wav") else path
            with open(f"{base}.pickle", "wb") as handle:
                pickle.dump(feats, handle)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
