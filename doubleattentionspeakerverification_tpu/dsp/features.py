"""On-device log-mel feature extraction (JAX/XLA; TPU-native).

Replaces the reference's offline librosa pipeline
(``scripts/featureExtractor.py:8-23``: rescale x32768 -> pre-emphasis 0.97 ->
Hamming STFT 25ms/10ms, n_fft=512, center=False -> 80-mel, norm=None ->
log(max(1,.))) with a jittable function: framing is a gather, the windowed DFT
and the mel projection are two matmuls that XLA tiles onto the MXU, and the
log/abs elementwise ops fuse in between. CMN/CMVN normalization
(``scripts/data.py:21-30``) is implemented mask-aware for padded batches.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from .mel import mel_filterbank, padded_stft_window


def num_frames(num_samples: int, cfg: FeatureConfig) -> int:
    """Frame count of a ``center=False`` STFT (frame length = n_fft)."""
    return max(0, 1 + (num_samples - cfg.n_fft) // cfg.hop_length)


def num_samples_for_frames(frames: int, cfg: FeatureConfig) -> int:
    """Samples needed to produce exactly ``frames`` STFT frames."""
    return cfg.n_fft + (frames - 1) * cfg.hop_length


@functools.lru_cache(maxsize=8)
def _dft_mel_constants(cfg: FeatureConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cos_basis, sin_basis, mel_T) with the analysis window folded into the
    DFT bases. cos/sin: (n_fft, n_bins); mel_T: (n_bins, n_mels)."""
    n_fft = cfg.n_fft
    n_bins = 1 + n_fft // 2
    window = padded_stft_window(cfg.win_length, n_fft, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    cos_b = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin_b = (window[:, None] * -np.sin(ang)).astype(np.float32)
    mel = mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax_hz)
    return cos_b, sin_b, mel.T.copy()


def preemphasize(wave: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """x32768 rescale + pre-emphasis, exactly as ``featureExtractor.py:16-18``:
    ``y[1:] -= 0.97*y[:-1]; y[0] *= (1-0.97)``. Operates on the last axis."""
    y = wave * cfg.rescale
    first = y[..., :1] * (1.0 - cfg.preemphasis)
    rest = y[..., 1:] - cfg.preemphasis * y[..., :-1]
    return jnp.concatenate([first, rest], axis=-1)


def frame_signal(y: jnp.ndarray, n_frames: int, cfg: FeatureConfig) -> jnp.ndarray:
    """(..., N) -> (..., n_frames, n_fft) overlapping frames (center=False)."""
    idx = np.arange(n_frames)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
    return jnp.take(y, jnp.asarray(idx), axis=-1)


def log_mel_spectrogram(wave: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Waveform (..., N) in [-1, 1] -> log-mel features (..., T, n_mels).

    Matches the reference mfsc up to float32 arithmetic order. ``N`` must be
    static (pad waveforms to fixed lengths; see ``num_samples_for_frames``).
    """
    cos_b, sin_b, mel_t = _dft_mel_constants(cfg)
    n_frames = num_frames(wave.shape[-1], cfg)
    y = preemphasize(wave.astype(jnp.float32), cfg)
    frames = frame_signal(y, n_frames, cfg)                  # (..., T, n_fft)
    # HIGHEST precision: on TPU the default matmul runs in bfloat16 passes,
    # which is catastrophic for near-cancelling low-frequency DFT bins of the
    # pre-emphasized signal. These matrices are tiny; full f32 is free.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, jnp.asarray(cos_b), precision=hi)   # (..., T, n_bins)
    im = jnp.dot(frames, jnp.asarray(sin_b), precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    melspec = jnp.dot(mag, jnp.asarray(mel_t), precision=hi)  # (..., T, n_mels)
    return jnp.log(jnp.maximum(cfg.log_floor, melspec))


def frames_for_samples(lengths: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """Valid frame count for each (possibly padded) waveform length."""
    return jnp.maximum(0, 1 + (lengths - cfg.n_fft) // cfg.hop_length)


def normalize_features(
    features: jnp.ndarray,
    mode: str = "cmn",
    lengths: Optional[jnp.ndarray] = None,
    std_floor: float = 0.01,
) -> jnp.ndarray:
    """Masked CMN / CMVN over the time axis (axis -2).

    Reference semantics (``scripts/data.py:21-30``): subtract the per-feature
    time mean; for 'cmvn' also divide by the (biased) std with the quirky
    floor ``std = where(std > 0.01, std, 1.0)``. With ``lengths`` given,
    statistics use only the first ``lengths`` frames of each item and padded
    frames are zeroed on output.
    """
    x = features
    if lengths is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        x = x - mean
        if mode == "cmvn":
            std = jnp.std(features, axis=-2, keepdims=True)
            std = jnp.where(std > std_floor, std, 1.0)
            x = x / std
        return x

    t = x.shape[-2]
    mask = (jnp.arange(t) < lengths[..., None])[..., None]   # (..., T, 1)
    denom = jnp.maximum(1, lengths)[..., None, None].astype(x.dtype)
    xm = jnp.where(mask, x, 0.0)
    mean = jnp.sum(xm, axis=-2, keepdims=True) / denom
    out = x - mean
    if mode == "cmvn":
        var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=-2, keepdims=True) / denom
        std = jnp.sqrt(var)
        std = jnp.where(std > std_floor, std, 1.0)
        out = out / std
    return jnp.where(mask, out, 0.0)


def extract_normalized(
    wave: jnp.ndarray, cfg: FeatureConfig, mode: str = "cmn"
) -> jnp.ndarray:
    """Wave -> CMN'd (T, n_mels), the inference-path combination the reference
    uses in ``featureExtractor.extractFeatures`` (always CMN,
    ``featureExtractor.py:25-33``)."""
    feats = log_mel_spectrogram(wave, cfg)
    return normalize_features(feats, mode)


def log_mel_spectrogram_np(wave: np.ndarray, cfg: FeatureConfig) -> np.ndarray:
    """Host (numpy) log-mel, same math as :func:`log_mel_spectrogram`.

    Pure-python fallback of the native C++ host-DSP kernel
    (``native/logmel.cpp``) — pocketfft rFFT + dense mel matmul. Used when
    the native library is unavailable, and as a parity oracle in tests.
    """
    _, _, mel_t = _dft_mel_constants(cfg)
    window = padded_stft_window(cfg.win_length, cfg.n_fft, dtype=np.float32)
    n_fr = num_frames(wave.shape[-1], cfg)
    if n_fr <= 0:
        return np.zeros(wave.shape[:-1] + (0, cfg.n_mels), np.float32)
    y = wave.astype(np.float32) * cfg.rescale
    pre = np.concatenate(
        [y[..., :1] * (1.0 - cfg.preemphasis), y[..., 1:] - cfg.preemphasis * y[..., :-1]],
        axis=-1,
    )
    idx = np.arange(n_fr)[:, None] * cfg.hop_length + np.arange(cfg.n_fft)[None, :]
    frames = pre[..., idx] * window                          # (..., T, n_fft)
    mag = np.abs(np.fft.rfft(frames, n=cfg.n_fft, axis=-1))  # (..., T, n_bins)
    melspec = mag.astype(np.float32) @ mel_t                 # (..., T, n_mels)
    return np.log(np.maximum(cfg.log_floor, melspec)).astype(np.float32)


def make_bucketed_logmel(
    cfg: FeatureConfig, bucket_seconds: float = 2.0, use_pallas: bool = False
):
    """Host-callable ``wave (N,) float32 -> raw (T, n_mels) np.ndarray``.

    Waves are zero-padded up to a ``bucket_seconds`` grid so XLA compiles one
    program per bucket instead of one per distinct length (the difference
    between seconds and hours over a corpus of variable-length files); the
    padded tail frames are sliced off. ``use_pallas`` switches to the fused
    TPU kernel (``ops.logmel_pallas``).
    """
    if use_pallas:
        from ..ops.logmel_pallas import log_mel_spectrogram_pallas

        fn = jax.jit(lambda w: log_mel_spectrogram_pallas(w, cfg))
    else:
        fn = jax.jit(lambda w: log_mel_spectrogram(w, cfg))

    def extract(wave: np.ndarray) -> np.ndarray:
        n = int(wave.shape[0])
        bucket = max(1, int(bucket_seconds * cfg.sample_rate))
        padded_n = max(cfg.n_fft, -(-n // bucket) * bucket)
        padded = np.zeros((padded_n,), np.float32)
        padded[:n] = wave
        # jit caches one executable per padded length, i.e. per bucket
        return np.asarray(fn(padded))[: num_frames(n, cfg)]

    return extract
