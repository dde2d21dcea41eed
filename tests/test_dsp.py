"""DSP front-end parity tests.

Oracles are independent implementations: torch.stft for the STFT (same
window-padding + center=False semantics as librosa.stft) and
transformers.audio_utils.mel_filter_bank for the Slaney/norm=None mel
filterbank the reference gets from librosa (featureExtractor.py:8-23).
"""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.config import FeatureConfig
from doubleattentionspeakerverification_tpu.dsp import mel as melmod
from doubleattentionspeakerverification_tpu.dsp.features import (
    extract_normalized,
    frames_for_samples,
    log_mel_spectrogram,
    normalize_features,
    num_frames,
    num_samples_for_frames,
)

CFG = FeatureConfig()


def _wave(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


# --------------------------------------------------------------------- mel fb
def test_slaney_anchor_points():
    assert melmod.hz_to_mel(1000.0) == pytest.approx(15.0)
    assert melmod.hz_to_mel(6400.0) == pytest.approx(42.0)
    assert melmod.mel_to_hz(15.0) == pytest.approx(1000.0)
    np.testing.assert_allclose(melmod.mel_to_hz(melmod.hz_to_mel([250.0, 3000.0, 7999.0])),
                               [250.0, 3000.0, 7999.0], rtol=1e-10)


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ours = melmod.mel_filterbank(16000, 512, 80, 0.0, 8000.0)
    theirs = mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm=None,
        mel_scale="slaney",
    ).T  # transformers returns (freq, mel)
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_window_matches_scipy_semantics():
    # periodic hamming == scipy get_window('hamming', N, fftbins=True)
    w = melmod.periodic_hamming(400)
    n = np.arange(400)
    expect = 0.54 - 0.46 * np.cos(2 * np.pi * n / 400)
    np.testing.assert_allclose(w, expect, rtol=1e-12)
    padded = melmod.padded_stft_window(400, 512)
    assert padded.shape == (512,)
    assert np.all(padded[:56] == 0) and np.all(padded[-56:] == 0)
    np.testing.assert_allclose(padded[56:456], expect, rtol=1e-6)


# ----------------------------------------------------------------------- stft
def test_log_mel_matches_torch_stft_oracle():
    """Full mfsc chain vs an oracle built from torch.stft + our mel matrix.

    torch.stft(center=False) pads the win_length window to n_fft centered —
    identical semantics to librosa.stft as used in featureExtractor.py:19.
    """
    import torch

    y = _wave(16000 * 2)
    cfg = CFG

    # oracle: replicate featureExtractor.mfsc with torch.stft
    yt = y.astype(np.float64) * 32768.0
    pre = np.empty_like(yt)
    pre[1:] = yt[1:] - 0.97 * yt[:-1]
    pre[0] = yt[0] * (1 - 0.97)
    win = torch.hamming_window(400, periodic=True, dtype=torch.float64)
    S = torch.stft(
        torch.tensor(pre), n_fft=512, hop_length=160, win_length=400,
        window=win, center=False, return_complex=True,
    )
    D = S.abs().numpy()  # (257, T)
    mel_fb = melmod.mel_filterbank(16000, 512, 80, 0.0, 8000.0).astype(np.float64)
    oracle = np.log(np.maximum(1.0, mel_fb @ D))  # (80, T)

    ours = np.asarray(log_mel_spectrogram(y, cfg))  # (T, 80)
    assert ours.shape == (oracle.shape[1], 80)
    np.testing.assert_allclose(ours, oracle.T, atol=2e-3, rtol=1e-4)


def test_frame_count_formulas():
    cfg = CFG
    assert num_frames(16000, cfg) == 1 + (16000 - 512) // 160
    n = num_samples_for_frames(350, cfg)
    assert num_frames(n, cfg) == 350
    assert num_frames(n - 1, cfg) == 349
    lens = np.array([16000, 512, 511, 0])
    np.testing.assert_array_equal(
        np.asarray(frames_for_samples(lens, cfg)), [97, 1, 0, 0]
    )


# ------------------------------------------------------------------ normalize
def test_cmn_cmvn_reference_semantics():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((100, 80)).astype(np.float32) * 3

    # reference normalizeFeatures (data.py:21-30)
    def ref_norm(f, mode):
        f = f.copy()
        mean = np.mean(f, axis=0)
        f -= mean
        if mode == "cmn":
            return f
        std = np.std(f + mean, axis=0)  # std of the original features
        std = np.where(std > 0.01, std, 1.0)
        return f / std

    ours_cmn = np.asarray(normalize_features(feats, "cmn"))
    np.testing.assert_allclose(ours_cmn, ref_norm(feats, "cmn"), atol=1e-5)

    ours_cmvn = np.asarray(normalize_features(feats, "cmvn"))
    np.testing.assert_allclose(ours_cmvn, ref_norm(feats, "cmvn"), atol=1e-5)


def test_cmvn_std_floor_quirk():
    # constant feature column -> std 0 -> divisor 1.0, not div-by-zero
    feats = np.ones((50, 80), dtype=np.float32) * 5.0
    out = np.asarray(normalize_features(feats, "cmvn"))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_masked_normalize_matches_unpadded():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 100, 80)).astype(np.float32)
    padded = np.zeros((1, 150, 80), dtype=np.float32)
    padded[:, :100] = feats
    for mode in ("cmn", "cmvn"):
        ref = np.asarray(normalize_features(feats[0], mode))
        ours = np.asarray(normalize_features(padded, mode, lengths=np.array([100])))
        np.testing.assert_allclose(ours[0, :100], ref, atol=1e-5)
        np.testing.assert_allclose(ours[0, 100:], 0.0)


def test_extract_normalized_is_cmn_of_logmel():
    y = _wave(16000)
    feats = np.asarray(log_mel_spectrogram(y, CFG))
    expect = feats - feats.mean(axis=0)
    got = np.asarray(extract_normalized(y, CFG))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_make_bucketed_logmel_matches_eager():
    from doubleattentionspeakerverification_tpu.dsp.features import (
        log_mel_spectrogram,
        make_bucketed_logmel,
    )

    cfg = FeatureConfig()
    extract = make_bucketed_logmel(cfg, bucket_seconds=0.5)
    rng = np.random.default_rng(0)
    for n in (7000, 16000, 16001, 40000):
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        got = extract(wave)
        ref = np.asarray(log_mel_spectrogram(wave, cfg))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-6)
