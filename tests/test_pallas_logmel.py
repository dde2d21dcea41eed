"""Fused pallas log-mel kernel vs the XLA path (interpret mode)."""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.config import FeatureConfig
from doubleattentionspeakerverification_tpu.dsp.features import (
    log_mel_spectrogram,
    num_frames,
)
from doubleattentionspeakerverification_tpu.ops.logmel_pallas import (
    log_mel_spectrogram_pallas,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("n_samples", [16000, 56352, 7000])
def test_matches_xla_path(n_samples):
    cfg = FeatureConfig()
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(wave, cfg, tile_frames=64))
    assert got.shape == ref.shape == (2, num_frames(n_samples, cfg), 80)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_single_wave_shape():
    cfg = FeatureConfig()
    wave = (np.random.default_rng(1).standard_normal(12000) * 0.05).astype(np.float32)
    got = np.asarray(log_mel_spectrogram_pallas(wave, cfg, tile_frames=32))
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)
