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


def test_train_step_with_pallas_dsp_matches_xla_dsp(tmp_path):
    """Wav-mode step with use_pallas_dsp must match the XLA-DSP step."""
    import dataclasses

    import jax

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.dsp.features import (
        num_samples_for_frames,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    base = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=24,
                          num_spkrs=4, mask_prob=0.02),
        train=TrainConfig(batch_size=2, gradient_accumulation=2),
    )
    n = num_samples_for_frames(50, base.features)
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((2, 2, n)) * 0.1).astype(np.float32),
        "lengths": np.full((2, 2), n, np.int32),
        "labels": np.array([[0, 1], [2, 3]], np.int32),
    }
    losses = {}
    for name, use in (("xla", False), ("pallas", True)):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, use_pallas_dsp=use)
        )
        params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(params, ms, cfg)
        step = make_train_step(cfg, donate=False)
        _, m = step(state, batch, jax.random.PRNGKey(1))
        losses[name] = float(m["loss"])
    assert losses["pallas"] == pytest.approx(losses["xla"], rel=1e-4)


@pytest.mark.parametrize(
    "cfg_kw, n_samples, tile_frames",
    [
        # 8 kHz telephony config: hop 80, n_fft 256 -> n_fft/hop = 3.2
        # (non-integer whole-rows split, 16-sample remainder slice)
        (dict(sample_rate=8000, n_fft=256), 12000, 32),
        # hop 44: NOT a multiple of 8 sublanes; frame spans ceil(512/44)=12
        # rows -> overlap rounds to 16
        (dict(window_stride_s=0.00275), 6000, 32),
        # n_fft an exact multiple of hop (480 = 3*160): the remainder-slice
        # branch is skipped entirely
        (dict(n_fft=480), 10000, 32),
        # T (=10) < tile_frames (=128): single partial tile, heavy pad+trim
        (dict(), 2000, 128),
        # T exactly == tile_frames boundary
        (dict(), 512 + 160 * 31, 32),
    ],
)
def test_nondefault_config_parity(cfg_kw, n_samples, tile_frames):
    """The roll-based framing derives all constants from the config
    (``ops/logmel_pallas.py:94-112``); prove parity away from the 160/512
    defaults it was tuned on."""
    cfg = FeatureConfig(**cfg_kw)
    rng = np.random.default_rng(11)
    wave = (rng.standard_normal((2, n_samples)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(wave, cfg, tile_frames=tile_frames))
    assert got.shape == ref.shape == (2, num_frames(n_samples, cfg), cfg.n_mels)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)


def test_small_hop_parity():
    """hop 40 -> a frame spans 13 chunk rows (> the old hard-coded 8-row
    overlap): the kernel must derive the overlap from the config."""
    cfg = FeatureConfig(window_stride_s=0.0025)
    assert cfg.hop_length == 40
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(wave, cfg, tile_frames=32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-5)
