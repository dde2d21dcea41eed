"""Host-side DSP path: native C++ log-mel kernel + HostDspWavSource.

The host-DSP path must be numerically interchangeable with the on-device
wav path (``training/step._prepare_inputs``): same log-mel math
(reference ``scripts/featureExtractor.py:8-23``), same masked CMN/CMVN
(``scripts/data.py:21-30``), same window-sampling distribution.
"""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.config import (
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
    TrainConfig,
)
from doubleattentionspeakerverification_tpu.data.dataset import (
    HostDspWavSource,
    TrainLoader,
    normalize_np,
)
from doubleattentionspeakerverification_tpu.data.manifest import parse_train_manifest
from doubleattentionspeakerverification_tpu.data.wav import write_wav
from doubleattentionspeakerverification_tpu.dsp.features import (
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    num_samples_for_frames,
)
from doubleattentionspeakerverification_tpu.utils import native

FEAT = FeatureConfig()


def _wave(seconds=1.0, sr=16000, f0=320.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_numpy_logmel_matches_jax():
    wave = _wave(1.3)
    jx = np.asarray(log_mel_spectrogram(wave, FEAT))
    npv = log_mel_spectrogram_np(wave, FEAT)
    assert npv.shape == jx.shape
    np.testing.assert_allclose(npv, jx, atol=5e-4)


@pytest.fixture(scope="module")
def native_logmel():
    if not native.native_available():
        pytest.skip("native library could not be built")
    return native.NativeLogmel(FEAT)


def test_native_logmel_matches_jax(native_logmel):
    wave = _wave(2.1, f0=440.0, seed=1)
    jx = np.asarray(log_mel_spectrogram(wave, FEAT))
    nat = native_logmel.compute(wave)
    assert nat.shape == jx.shape
    np.testing.assert_allclose(nat, jx, atol=5e-4)


@pytest.mark.parametrize("mode", ["cmn", "cmvn"])
def test_native_normalization_matches_reference(native_logmel, mode):
    wave = _wave(0.9, seed=2)
    raw = native_logmel.compute(wave, "none")
    nat = native_logmel.compute(wave, mode)
    # f32 multiply-by-reciprocal (native) vs divide (numpy) -> ~1e-4 noise
    np.testing.assert_allclose(nat, normalize_np(raw, mode), atol=2e-4)


def test_native_batch_matches_python_fallback(tmp_path, native_logmel):
    """Fused C++ batch == the per-file numpy path on files that are exactly
    window-length (window start is then deterministically 0 in both)."""
    window_frames = 60
    ws = num_samples_for_frames(window_frames, FEAT)
    paths, utts = [], []
    for i in range(5):
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, _wave(ws / FEAT.sample_rate, f0=200 + 40 * i, seed=i), FEAT.sample_rate)
        paths.append(p)

    src = HostDspWavSource(str(tmp_path), FEAT, window_frames, "cmn")
    assert src._native is not None

    class U:  # minimal Utterance stand-in
        def __init__(self, path):
            self.path = path

    utts = [U(f"f{i}") for i in range(5)]
    rng = np.random.default_rng(0)
    feats_nat, lens_nat = src.load_batch(utts, rng)

    src._native = None  # force the numpy fallback
    feats_py, lens_py = src.load_batch(utts, np.random.default_rng(0))
    assert feats_nat.shape == feats_py.shape == (5, window_frames, FEAT.n_mels)
    np.testing.assert_array_equal(lens_nat, lens_py)
    np.testing.assert_allclose(feats_nat, feats_py, atol=1e-3)


def test_host_dsp_matches_device_wav_path(tmp_path):
    """A training batch produced by HostDspWavSource must match what the
    jitted step's device DSP computes from the same PCM windows."""
    from doubleattentionspeakerverification_tpu.training.step import _prepare_inputs

    window_frames = 50
    ws = num_samples_for_frames(window_frames, FEAT)
    # one full-length file, one shorter (exercises frame padding + masked CMN)
    from doubleattentionspeakerverification_tpu.data.wav import read_wav

    for name, w in [("a", _wave(ws / FEAT.sample_rate, seed=3)),
                    ("b", _wave(0.8 * ws / FEAT.sample_rate, seed=4))]:
        write_wav(str(tmp_path / f"{name}.wav"), w, FEAT.sample_rate)
    # compare both paths on the DECODED samples (write_wav quantizes to
    # PCM16; the device path must see the same waveform the host read)
    w_full, _ = read_wav(str(tmp_path / "a.wav"))
    w_short, _ = read_wav(str(tmp_path / "b.wav"))

    src = HostDspWavSource(str(tmp_path), FEAT, window_frames, "cmn")

    class U:
        def __init__(self, path):
            self.path = path

    feats, lens = src.load_batch([U("a"), U("b")], np.random.default_rng(0))

    waves = np.zeros((1, 2, ws), np.float32)
    waves[0, 0] = w_full
    waves[0, 1, : len(w_short)] = w_short
    cfg = ExperimentConfig(train=TrainConfig(normalization="cmn"))
    dev_feats, dev_lens = _prepare_inputs(
        {"waves": waves, "lengths": np.array([[ws, len(w_short)]], np.int32)}, cfg
    )
    np.testing.assert_array_equal(lens, np.asarray(dev_lens[0]))
    np.testing.assert_allclose(feats, np.asarray(dev_feats[0]), atol=2e-3)


def test_extract_features_cli_host_dsp(tmp_path, native_logmel):
    """`extract_features --host_dsp` writes reference-format pickles that
    match the default (jitted XLA) extraction path."""
    import pickle

    from doubleattentionspeakerverification_tpu.cli.extract_features import (
        main as extract_main,
    )

    wav_a = tmp_path / "a.wav"
    write_wav(str(wav_a), _wave(0.8, seed=7), FEAT.sample_rate)
    lst = tmp_path / "files.lst"
    lst.write_text(str(wav_a) + "\n")

    assert extract_main(["-i", str(lst), "--host_dsp"]) == 0
    with open(str(tmp_path / "a.pickle"), "rb") as f:
        host = pickle.load(f)

    assert extract_main(["-i", str(lst)]) == 0  # overwrites with the XLA path
    with open(str(tmp_path / "a.pickle"), "rb") as f:
        xla = pickle.load(f)
    assert host.shape == xla.shape and host.shape[0] == FEAT.n_mels
    np.testing.assert_allclose(host, xla, atol=5e-4)


def test_wav_feature_loader_host_dsp_matches_device(tmp_path):
    """Validation feature loader: host_dsp path == jitted device path."""
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        wav_feature_loader,
    )

    write_wav(str(tmp_path / "u1.wav"), _wave(1.1, seed=9), FEAT.sample_rate)
    dev = wav_feature_loader(str(tmp_path), FEAT, "cmn")("u1")
    host = wav_feature_loader(str(tmp_path), FEAT, "cmn", host_dsp=True)("u1")
    assert host.shape == dev.shape
    np.testing.assert_allclose(host, dev, atol=2e-3)


def test_host_dsp_train_loader_and_step(tmp_path):
    """End-to-end: HostDspWavSource through TrainLoader into the jitted
    train step — feature-path batch layout, finite loss."""
    import jax

    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    sr = FEAT.sample_rate
    root = tmp_path / "wavs"
    root.mkdir()
    lines = []
    for spk in range(2):
        for i in range(4):
            y = _wave(0.45 + 0.2 * i, f0=220 + 120 * spk, seed=10 * spk + i)
            write_wav(str(root / f"s{spk}_{i}.wav"), y, sr)
            lines.append(f"s{spk}_{i} {spk} -1\n")
    manifest = parse_train_manifest(lines)
    tcfg = TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=2)
    source = HostDspWavSource(str(root), FEAT, 50, "cmn")
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), is_wave=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["inputs"].shape == (2, 2, 50, FEAT.n_mels)
    assert 0 < b["lengths"].min() <= b["lengths"].max() <= 50
    # padded frames are zero (masked CMN output)
    g, bi = 0, int(np.argmin(b["lengths"][0]))
    n = b["lengths"][g, bi]
    assert np.all(b["inputs"][g, bi, n:] == 0)

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
        train=tcfg,
    )
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(params, ms, cfg)
    step = make_train_step(cfg, donate=False)
    _, metrics = step(state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
