"""Compute-once training feature cache (``data/feature_cache.py``).

The cached wav path must reproduce the reference's offline pipeline exactly:
features extracted once (``scripts/featureExtractor.py:35-43``), then every
epoch CMN/CMVN over the full utterance + a random frame-domain window
(``scripts/data.py:40-55``). So ``CachedDspWavSource`` over wavs must equal
``FeaturePickleSource`` over extractor-CLI pickles of the same wavs.
"""

import pickle

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.config import DataConfig, FeatureConfig, TrainConfig
from doubleattentionspeakerverification_tpu.data.dataset import (
    FeaturePickleSource,
    TrainLoader,
)
from doubleattentionspeakerverification_tpu.data.feature_cache import (
    CachedDspWavSource,
    UtteranceFeatureCache,
)
from doubleattentionspeakerverification_tpu.data.manifest import parse_train_manifest
from doubleattentionspeakerverification_tpu.data.wav import write_wav

FEAT = FeatureConfig()


def _wave(seconds=1.0, sr=16000, f0=320.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def _make_wavs(root, n_speakers=2, per_speaker=3):
    root.mkdir(exist_ok=True)
    lines = []
    for spk in range(n_speakers):
        for i in range(per_speaker):
            y = _wave(0.5 + 0.25 * i, f0=200 + 130 * spk, seed=10 * spk + i)
            write_wav(str(root / f"s{spk}_{i}.wav"), y, FEAT.sample_rate)
            lines.append(f"s{spk}_{i} {spk} -1\n")
    return lines


# --------------------------------------------------------------------- cache


def test_cache_hits_and_eviction():
    calls = []

    def compute(key):
        calls.append(key)
        return np.full((100, 80), float(len(key)), np.float32)  # 32 kB

    cache = UtteranceFeatureCache(compute, budget_mb=0.07)  # fits 2 entries
    a = cache.get("a")
    assert cache.get("a") is a and calls == ["a"]
    cache.get("bb")
    cache.get("ccc")  # evicts "a" (LRU)
    assert cache.get("bb").shape == (100, 80) and calls == ["a", "bb", "ccc"]
    assert cache.get("a")[0, 0] == 1.0 and calls[-1] == "a"  # recomputed
    s = cache.stats()
    assert s["entries"] == 2 and s["misses"] == 4 and s["hits"] == 2


def test_disk_tier_roundtrip(tmp_path):
    calls = []

    def compute(key):
        calls.append(key)
        return np.arange(160, dtype=np.float32).reshape(2, 80)

    d = str(tmp_path / "cache")
    c1 = UtteranceFeatureCache(compute, budget_mb=1, disk_dir=d)
    feats = c1.get("sub/utt1")
    # a second cache instance (fresh RAM) must hit the disk tier, not compute
    c2 = UtteranceFeatureCache(compute, budget_mb=1, disk_dir=d)
    np.testing.assert_array_equal(c2.get("sub/utt1"), feats)
    assert calls == ["sub/utt1"] and c2.disk_hits == 1
    # disk format is the reference extractor's: pickled raw (n_mels, T)
    with open(tmp_path / "cache" / "sub" / "utt1.pickle", "rb") as f:
        raw = pickle.load(f)
    np.testing.assert_array_equal(np.transpose(raw), feats)


# ------------------------------------------------------------------- parity


@pytest.mark.parametrize("normalization", ["cmn", "cmvn"])
def test_cached_source_matches_extractor_plus_pickle_source(tmp_path, normalization):
    """wav + cache == extract_features CLI + FeaturePickleSource, window for
    window (same rng stream => same starts)."""
    from doubleattentionspeakerverification_tpu.cli.extract_features import (
        main as extract_main,
    )

    root = tmp_path / "wavs"
    lines = _make_wavs(root)
    lst = tmp_path / "files.lst"
    lst.write_text("".join(str(root / line.split()[0]) + ".wav\n" for line in lines))
    assert extract_main(["-i", str(lst), "--host_dsp"]) == 0

    manifest = parse_train_manifest(lines)
    window = 40
    cached = CachedDspWavSource(str(root), FEAT, window, normalization, cache_mb=64)
    pickled = FeaturePickleSource(str(root), normalization, window)
    for utt in manifest:
        for trial in range(3):
            rng_a = np.random.default_rng((trial, hash(utt.path) % 1000))
            rng_b = np.random.default_rng((trial, hash(utt.path) % 1000))
            win_c, n_c = cached.load(utt, rng_a)
            win_p, n_p = pickled.load(utt, rng_b)
            assert n_c == n_p and win_c.shape == win_p.shape
            np.testing.assert_allclose(win_c, win_p, atol=1e-5)


def test_train_loader_with_cached_source(tmp_path):
    """TrainLoader over the cached source: feature-path batch layout, and the
    second epoch is served entirely from cache."""
    root = tmp_path / "wavs"
    lines = _make_wavs(root, n_speakers=2, per_speaker=4)
    manifest = parse_train_manifest(lines)
    source = CachedDspWavSource(str(root), FEAT, 50, "cmn", cache_mb=64)
    tcfg = TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=2)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(num_workers=1), is_wave=False)
    b = next(iter(loader.epoch(0)))
    assert b["inputs"].shape == (2, 2, 50, FEAT.n_mels)
    assert 0 < b["lengths"].min() <= b["lengths"].max() <= 50
    list(loader.epoch(0))  # finish epoch 0
    misses_after_e0 = source.cache.stats()["misses"]
    assert misses_after_e0 == len(manifest)
    list(loader.epoch(1))
    s = source.cache.stats()
    assert s["misses"] == misses_after_e0  # steady state: pure window slicing
    assert s["hits"] >= len(manifest)


def test_trainer_wiring_selects_cached_source(tmp_path):
    """DataConfig.train_feature_cache_mb routes wav mode to the cached source."""
    from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
    from doubleattentionspeakerverification_tpu.training.trainer import Trainer

    root = tmp_path / "wavs"
    lines = _make_wavs(root)
    labels = tmp_path / "labels.ndx"
    labels.write_text("".join(lines))
    cfg = ExperimentConfig(
        out_dir=str(tmp_path / "out"),
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
        train=TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=1),
        data=DataConfig(
            train_data_dir=str(root),
            train_labels_path=str(labels),
            source="wav",
            train_feature_cache_mb=32.0,
        ),
    )
    trainer = Trainer(cfg)
    assert isinstance(trainer.loader.source, CachedDspWavSource)
    assert trainer.loader.is_wave is False
