import os
import pickle

import numpy as np

from doubleattentionspeakerverification_tpu.config import DataConfig, TrainConfig
from doubleattentionspeakerverification_tpu.data.dataset import (
    FeaturePickleSource,
    TrainLoader,
    normalize_np,
    sample_window,
)
from doubleattentionspeakerverification_tpu.data.manifest import (
    load_trials,
    parse_train_manifest,
    shard_for_host,
)
from doubleattentionspeakerverification_tpu.data.wav import read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = str(tmp_path / "tone.wav")
    write_wav(p, y, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    assert back.shape == y.shape
    # PCM16 quantization + the 32767-encode / 32768-decode scale convention
    np.testing.assert_allclose(back, y, atol=1e-4)


def test_normalize_np_reference_semantics():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((60, 80)).astype(np.float32) * 2 + 1
    cmn = normalize_np(f, "cmn")
    np.testing.assert_allclose(cmn.mean(axis=0), 0, atol=1e-5)
    cmvn = normalize_np(f, "cmvn")
    np.testing.assert_allclose(cmvn.std(axis=0), 1, atol=1e-4)
    # std floor: constant column divides by 1.0
    f2 = np.ones((60, 3), np.float32)
    out = normalize_np(f2, "cmvn")
    np.testing.assert_allclose(out, 0)


def test_sample_window_semantics():
    rng = np.random.default_rng(0)
    feats = np.arange(100, dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    # longer than window: random contiguous window of exactly W
    for _ in range(20):
        w = sample_window(feats, 30, rng)
        assert w.shape == (30, 4)
        start = w[0, 0]
        assert 0 <= start <= 100 - 30 - 1  # randint(0, T-W-1) inclusive
        np.testing.assert_array_equal(w[:, 0], np.arange(start, start + 30))
    # shorter than window: whole file
    w = sample_window(feats[:10], 30, rng)
    assert w.shape == (10, 4)


def test_manifest_and_sharding():
    utts = parse_train_manifest(["a/b 0 -1\n", "c/d 3 -1\n", "", "e/f 1 -1\n"])
    assert [u.label for u in utts] == [0, 3, 1]
    s0 = shard_for_host(utts, 0, 2)
    s1 = shard_for_host(utts, 1, 2)
    # every host gets the SAME count (remainder dropped): unequal shards
    # would desynchronize lockstep multi-host steps
    assert len(s0) == len(s1) == 1
    assert s0[0].path != s1[0].path
    even = parse_train_manifest([f"u{i} {i} -1\n" for i in range(6)])
    shards = [shard_for_host(even, h, 3) for h in range(3)]
    assert all(len(s) == 2 for s in shards)
    assert {u.path for s in shards for u in s} == {f"u{i}" for i in range(6)}


def make_synthetic_features(root, n_speakers=4, per_speaker=6, t_range=(60, 120), seed=0):
    """Feature pickles with speaker-dependent structure; returns manifest lines."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    lines = []
    centers = rng.standard_normal((n_speakers, 80)) * 2.0
    for spk in range(n_speakers):
        for i in range(per_speaker):
            t = int(rng.integers(*t_range))
            feats = centers[spk][:, None] + 0.3 * rng.standard_normal((80, t))
            name = f"spk{spk}_utt{i}"
            with open(os.path.join(root, name + ".pickle"), "wb") as f:
                pickle.dump(feats.astype(np.float32), f)
            lines.append(f"{name} {spk} -1\n")
    return lines


def test_train_loader_shapes(tmp_path):
    root = str(tmp_path / "feats")
    lines = make_synthetic_features(root)
    manifest = parse_train_manifest(lines)
    tcfg = TrainConfig(window_size=0.8, batch_size=3, gradient_accumulation=2)
    source = FeaturePickleSource(root, "cmn", 80)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), feature_dim=80)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 24 // 6
    b = batches[0]
    assert b["inputs"].shape == (2, 3, 80, 80)
    assert b["lengths"].shape == (2, 3)
    assert b["labels"].shape == (2, 3)
    assert b["lengths"].min() >= 60 and b["lengths"].max() <= 80
    # padded region is zero
    g, bi = 0, 0
    n = b["lengths"][g, bi]
    assert np.all(b["inputs"][g, bi, n:] == 0)
    # deterministic given (seed, epoch)
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["labels"], again[0]["labels"])


def test_trials_loader(tmp_path):
    p = tmp_path / "clients.ndx"
    p.write_text("u1 u2\nu3 u4\n")
    assert load_trials(str(p)) == [("u1", "u2"), ("u3", "u4")]


def test_train_loader_wav_mode(tmp_path):
    from doubleattentionspeakerverification_tpu.config import FeatureConfig
    from doubleattentionspeakerverification_tpu.data.dataset import WavSource
    from doubleattentionspeakerverification_tpu.data.wav import write_wav

    sr = 16000
    root = tmp_path / "wavs"
    root.mkdir()
    lines = []
    rng = np.random.default_rng(0)
    for spk in range(2):
        for i in range(4):
            secs = 0.4 + 0.3 * i
            t = np.arange(int(secs * sr)) / sr
            y = 0.2 * np.sin(2 * np.pi * (200 + 100 * spk) * t)
            write_wav(str(root / f"s{spk}_{i}.wav"), y, sr)
            lines.append(f"s{spk}_{i} {spk} -1\n")
    manifest = parse_train_manifest(lines)
    tcfg = TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=2)
    source = WavSource(str(root), FeatureConfig(), window_frames=50)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), is_wave=True)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["waves"].shape == (2, 2, source.window_samples)
    assert b["lengths"].max() <= source.window_samples
    assert b["lengths"].min() > 0
    assert np.isfinite(b["waves"]).all()


def test_random_slicing_buckets(tmp_path):
    root = str(tmp_path / "feats")
    lines = make_synthetic_features(root, t_range=(120, 160))
    manifest = parse_train_manifest(lines)
    tcfg = TrainConfig(
        window_size=3.5, batch_size=3, gradient_accumulation=2, random_slicing=True
    )
    source = FeaturePickleSource(root, "cmn", 350)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), feature_dim=80)
    shapes = set()
    for e in range(3):
        for b in loader.epoch(e):
            t = b["inputs"].shape[2]
            assert 200 <= t <= 350 and t % 50 == 0  # snapped to the bucket grid
            assert b["lengths"].max() <= t
            shapes.add(t)
    assert len(shapes) >= 2  # actually varies


def test_wave_bf16_transfer_promoted_to_int16(tmp_path):
    """transfer_dtype='bfloat16' on a WAVE loader must ship lossless int16
    PCM, never bf16-quantized audio (8-bit mantissa would systematically
    shift the on-device features; dataset.py transfer block)."""
    from doubleattentionspeakerverification_tpu.config import FeatureConfig
    from doubleattentionspeakerverification_tpu.data.dataset import WavSource
    from doubleattentionspeakerverification_tpu.data.wav import write_wav

    sr = 16000
    root = tmp_path / "wavs"
    root.mkdir()
    lines = []
    for i in range(4):
        t = np.arange(2 * sr) / sr
        write_wav(str(root / f"u{i}.wav"), 0.2 * np.sin(2 * np.pi * (250 + 20 * i) * t), sr)
        lines.append(f"u{i} {i % 2} -1\n")
    manifest = parse_train_manifest(lines)
    tcfg = TrainConfig(window_size=1.0, batch_size=2, gradient_accumulation=2,
                       transfer_dtype="bfloat16")
    source = WavSource(str(root), FeatureConfig(), window_frames=100)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), is_wave=True)
    b = next(iter(loader.epoch(0)))
    assert b["waves"].dtype == np.int16


def test_random_slicing_wav_mode(tmp_path):
    """Device-DSP wav mode applies random slicing in the sample domain
    (reference truncates every training batch, train.py:205-207,217)."""
    from doubleattentionspeakerverification_tpu.config import FeatureConfig
    from doubleattentionspeakerverification_tpu.data.dataset import WavSource
    from doubleattentionspeakerverification_tpu.data.wav import write_wav
    from doubleattentionspeakerverification_tpu.dsp.features import (
        num_samples_for_frames,
    )

    sr = 16000
    root = tmp_path / "wavs"
    root.mkdir()
    lines = []
    for spk in range(2):
        for i in range(4):
            t = np.arange(int(4.0 * sr)) / sr
            y = 0.2 * np.sin(2 * np.pi * (200 + 100 * spk + 10 * i) * t)
            write_wav(str(root / f"s{spk}_{i}.wav"), y, sr)
            lines.append(f"s{spk}_{i} {spk} -1\n")
    manifest = parse_train_manifest(lines)
    fcfg = FeatureConfig()
    tcfg = TrainConfig(
        window_size=3.5, batch_size=2, gradient_accumulation=2, random_slicing=True
    )
    source = WavSource(str(root), fcfg, window_frames=350)
    loader = TrainLoader(manifest, source, tcfg, DataConfig(), is_wave=True)
    valid_sample_counts = {
        num_samples_for_frames(f, fcfg) for f in range(200, 351, 50)
    }
    shapes = set()
    for e in range(4):
        for b in loader.epoch(e):
            s = b["waves"].shape[2]
            assert s in valid_sample_counts  # snapped to the frame bucket grid
            assert b["lengths"].max() <= s
            shapes.add(s)
    assert len(shapes) >= 2  # actually varies


def test_loader_output_independent_of_num_workers(tmp_path):
    """Parallel batch assembly must not change the data stream."""
    from doubleattentionspeakerverification_tpu.config import DataConfig, TrainConfig
    from doubleattentionspeakerverification_tpu.data.dataset import (
        FeaturePickleSource,
        TrainLoader,
    )

    root = str(tmp_path / "feats")
    lines = make_synthetic_features(root, n_speakers=3, per_speaker=4)
    manifest = parse_train_manifest(lines)
    tc = TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=2)
    src = FeaturePickleSource(root, "cmn", 50)

    def run(workers):
        loader = TrainLoader(
            manifest, src, tc, DataConfig(num_workers=workers),
            feature_dim=80,
        )
        return list(loader.epoch(0))

    a, b = run(1), run(3)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
