"""Native C++ loader vs the python WAV reader."""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.data.wav import read_wav, write_wav
from doubleattentionspeakerverification_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.native_available():
        pytest.skip("native library could not be built")
    return native.get_lib()


def _tone(path, seconds=0.7, sr=16000, f0=330.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    y = 0.3 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.standard_normal(len(t))
    write_wav(path, y, sr)
    return y


def test_native_read_matches_python(tmp_path, lib):
    p = str(tmp_path / "a.wav")
    _tone(p)
    py, sr = read_wav(p)
    nat = native.native_read_wav(p)
    assert len(nat) == len(py)
    np.testing.assert_allclose(nat, py.astype(np.float32), atol=1e-6)


def test_native_windows_batch(tmp_path, lib):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"w{i}.wav")
        _tone(p, seconds=0.5 + 0.2 * i, f0=200 + 50 * i, seed=i)
        paths.append(p)
    window = 8000  # 0.5 s
    seeds = list(range(6))
    wins, lengths = native.native_read_windows(paths, window, seeds, n_threads=2)
    assert wins.shape == (6, window)
    assert lengths.tolist() != [-1] * 6
    for i, p in enumerate(paths):
        full, _ = read_wav(p)
        n = len(full)
        take = min(n, window)
        assert lengths[i] == take
        # the emitted window must be a contiguous slice of the file
        if n <= window:
            np.testing.assert_allclose(wins[i, :take], full.astype(np.float32), atol=1e-6)
            assert np.all(wins[i, take:] == 0)
        else:
            # locate the window start to confirm contiguity
            start = None
            f32 = full.astype(np.float32)
            for cand in range(0, n - window + 1):
                if f32[cand] == wins[i, 0] and np.array_equal(f32[cand:cand + 16], wins[i, :16]):
                    start = cand
                    break
            assert start is not None
            np.testing.assert_array_equal(f32[start:start + window], wins[i])
            assert 0 <= start <= max(0, n - window - 1)


def test_native_windows_deterministic_seed(tmp_path, lib):
    p = str(tmp_path / "d.wav")
    _tone(p, seconds=2.0)
    w1, _ = native.native_read_windows([p], 8000, [42])
    w2, _ = native.native_read_windows([p], 8000, [42])
    w3, _ = native.native_read_windows([p], 8000, [43])
    np.testing.assert_array_equal(w1, w2)
    assert not np.array_equal(w1, w3)


def test_native_missing_file(tmp_path, lib):
    wins, lengths = native.native_read_windows([str(tmp_path / "nope.wav")], 100, [0])
    assert lengths[0] == -1
    assert np.all(wins == 0)


def test_decoders_reject_malformed_wavs(tmp_path, lib):
    """Garbage/truncated/hostile headers must fail cleanly (no crash, no
    hang) in BOTH the native C++ decoder and the python fallback."""
    import struct

    cases = {
        "empty": b"",
        "garbage": b"\x00\x01\x02" * 50,
        "riff_only": b"RIFF\xff\xff\xff\xffWAVE",
        "truncated_fmt": b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                          + b"fmt " + struct.pack("<I", 16) + b"\x01\x00",
        "zero_channels": b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                          + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 0, 16000, 0, 0, 16)
                          + b"data" + struct.pack("<I", 4) + b"\x00" * 4,
        "huge_chunk_size": b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                          + b"fmt " + struct.pack("<I", 0xFFFFFFF0),
        "data_before_fmt": b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                          + b"data" + struct.pack("<I", 4) + b"\x00" * 4,
    }
    paths = []
    for name, blob in cases.items():
        p = str(tmp_path / f"{name}.wav")
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)

    wins, lengths = native.native_read_windows(paths, 100, list(range(len(paths))))
    assert all(l == -1 for l in lengths)

    from doubleattentionspeakerverification_tpu.data.wav import read_wav

    for p in paths:
        with pytest.raises((ValueError, struct.error)):
            read_wav(p)
