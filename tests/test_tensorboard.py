"""TensorBoard scalar sink (``utils/tensorboard.py`` + MetricLogger wiring).

The writer hand-encodes the protobuf + TFRecord layers, so the tests check
known-answer CRC vectors, roundtrip through our own reader, AND (when the
``tensorboard`` package is importable) cross-validate with TensorBoard's own
EventFileLoader — the actual consumer.
"""

import io
import struct

import pytest

from doubleattentionspeakerverification_tpu.utils.logging import MetricLogger
from doubleattentionspeakerverification_tpu.utils.tensorboard import (
    TensorBoardWriter,
    crc32c,
    masked_crc32c,
    read_scalars,
)


def test_crc32c_known_answers():
    # RFC 3720 / kernel test vectors for CRC32-C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_writer_reader_roundtrip(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, 1)
    w.add_scalar("train/loss", 0.75, 2)
    w.add_scalar("val/eer", 12.5, 2)
    w.close()
    scalars = read_scalars(w.path)
    assert [(s, t, v) for (_, s, t, v) in scalars] == [
        (1, "train/loss", 1.25),
        (2, "train/loss", 0.75),
        (2, "val/eer", 12.5),
    ]
    assert all(wall > 0 for (wall, _, _, _) in scalars)


def test_corruption_is_detected(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 0)
    w.close()
    with open(w.path, "rb") as fh:
        raw = bytearray(fh.read())
    raw[-6] ^= 0xFF  # flip a payload byte of the last record
    bad = tmp_path / "corrupt"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        read_scalars(str(bad))


def test_tensorboard_own_loader_reads_our_files(tmp_path):
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader,
        )
    except Exception:
        pytest.skip("tensorboard package not importable")
    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 3.5, 7)
    w.close()
    events = list(EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    (evt,) = [e for e in events if e.HasField("summary")]
    assert evt.step == 7
    (value,) = evt.summary.value
    assert value.tag == "train/loss"
    # TB >= 2.x normalizes simple_value into a float tensor internally
    got = (
        value.tensor.float_val[0]
        if value.HasField("tensor")
        else value.simple_value
    )
    assert got == 3.5


def test_metric_logger_tensorboard_sink(tmp_path):
    log = MetricLogger(stream=io.StringIO(), tensorboard_dir=str(tmp_path))
    log.log("train", step=10, loss=2.0, acc=0.5, lr=1e-4)
    log.log("validation", step=10, eer=25.0, model="vgg4l")  # string skipped
    log.log("new_best", eer=24.0, path="/x/y.npz")  # no step: reuses last
    log.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    scalars = {(s, t): v for (_, s, t, v) in read_scalars(str(files[0]))}
    assert scalars[(10, "train/loss")] == 2.0
    assert scalars[(10, "train/acc")] == 0.5
    assert scalars[(10, "validation/eer")] == 25.0
    assert scalars[(10, "new_best/eer")] == 24.0
    assert not any(t.endswith("/model") or t.endswith("/path") for (_, t) in scalars)


def test_varint_int64_step_boundaries(tmp_path):
    w = TensorBoardWriter(str(tmp_path))
    for step in (0, 127, 128, 2**31 - 1, 2**40):
        w.add_scalar("s", float(step % 97), step)
    w.close()
    steps = [s for (_, s, _, _) in read_scalars(w.path)]
    assert steps == [0, 127, 128, 2**31 - 1, 2**40]
