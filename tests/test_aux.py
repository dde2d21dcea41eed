"""Aux subsystems: profiling meter, distributed init (single host), VAD,
alignment introspection, logging."""

import numpy as np

import jax

from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.data.vad import EnergyVAD, feature_reader
from doubleattentionspeakerverification_tpu.models.classifier import (
    get_alignments,
    init_speaker_classifier,
)
from doubleattentionspeakerverification_tpu.parallel.distributed import initialize
from doubleattentionspeakerverification_tpu.utils.logging import MetricLogger
from doubleattentionspeakerverification_tpu.utils.profiling import ThroughputMeter


def test_throughput_meter():
    m = ThroughputMeter(window_audio_s=3.5, samples_per_step=128, n_chips=2)
    assert m.audio_seconds_per_second_per_chip() is None
    m.step(10)
    v = m.audio_seconds_per_second_per_chip()
    assert v is not None and v > 0
    assert m.steps_per_second() > 0


def test_distributed_single_host():
    info = initialize()
    assert info.num_hosts == 1
    assert info.host_id == 0
    assert info.global_device_count >= 1


def test_energy_vad(tmp_path):
    rng = np.random.default_rng(0)
    # 60 loud frames + 40 near-silent frames (log-mel floor is 0)
    loud = rng.uniform(5, 10, (80, 60))
    silent = rng.uniform(0.0, 0.2, (80, 40))
    feats = np.concatenate([loud, silent], axis=1)
    vad = EnergyVAD(threshold_db=10)
    kept = vad.filter(feats)
    assert 50 <= kept.shape[1] <= 65  # drops (most of) the silence
    mask = vad.frame_mask(feats)
    assert mask[:60].mean() > 0.9 and mask[60:].mean() < 0.2

    import pickle

    p = tmp_path / "f.pickle"
    with open(p, "wb") as f:
        pickle.dump(feats, f)
    out = feature_reader(str(p), vad)
    assert out.shape == (kept.shape[1], 80)
    out_plain = feature_reader(str(p), None)
    assert out_plain.shape == (100, 80)


def test_get_alignments_double_mha():
    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=5)
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((2, 47, 80)).astype(np.float32)
    lens = np.array([47, 30], np.int32)
    w, head_w = get_alignments(params, state, x, lens, cfg)
    t_out = -(-47 // 16)
    assert w.shape == (2, t_out, 4)
    assert head_w.shape == (2, 4)
    # alignments are softmax distributions
    np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(head_w).sum(axis=-1), 1.0, atol=1e-5)
    # masked time steps carry zero weight for the shorter item
    t_valid = -(-30 // 16)
    assert np.all(np.asarray(w)[1, t_valid:, :] < 1e-6)


def test_metric_logger_jsonl(tmp_path):
    import json

    p = str(tmp_path / "m.jsonl")
    log = MetricLogger(jsonl_path=p)
    log.log("train", step=3, loss=1.25)
    log.close()
    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "train" and rec["loss"] == 1.25


def test_watchdog_detects_stall():
    import time

    from doubleattentionspeakerverification_tpu.utils.watchdog import Watchdog

    events = []
    wd = Watchdog(timeout_s=0.2, poll_s=0.05,
                  on_stall=lambda age, step: events.append((age, step)))
    with wd:
        wd.beat(1)
        time.sleep(0.5)  # no beats -> stall fires
    assert wd.stall_count >= 1
    assert events and events[0][1] == 1

    wd2 = Watchdog(timeout_s=5.0, poll_s=0.05)
    with wd2:
        for s in range(3):
            wd2.beat(s)
            time.sleep(0.05)
    assert wd2.stall_count == 0


def test_speaker_embedding_model_api(tmp_path):
    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel
    from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
    from doubleattentionspeakerverification_tpu.data.wav import write_wav

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=5)
    )
    model = SpeakerEmbeddingModel.from_random_init(cfg)

    sr = 16000
    t = np.arange(sr) / sr
    w1 = str(tmp_path / "a.wav"); write_wav(w1, 0.3 * np.sin(2 * np.pi * 220 * t), sr)
    w2 = str(tmp_path / "b.wav"); write_wav(w2, 0.3 * np.sin(2 * np.pi * 450 * t), sr)

    e = model.embed_wav(w1)
    assert e.shape == (24,) and np.all(np.isfinite(e))
    s_self = model.score_wavs(w1, w1)
    s_cross = model.score_wavs(w1, w2)
    assert s_self == pytest.approx(1.0, abs=1e-5)
    assert -1.0 <= s_cross <= 1.0
    assert model.verify(w1, w1, threshold=0.99)

    # batched features path
    feats = np.random.default_rng(0).standard_normal((3, 40, 80)).astype(np.float32)
    embs = model.embed_features(feats, np.array([40, 30, 20], np.int32))
    assert embs.shape == (3, 24)


import pytest  # noqa: E402


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from doubleattentionspeakerverification_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "trace")):
        with annotate("matmul"):
            (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os

    assert any(os.scandir(str(tmp_path / "trace")))


def test_step_profiler_window(tmp_path):
    """StepProfiler traces exactly [start, start+n) and writes a capture."""
    import os

    import jax.numpy as jnp

    from doubleattentionspeakerverification_tpu.utils.profiling import StepProfiler

    logdir = str(tmp_path / "prof")
    p = StepProfiler(logdir, start_step=2, num_steps=2)
    events = {}
    x = jnp.ones((8, 8))
    for step in range(6):
        evt = p.before_step(step, sync=x.sum())
        if evt:
            events[step] = evt
        x = x @ x
    p.close(sync=x.sum())
    assert events == {2: "started", 4: "stopped"}
    assert p.done and not p.active
    assert any(os.scandir(logdir))

    # off by default: empty dir never starts
    off = StepProfiler("", 0, 1)
    assert off.before_step(0) is None and off.done


def test_step_profiler_close_mid_window(tmp_path):
    """Training ending inside the window still finalizes the capture."""
    import os

    from doubleattentionspeakerverification_tpu.utils.profiling import StepProfiler

    logdir = str(tmp_path / "prof2")
    p = StepProfiler(logdir, start_step=0, num_steps=100)
    assert p.before_step(0) == "started"
    p.close()
    assert p.done and not p.active
    assert any(os.scandir(logdir))


def test_corrupt_checkpoint_errors_cleanly(tmp_path):
    import pytest as _pytest

    from doubleattentionspeakerverification_tpu.utils.checkpoint import load_checkpoint

    p = str(tmp_path / "bad_1.npz")
    open(p, "wb").write(b"not an npz")
    with _pytest.raises(Exception):
        load_checkpoint(p, {"a": np.zeros(3)})

    # shape mismatch detected
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    good = str(tmp_path / "good_1.npz")
    save_checkpoint(good, {"a": np.zeros(3)}, {})
    with _pytest.raises(ValueError, match="shape mismatch"):
        load_checkpoint(good, {"a": np.zeros(4)})
    with _pytest.raises(KeyError):
        load_checkpoint(good, {"b": np.zeros(3)})


def test_long_utterance_embedding_finite():
    import jax

    from doubleattentionspeakerverification_tpu.config import ModelConfig
    from doubleattentionspeakerverification_tpu.models.classifier import (
        get_embedding,
        init_speaker_classifier,
    )

    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=5)
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    # 80 s utterance with a short one padded in the same bucket
    x = np.random.default_rng(0).standard_normal((2, 8000, 80)).astype(np.float32) * 5
    lens = np.array([8000, 123], np.int32)
    emb = np.asarray(get_embedding(params, state, x, lens, cfg))
    assert np.all(np.isfinite(emb))
    # the short item must match its unpadded forward exactly
    e_short = np.asarray(get_embedding(params, state, x[1:2, :123], None, cfg))
    np.testing.assert_allclose(emb[1], e_short[0], atol=3e-5)


def test_dispatch_latency_hint(tmp_path):
    """A window averaging >20 ms/step of dispatch (synchronous transfer on a
    relayed link) logs ONE actionable perf_hint recommending
    --device_prefetch (trainer.py print-window accounting)."""
    import pickle
    import time as _time

    import jax

    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.training.trainer import Trainer

    feats_dir = tmp_path / "f"
    feats_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        with open(feats_dir / f"u{i}.pickle", "wb") as f:
            pickle.dump(rng.standard_normal((80, 60)).astype(np.float32), f)
        lines.append(f"u{i} {i % 2} -1\n")
    lbl = tmp_path / "l.ndx"
    lbl.write_text("".join(lines))
    cfg = ExperimentConfig(
        out_dir=str(tmp_path / "o"),
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
        train=TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=1,
                          max_epochs=4, print_every=8, validate_every=0),
        data=DataConfig(train_data_dir=str(feats_dir), train_labels_path=str(lbl),
                        num_workers=1),
    )

    class Rec:
        def __init__(self):
            self.events = []

        def log(self, e, **f):
            self.events.append((e, f))

        def close(self):
            pass

    rec = Rec()
    tr = Trainer(cfg, logger=rec)
    real = tr.train_step

    def slow(*a, **k):
        _time.sleep(0.03)
        return real(*a, **k)

    tr.train_step = slow
    tr.train()
    hints = [f for e, f in rec.events if e == "perf_hint"]
    assert len(hints) == 1  # once, not per window
    assert hints[0]["dispatch_ms_per_step"] > 20


def test_stall_exit_kills_wedged_training(tmp_path):
    """stall_exit_s > 0: a training process whose first step never completes
    must exit(17) (requeue-able) instead of hanging forever."""
    import os
    import subprocess
    import sys
    import textwrap

    from test_data import make_synthetic_features

    make_synthetic_features(str(tmp_path / "feats"), 2, 4)
    code = textwrap.dedent(f"""
        import jax; jax.config.update("jax_platforms", "cpu")
        import sys; sys.path.insert(0, {repr(os.getcwd())})
        import dataclasses
        import numpy as np
        from doubleattentionspeakerverification_tpu.config import (
            DataConfig, ExperimentConfig, ModelConfig, TrainConfig)
        from doubleattentionspeakerverification_tpu.training.trainer import Trainer

        cfg = ExperimentConfig(
            model_name="t", out_dir={repr(str(tmp_path / 'out'))},
            model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
            train=TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=2,
                              validate_every=0, stall_exit_s=4.0, max_epochs=1),
            data=DataConfig(train_data_dir={repr(str(tmp_path / 'feats'))},
                            train_labels_path="unused"),
        )
        tr = Trainer.__new__(Trainer)  # skip __init__'s data loading
        # minimal attrs for train()
        import time, itertools
        from doubleattentionspeakerverification_tpu.utils.logging import MetricLogger
        from doubleattentionspeakerverification_tpu.utils.checkpoint import AsyncCheckpointer
        tr.cfg = cfg; tr.log = MetricLogger(); tr.mesh = None
        tr.host_id = 0; tr.num_hosts = 1
        tr.model_name = cfg.derived_model_name()
        tr._print_t0 = 0.0; tr._pause_s = 0.0
        tr.best_eer = 50.0; tr.stopping = 0; tr.starting_epoch = 0; tr.epoch = 0
        tr.best_ckpt_path = None; tr._checkpointer = AsyncCheckpointer()
        import jax as _j
        from doubleattentionspeakerverification_tpu.models.classifier import init_speaker_classifier
        from doubleattentionspeakerverification_tpu.training.step import init_train_state
        p, ms = init_speaker_classifier(_j.random.PRNGKey(0), cfg.model)
        tr.state = init_train_state(p, ms, cfg)
        class WedgedLoader:  # first batch never arrives
            def steps_per_epoch(self): return 1
            def epoch(self, e):
                time.sleep(3600)
                yield {{}}
        tr.loader = WedgedLoader()
        tr.train_step = None  # never reached
        tr.train()
    """)
    # watchdog polls every 5 s: stall detected ~5 s in, exit by ~10 s
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 17, (proc.returncode, proc.stdout[-500:], proc.stderr[-500:])
    assert "stall_exit" in proc.stdout
    assert "Thread" in proc.stderr  # faulthandler dumped stacks
