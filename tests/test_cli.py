"""CLI end-to-end: wav list -> feature pickles -> training -> embedding."""

import json
import os
import pickle

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.cli.extract_features import main as extract_main
from doubleattentionspeakerverification_tpu.cli.get_embedding import main as embed_main
from doubleattentionspeakerverification_tpu.cli.train import main as train_main
from doubleattentionspeakerverification_tpu.data.wav import write_wav


def _make_wavs(root, n_speakers=3, per_speaker=4, seconds=1.2, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    paths, labels = [], []
    for spk in range(n_speakers):
        f0 = 150 + 90 * spk
        for i in range(per_speaker):
            t = np.arange(int(seconds * sr)) / sr
            y = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.18 * np.sin(2 * np.pi * 2.3 * f0 * t)
            y += 0.02 * rng.standard_normal(len(t))
            p = os.path.join(root, f"spk{spk}_utt{i}.wav")
            write_wav(p, y, sr)
            paths.append(p)
            labels.append(spk)
    return paths, labels


def test_full_cli_pipeline(tmp_path, capsys):
    root = str(tmp_path / "wavs")
    paths, labels = _make_wavs(root)

    # 1. extract features
    lst = tmp_path / "files.lst"
    lst.write_text("".join(p + "\n" for p in paths))
    assert extract_main(["-i", str(lst)]) == 0
    for p in paths:
        pk = p[:-4] + ".pickle"
        assert os.path.exists(pk)
        with open(pk, "rb") as f:
            feats = pickle.load(f)
        assert feats.shape[0] == 80 and feats.shape[1] > 90  # (80, T)

    # 2. labels + trials
    rel = [os.path.relpath(p, root)[:-4] for p in paths]
    (tmp_path / "labels.ndx").write_text(
        "".join(f"{r} {l} -1\n" for r, l in zip(rel, labels))
    )
    (tmp_path / "clients.ndx").write_text(f"{rel[0]} {rel[1]}\n")
    (tmp_path / "impostors.ndx").write_text(f"{rel[0]} {rel[-1]}\n")

    # 3. train a tiny model for a couple of steps
    out_dir = str(tmp_path / "out")
    rc = train_main([
        "--train_data_dir", root,
        "--valid_data_dir", root,
        "--train_labels_path", str(tmp_path / "labels.ndx"),
        "--valid_clients", str(tmp_path / "clients.ndx"),
        "--valid_impostors", str(tmp_path / "impostors.ndx"),
        "--out_dir", out_dir,
        "--kernel_size", "16", "--heads_number", "4", "--embedding_size", "24",
        "--window_size", "0.6", "--batch_size", "3", "--gradientAccumulation", "2",
        "--max_epochs", "1", "--validate_every", "2", "--print_every", "1",
        "--checkpoint_every", "1", "--post_step_bench", "4",
    ])
    assert rc == 0
    ckpts = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert ckpts, os.listdir(out_dir)
    assert any(f.endswith("_config.json") for f in os.listdir(out_dir))
    # the post-training same-session step bench logged a sane ms/step
    metrics = [f for f in os.listdir(out_dir) if f.endswith("_metrics.jsonl")]
    events = [json.loads(l) for l in open(os.path.join(out_dir, metrics[0]))]
    bench = [e for e in events if e["event"] == "step_bench"]
    assert bench and bench[0]["ms_per_step"] > 0

    # 4. embedding CLI from the checkpoint
    ckpt = os.path.join(out_dir, sorted(ckpts)[-1])
    rc = embed_main(["--audioPath", paths[0], "--modelCheckpoint", ckpt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[" in out  # printed embedding vector

    # 5. alignment introspection CLI from the same checkpoint
    from doubleattentionspeakerverification_tpu.cli.alignments import main as align_main

    align_npz = str(tmp_path / "align.npz")
    rc = align_main(["--audioPath", paths[0], "--modelCheckpoint", ckpt,
                     "--output", align_npz])
    assert rc == 0
    with np.load(align_npz) as z:
        time_w, head_w = z["time_alignment"], z["head_alignment"]
    assert time_w.ndim == 2 and time_w.shape[1] == 4  # (T', H) heads=4
    # softmax weights: each head sums to 1 over time, head weights sum to 1
    np.testing.assert_allclose(time_w.sum(axis=0), 1.0, rtol=1e-4)
    np.testing.assert_allclose(head_w.sum(), 1.0, rtol=1e-4)


def test_reference_chkpt_import_roundtrip(tmp_path):
    """Export a reference torch checkpoint -> load through the CLI loader ->
    embeddings match the torch model."""
    pytest.importorskip("torch")
    from conftest import reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    import argparse

    import torch

    from conftest import add_reference_path

    add_reference_path()
    from model import SpeakerClassifier  # reference

    ns = argparse.Namespace(
        front_end="VGG4L", kernel_size=16, embedding_size=24, heads_number=4,
        pooling_method="DoubleMHA", mask_prob=0.3, num_spkrs=5,
        scalingFactor=30.0, marginFactor=0.4, annealing=False,
        window_size=3.5, randomSlicing=False, normalization="cmn",
        optimizer="Adam", learning_rate=1e-4, weight_decay=1e-3,
        batch_size=64, gradientAccumulation=2, max_epochs=10,
        early_stopping=25, print_every=1000, validate_every=10000,
        model_name="CNN", out_dir=str(tmp_path),
    )
    torch.manual_seed(3)
    net = SpeakerClassifier(ns, torch.device("cpu")).eval()
    ckpt_path = str(tmp_path / "ref.chkpt")
    torch.save(
        {"model": net.state_dict(), "optimizer": {}, "settings": ns, "epoch": 2, "step": 7},
        ckpt_path,
    )

    from doubleattentionspeakerverification_tpu.cli.get_embedding import load_model
    from doubleattentionspeakerverification_tpu.models.classifier import get_embedding

    params, state, cfg = load_model(ckpt_path)
    assert cfg.model.kernel_size == 16 and cfg.model.num_spkrs == 5

    x = np.random.default_rng(0).standard_normal((2, 50, 80)).astype(np.float32)
    ours = np.asarray(get_embedding(params, state, x, None, cfg.model))
    with torch.no_grad():
        ref = net.getEmbedding(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_reference_script_shims(tmp_path):
    """`python scripts/train.py` etc. must accept the reference's exact flag
    set (incl. the dead --data_mode / --modelConfig flags)."""
    import subprocess
    import sys

    root = str(tmp_path / "wavs")
    paths, labels = _make_wavs(root, n_speakers=2, per_speaker=3, seconds=0.8)
    lst = tmp_path / "files.lst"
    lst.write_text("".join(p + "\n" for p in paths))
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    r = subprocess.run(
        [sys.executable, "scripts/featureExtractor.py", "-i", str(lst)],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(paths[0][:-4] + ".pickle")

    rel = [os.path.relpath(p, root)[:-4] for p in paths]
    (tmp_path / "labels.ndx").write_text(
        "".join(f"{r_} {l} -1\n" for r_, l in zip(rel, labels))
    )
    (tmp_path / "clients.ndx").write_text(f"{rel[0]} {rel[1]}\n")
    (tmp_path / "impostors.ndx").write_text(f"{rel[0]} {rel[-1]}\n")
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "scripts/train.py",
         "--train_data_dir", root, "--valid_data_dir", root,
         "--train_labels_path", str(tmp_path / "labels.ndx"),
         "--valid_clients", str(tmp_path / "clients.ndx"),
         "--valid_impostors", str(tmp_path / "impostors.ndx"),
         "--out_dir", out_dir,
         "--data_mode", "normal",            # dead reference flag
         "--kernel_size", "16", "--heads_number", "4", "--embedding_size", "24",
         "--window_size", "0.5", "--batch_size", "2", "--gradientAccumulation", "1",
         "--max_epochs", "1", "--validate_every", "0", "--print_every", "1",
         "--checkpoint_every", "1"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=400,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ckpts = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert ckpts

    r = subprocess.run(
        [sys.executable, "scripts/getEmbeddingExample.py",
         "--audioPath", paths[0],
         "--modelConfig", "ignored.pkl",     # reference flag, discarded there too
         "--modelCheckpoint", os.path.join(out_dir, sorted(ckpts)[-1]),
         "--device", "cpu"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[" in r.stdout


def test_reference_dead_flags_and_criterion_accepted():
    """Reference invocations carrying --data_mode (parsed-but-unused there,
    train.py:258) must be drop-in; --criterion selects the focal loss."""
    from doubleattentionspeakerverification_tpu.cli.train import make_parser

    p = make_parser().parse_args(["--data_mode", "normal", "--criterion", "focal"])
    assert p.data_mode == "normal" and p.criterion == "focal"


def test_get_embedding_from_orbax_checkpoint(tmp_path):
    """The embedding CLI loads .orbax checkpoint directories."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from doubleattentionspeakerverification_tpu.cli.get_embedding import (
        embed_wav,
        load_model,
    )
    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.data.wav import write_wav
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import init_train_state
    from doubleattentionspeakerverification_tpu.utils.orbax_ckpt import (
        save_checkpoint_orbax,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=4),
        train=TrainConfig(),
        data=DataConfig(),
    )
    p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(p, ms, cfg)
    ck = str(tmp_path / "m_3.orbax")
    save_checkpoint_orbax(ck, state, {"config": cfg.to_dict(), "step": 3})

    params, model_state, loaded_cfg = load_model(ck)
    assert loaded_cfg.model.embedding_size == 24
    sr = 16000
    t = np.arange(sr) / sr
    wav = str(tmp_path / "probe.wav")
    write_wav(wav, 0.2 * np.sin(2 * np.pi * 300 * t), sr)
    emb = embed_wav(wav, params, model_state, loaded_cfg)
    assert emb.shape == (24,) and np.isfinite(emb).all()


def test_get_embedding_quantize_matches_fp(tmp_path, capsys):
    """`get_embedding --quantize int8[_static]` (CLI symmetry with
    serve/score_trials) prints an embedding that cosine-matches the fp
    run on the same wav (int8 tolerance ~1e-3, models/quantized.py)."""
    import re

    import jax

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import init_train_state
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16,
                          num_spkrs=4),
    )
    p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    ck = str(tmp_path / "m_1.npz")
    save_checkpoint(ck, init_train_state(p, ms, cfg), {"config": cfg.to_dict()})

    sr = 16000
    t = np.arange(int(1.1 * sr)) / sr
    wav = str(tmp_path / "probe.wav")
    write_wav(wav, 0.3 * np.sin(2 * np.pi * 420 * t)
              + 0.05 * np.sin(2 * np.pi * 1310 * t), sr)

    def run(mode):
        rc = embed_main(["--audioPath", wav, "--modelCheckpoint", ck,
                         "--quantize", mode])
        assert rc == 0
        out = capsys.readouterr().out
        vec = np.array([float(v) for v in
                        re.findall(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", out)],
                       np.float32)
        assert vec.shape == (16,), out
        return vec

    fp = run("none")
    for mode in ("int8", "int8_static"):
        q = run(mode)
        cos = float(np.dot(fp, q)
                    / (np.linalg.norm(fp) * np.linalg.norm(q) + 1e-12))
        assert cos > 0.999, (mode, cos)


def test_score_trials_cli(tmp_path):
    import pickle as pkl

    import jax

    from doubleattentionspeakerverification_tpu.cli.score_trials import main as score_main
    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import init_train_state
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4),
        train=TrainConfig(),
        data=DataConfig(),
    )
    p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    ck = str(tmp_path / "m_1.npz")
    save_checkpoint(ck, init_train_state(p, ms, cfg), {"config": cfg.to_dict()})

    rng = np.random.default_rng(0)
    feats = tmp_path / "feats"
    feats.mkdir()
    for u in ("a", "b", "c"):
        with open(feats / f"{u}.pickle", "wb") as f:
            pkl.dump(rng.standard_normal((80, 70)).astype(np.float32), f)
    (tmp_path / "cl.ndx").write_text("a b\n")
    (tmp_path / "im.ndx").write_text("a c\n")

    out = str(tmp_path / "scores.txt")
    rc = score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--clients", str(tmp_path / "cl.ndx"), "--impostors", str(tmp_path / "im.ndx"),
        "--output", out,
    ])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].split()[3] == "target" and lines[1].split()[3] == "nontarget"
    assert all(-1.0 <= float(l.split()[2]) <= 1.0 for l in lines)


def test_score_trials_int8_matches_fp(tmp_path):
    """--quantize int8 runs the batch extraction through the int8 encoder;
    scores must match the fp run to quantization tolerance (~1e-3 cosine,
    models/quantized.py)."""
    import pickle as pkl

    import jax

    from doubleattentionspeakerverification_tpu.cli.score_trials import main as score_main
    from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import init_train_state
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4),
    )
    p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    ck = str(tmp_path / "m_1.npz")
    save_checkpoint(ck, init_train_state(p, ms, cfg), {"config": cfg.to_dict()})

    rng = np.random.default_rng(1)
    feats = tmp_path / "feats"
    feats.mkdir()
    for u in ("a", "b", "c"):
        with open(feats / f"{u}.pickle", "wb") as f:
            pkl.dump(rng.standard_normal((80, 70)).astype(np.float32), f)
    (tmp_path / "tr.ndx").write_text("a b\na c\nb c\n")

    outs = {}
    for mode in ("none", "int8", "int8_static"):
        out = str(tmp_path / f"scores_{mode}.txt")
        rc = score_main([
            "--modelCheckpoint", ck, "--data_dir", str(feats),
            "--trials", str(tmp_path / "tr.ndx"), "--output", out,
            "--quantize", mode,
        ])
        assert rc == 0
        outs[mode] = [float(l.split()[2]) for l in open(out).read().strip().splitlines()]
    np.testing.assert_allclose(outs["int8"], outs["none"], atol=5e-3)
    # static: the first extractor batch doubles as the calibration batch
    np.testing.assert_allclose(outs["int8_static"], outs["none"], atol=5e-3)


def test_bench_watchdog_recovers_from_wedged_attempt(tmp_path):
    """bench.py parent harness: a wedged first attempt is killed at the
    attempt timeout and the retry's JSON line is forwarded (the relayed TPU
    backend intermittently wedges inside backend calls)."""
    import subprocess
    import sys as _sys

    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    fake = '{"metric": "train_throughput", "value": 1.0, "unit": "audio_s/s/chip", "vs_baseline": 1.0}'
    env = {
        **os.environ,
        "DMHA_BENCH_FAKE_RESULT": fake,
        "DMHA_BENCH_HANG_ONCE": str(tmp_path / "marker"),
        "DMHA_BENCH_ATTEMPT_TIMEOUT_S": "5",
        "DMHA_BENCH_ATTEMPTS": "2",
    }
    r = subprocess.run(
        [_sys.executable, bench], env=env, capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0
    assert fake in r.stdout
    assert "attempt 1/2: timed out" in r.stderr

    # all attempts wedged -> nonzero exit, no JSON on stdout
    (tmp_path / "m2").mkdir()  # fresh marker dir
    env["DMHA_BENCH_HANG_ONCE"] = str(tmp_path / "m2" / "marker")
    env["DMHA_BENCH_ATTEMPTS"] = "1"
    r = subprocess.run(
        [_sys.executable, bench], env=env, capture_output=True, text=True, timeout=60
    )
    assert r.returncode != 0
    assert '"metric"' not in r.stdout


def test_score_trials_embedding_store(tmp_path):
    """--save_embeddings writes a reusable store; --load_embeddings scores
    from it without running the model (missing utterances still computed)."""
    import pickle as pkl

    import jax

    from doubleattentionspeakerverification_tpu.cli.score_trials import main as score_main
    from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        load_embeddings,
        save_embeddings,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import init_train_state
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4)
    )
    p, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    ck = str(tmp_path / "m_1.npz")
    save_checkpoint(ck, init_train_state(p, ms, cfg), {"config": cfg.to_dict()})

    rng = np.random.default_rng(0)
    feats = tmp_path / "feats"
    feats.mkdir()
    for u in ("a", "b"):
        with open(feats / f"{u}.pickle", "wb") as f:
            pkl.dump(rng.standard_normal((80, 70)).astype(np.float32), f)
    (tmp_path / "tr.ndx").write_text("a b\n")
    store = str(tmp_path / "embs.npz")

    out1 = str(tmp_path / "s1.txt")
    assert score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--trials", str(tmp_path / "tr.ndx"), "--output", out1,
        "--save_embeddings", store,
    ]) == 0
    embs = load_embeddings(store)
    assert set(embs) == {"a", "b"} and embs["a"].shape == (16,)

    # round-trip helper sanity (ids with slashes survive)
    save_embeddings(str(tmp_path / "e2.npz"), {"spk1/x": embs["a"]})
    assert set(load_embeddings(str(tmp_path / "e2.npz"))) == {"spk1/x"}

    # poison the features: scoring from the store must not read them
    for u in ("a", "b"):
        (feats / f"{u}.pickle").write_bytes(b"not a pickle")
    out2 = str(tmp_path / "s2.txt")
    assert score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--trials", str(tmp_path / "tr.ndx"), "--output", out2,
        "--load_embeddings", store,
    ]) == 0
    assert open(out1).read() == open(out2).read()


def test_embedding_store_quantize_tag(tmp_path):
    """The store records which model path produced it; consuming it from a
    run with a different quantize mode warns (int8 vs fp embeddings drift
    ~1e-3 cosine and must not silently mix in parity EERs)."""
    import warnings

    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        load_embeddings,
        save_embeddings,
    )

    emb = {"a": np.ones((8,), np.float32)}
    fp_store = str(tmp_path / "fp.npz")
    q_store = str(tmp_path / "q.npz")
    save_embeddings(fp_store, emb)                      # default tag: none
    save_embeddings(q_store, emb, quantize="int8")

    with warnings.catch_warnings():
        warnings.simplefilter("error")                  # no warning allowed
        assert set(load_embeddings(fp_store, expect_quantize="none")) == {"a"}
        assert set(load_embeddings(q_store, expect_quantize="int8")) == {"a"}
        assert set(load_embeddings(q_store)) == {"a"}   # no expectation given
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_embeddings(q_store, expect_quantize="none")
        load_embeddings(fp_store, expect_quantize="int8")
    assert len(w) == 2 and all("quantize" in str(x.message) for x in w)

    # stores predating the tag read as fp
    ids = np.asarray(["a"], dtype=np.str_)
    np.savez(str(tmp_path / "old.npz"), ids=ids,
             embeddings=np.ones((1, 8), np.float32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_embeddings(str(tmp_path / "old.npz"), expect_quantize="none")
        assert not w
        load_embeddings(str(tmp_path / "old.npz"), expect_quantize="int8")
        assert len(w) == 1
