"""Two-covariance PLDA backend (evaluation/plda.py + train_plda/score_trials
CLI wiring). Beyond-reference capability: the reference scores cosine only
(scripts/utils.py:18-21)."""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.evaluation.plda import PLDA, _length_norm


def _sample(rng, n_speakers, per_speaker, d, between_scale, within_diag):
    """Draw from the PLDA generative model: y ~ N(mu, B), x = y + N(0, W)."""
    mu = rng.standard_normal(d)
    b_sqrt = between_scale * np.eye(d)
    w_sqrt = np.sqrt(within_diag)
    xs, labels = [], []
    for s in range(n_speakers):
        y = mu + b_sqrt @ rng.standard_normal(d)
        for _ in range(per_speaker):
            xs.append(y + w_sqrt * rng.standard_normal(d))
            labels.append(s)
    return np.stack(xs), np.array(labels)


def test_llr_formula_matches_joint_gaussian_oracle():
    """score_pairs must equal log N([x1;x2]; C_same) - log N(.; C_diff)
    computed with the full 2d-dimensional Gaussians."""
    rng = np.random.default_rng(0)
    d = 5
    a = rng.standard_normal((d, d))
    b = a @ a.T + np.eye(d)
    c = rng.standard_normal((d, d))
    w = c @ c.T + np.eye(d)
    mu = rng.standard_normal(d)
    plda = PLDA(mu=mu, between=b, within=w, length_norm=False)

    t = b + w
    same = np.block([[t, b], [b, t]])
    diff = np.block([[t, np.zeros((d, d))], [np.zeros((d, d)), t]])

    def logpdf(v, cov):
        sign, logdet = np.linalg.slogdet(cov)
        return -0.5 * (v @ np.linalg.solve(cov, v) + logdet + len(v) * np.log(2 * np.pi))

    x1 = rng.standard_normal((3, d))
    x2 = rng.standard_normal((3, d))
    got = plda.score_pairs(x1, x2)
    for i in range(3):
        v = np.concatenate([x1[i] - mu, x2[i] - mu])
        want = logpdf(v, same) - logpdf(v, diff)
        assert got[i] == pytest.approx(want, rel=1e-10)


def test_score_symmetry_and_batch_shape():
    rng = np.random.default_rng(1)
    x, y = _sample(rng, 8, 4, 6, 1.0, np.full(6, 0.3))
    plda = PLDA.fit(x, y, n_iters=5)
    a, b = rng.standard_normal((4, 6)), rng.standard_normal((4, 6))
    s_ab = plda.score_pairs(a, b)
    s_ba = plda.score_pairs(b, a)
    assert s_ab.shape == (4,)
    np.testing.assert_allclose(s_ab, s_ba, rtol=1e-8)


def test_em_separates_better_than_cosine_under_anisotropic_noise():
    """When within-speaker noise is large along some dimensions, cosine
    treats all dimensions equally but PLDA learns to down-weight the noisy
    ones — the reason to have the backend at all."""
    rng = np.random.default_rng(2)
    d = 12
    within = np.concatenate([np.full(6, 2.0), np.full(6, 0.02)])
    x, y = _sample(rng, 30, 6, d, 1.0, within)
    plda = PLDA.fit(x, y, n_iters=10, length_norm=False)

    # held-out trials from fresh speakers
    xt, yt = _sample(rng, 20, 2, d, 1.0, within)
    clients = [(2 * i, 2 * i + 1) for i in range(20)]
    impostors = [(2 * i, (2 * i + 3) % 40) for i in range(20)]

    from doubleattentionspeakerverification_tpu.evaluation.eer import (
        cosine_scores,
        eer_exact,
    )

    def pairs(trials, fn):
        return fn(np.stack([xt[i] for i, _ in trials]),
                  np.stack([xt[j] for _, j in trials]))

    eer_cos = eer_exact(pairs(clients, cosine_scores), pairs(impostors, cosine_scores))
    eer_plda = eer_exact(pairs(clients, plda.score_pairs),
                         pairs(impostors, plda.score_pairs))
    assert eer_plda < eer_cos


def test_em_recovers_covariance_scale():
    """On data sampled from the model, EM's recovered within-covariance is
    close to the truth (between has only n_speakers samples, so check the
    tighter within estimate)."""
    rng = np.random.default_rng(3)
    d = 8
    within_diag = np.full(d, 0.5)
    x, y = _sample(rng, 60, 10, d, 1.0, within_diag)
    plda = PLDA.fit(x, y, n_iters=15, length_norm=False)
    rel = np.linalg.norm(plda.within - np.diag(within_diag)) / np.linalg.norm(
        np.diag(within_diag)
    )
    assert rel < 0.15


def test_single_utterance_speakers_ok():
    rng = np.random.default_rng(4)
    x, y = _sample(rng, 10, 1, 6, 1.0, np.full(6, 0.2))
    plda = PLDA.fit(x, y, n_iters=3)
    assert np.isfinite(plda.score_pairs(x[:2], x[2:4])).all()


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    x, y = _sample(rng, 6, 3, 5, 1.0, np.full(5, 0.3))
    plda = PLDA.fit(x, y, n_iters=3)
    path = str(tmp_path / "plda.npz")
    plda.save(path)
    back = PLDA.load(path)
    a, b = rng.standard_normal((3, 5)), rng.standard_normal((3, 5))
    np.testing.assert_allclose(plda.score_pairs(a, b), back.score_pairs(a, b))
    assert back.length_norm == plda.length_norm


def test_length_norm_applied_consistently():
    rng = np.random.default_rng(6)
    x, y = _sample(rng, 8, 4, 6, 1.0, np.full(6, 0.3))
    plda = PLDA.fit(x, y, n_iters=4, length_norm=True)
    a, b = rng.standard_normal((2, 6)), rng.standard_normal((2, 6))
    # scaling inputs must not change scores when length_norm is on
    np.testing.assert_allclose(
        plda.score_pairs(a, b), plda.score_pairs(5.0 * a, 0.1 * b), rtol=1e-8
    )
    assert np.allclose(np.linalg.norm(_length_norm(a), axis=1), 1.0)


def test_train_plda_and_score_trials_cli(tmp_path):
    """Full workflow: embed -> store -> train_plda -> score with --plda."""
    import pickle as pkl

    import jax

    from doubleattentionspeakerverification_tpu.cli.score_trials import main as score_main
    from doubleattentionspeakerverification_tpu.cli.train_plda import main as plda_main
    from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
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
    utts = [f"s{s}u{i}" for s in range(3) for i in range(2)]
    for u in utts:
        with open(feats / f"{u}.pickle", "wb") as f:
            pkl.dump(rng.standard_normal((80, 60)).astype(np.float32), f)
    # embed everything via an unlabeled trial list, save the store
    (tmp_path / "all.ndx").write_text(
        "".join(f"{utts[i]} {utts[i+1]}\n" for i in range(0, 6, 2))
    )
    store = str(tmp_path / "embs.npz")
    assert score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--trials", str(tmp_path / "all.ndx"),
        "--output", str(tmp_path / "null.txt"), "--save_embeddings", store,
    ]) == 0

    (tmp_path / "labels.ndx").write_text(
        "".join(f"s{s}u{i} {s} -1\n" for s in range(3) for i in range(2))
        + "missing_utt 0 -1\n"
    )
    model_path = str(tmp_path / "plda.npz")
    assert plda_main([
        "--embeddings", store, "--labels", str(tmp_path / "labels.ndx"),
        "--output", model_path, "--n_iters", "3",
    ]) == 0

    (tmp_path / "cl.ndx").write_text("s0u0 s0u1\n")
    (tmp_path / "im.ndx").write_text("s0u0 s1u0\n")
    out = str(tmp_path / "scores.txt")
    assert score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--clients", str(tmp_path / "cl.ndx"), "--impostors", str(tmp_path / "im.ndx"),
        "--output", out, "--plda", model_path, "--load_embeddings", store,
    ]) == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        cols = line.split()
        float(cols[2])  # LLR parses
        assert cols[3].startswith("raw=") and cols[4] in ("target", "nontarget")

    # exclusivity guard
    with pytest.raises(SystemExit):
        score_main([
            "--modelCheckpoint", ck, "--data_dir", str(feats),
            "--trials", str(tmp_path / "all.ndx"), "--plda", model_path,
            "--cohort", str(tmp_path / "all.ndx"),
        ])
