"""AS-Norm / S-norm score normalization (evaluation/snorm.py + CLI flags).

The reference scores raw cosine only (scripts/train.py:117-133); AS-Norm is
a capability beyond it, so these tests pin the math against a naive loop
oracle and the CLI wiring end-to-end.
"""

import pickle as pkl

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.evaluation.snorm import (
    asnorm_trial_scores,
    cohort_stats,
)


def _unit(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def _oracle_stats(embs, cohort, topk):
    """Per-row mean/std over top-K cohort cosines, straight loop."""
    mus, sds = [], []
    for e in embs:
        s = np.sort([float(_unit(e[None])[0] @ c) for c in _unit(cohort)])
        if 0 < topk < len(s):
            s = s[-topk:]
        mus.append(np.mean(s))
        sds.append(max(np.std(s), 1e-8))
    return np.array(mus), np.array(sds)


@pytest.mark.parametrize("topk", [0, 3, 100])
def test_cohort_stats_matches_loop_oracle(topk):
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((5, 12))
    cohort = rng.standard_normal((20, 12))
    mu, sd = cohort_stats(embs, cohort, topk)
    mu_o, sd_o = _oracle_stats(embs, cohort, topk)
    np.testing.assert_allclose(mu, mu_o, atol=1e-10)
    np.testing.assert_allclose(sd, sd_o, atol=1e-10)


def test_asnorm_trial_scores_formula():
    rng = np.random.default_rng(1)
    embeddings = {u: rng.standard_normal(8) for u in "abcd"}
    cohort = rng.standard_normal((15, 8))
    trials = [("a", "b"), ("c", "d"), ("a", "d")]
    got = asnorm_trial_scores(trials, embeddings, cohort, topk=5)

    mu, sd = _oracle_stats(np.stack([embeddings[u] for u in "abcd"]), cohort, 5)
    stat = dict(zip("abcd", zip(mu, sd)))
    for i, (a, b) in enumerate(trials):
        ea, eb = _unit(embeddings[a][None])[0], _unit(embeddings[b][None])[0]
        raw = float(ea @ eb)
        want = 0.5 * (
            (raw - stat[a][0]) / stat[a][1] + (raw - stat[b][0]) / stat[b][1]
        )
        assert got[i] == pytest.approx(want, abs=1e-10)


def test_asnorm_removes_per_utterance_offset():
    """A shared nuisance direction inflates every raw cosine of the affected
    utterances; normalizing against a cohort drawn from the same domain
    restores target/impostor separation (the reason S-norm exists)."""
    rng = np.random.default_rng(2)
    d = 32
    nuisance = rng.standard_normal(d)
    nuisance /= np.linalg.norm(nuisance)

    def spk(offset):
        v = rng.standard_normal(d)
        return v / np.linalg.norm(v) + offset * nuisance

    # two utterances per speaker; half the speakers carry the offset
    embeddings, clients, impostors = {}, [], []
    for i in range(16):
        off = 3.0 if i % 2 else 0.0
        base = spk(off)
        embeddings[f"s{i}a"] = base + 0.1 * rng.standard_normal(d)
        embeddings[f"s{i}b"] = base + 0.1 * rng.standard_normal(d)
        clients.append((f"s{i}a", f"s{i}b"))
    for i in range(0, 16, 2):
        impostors.append((f"s{i}a", f"s{i+1}b"))  # clean vs offset speaker
        impostors.append((f"s{i+1}a", f"s{(i+3) % 16}b"))  # offset vs offset

    cohort = np.stack(
        [spk(3.0 if i % 2 else 0.0) for i in range(64)]
    )

    from doubleattentionspeakerverification_tpu.evaluation.eer import (
        cosine_scores,
        eer_exact,
    )

    def raw(trials):
        e1 = np.stack([embeddings[a] for a, _ in trials])
        e2 = np.stack([embeddings[b] for _, b in trials])
        return cosine_scores(e1, e2)

    eer_raw = eer_exact(raw(clients), raw(impostors))
    eer_sn = eer_exact(
        asnorm_trial_scores(clients, embeddings, cohort, topk=16),
        asnorm_trial_scores(impostors, embeddings, cohort, topk=16),
    )
    assert eer_sn < eer_raw


def test_cohort_stats_rejects_empty_cohort():
    with pytest.raises(ValueError):
        cohort_stats(np.zeros((2, 4)), np.zeros((0, 4)))


def test_score_trials_cli_snorm(tmp_path):
    """--cohort / --cohort_embeddings / --snorm_topk end-to-end: normalized
    scores written with a raw= column, snorm metrics in the summary, and the
    id-list and embedding-store cohort paths agree."""
    import jax

    from doubleattentionspeakerverification_tpu.cli.score_trials import main as score_main
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
    for u in ("a", "b", "c", "k1", "k2", "k3"):
        with open(feats / f"{u}.pickle", "wb") as f:
            pkl.dump(rng.standard_normal((80, 70)).astype(np.float32), f)
    (tmp_path / "cl.ndx").write_text("a b\n")
    (tmp_path / "im.ndx").write_text("a c\n")
    (tmp_path / "cohort.lst").write_text("k1\nk2\nk3\n")

    out = str(tmp_path / "scores.txt")
    store = str(tmp_path / "cohort_embs.npz")
    rc = score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--clients", str(tmp_path / "cl.ndx"), "--impostors", str(tmp_path / "im.ndx"),
        "--output", out, "--cohort", str(tmp_path / "cohort.lst"),
        "--snorm_topk", "2", "--save_embeddings", store,
    ])
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        cols = line.split()
        assert cols[3].startswith("raw=") and cols[4] in ("target", "nontarget")
        assert -1.0 <= float(cols[3][4:]) <= 1.0  # raw cosine stays bounded
        float(cols[2])  # normalized z-score parses

    # the saved store contains trial + cohort utterances; feeding it back as
    # --cohort_embeddings must reproduce the same normalized scores as the
    # id-list path (same cohort rows: k1..k3 only)
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        load_embeddings,
        save_embeddings,
    )

    embs = load_embeddings(store)
    assert {"a", "b", "c", "k1", "k2", "k3"} <= set(embs)
    cohort_only = {u: embs[u] for u in ("k1", "k2", "k3")}
    save_embeddings(str(tmp_path / "k.npz"), cohort_only)
    out2 = str(tmp_path / "scores2.txt")
    rc = score_main([
        "--modelCheckpoint", ck, "--data_dir", str(feats),
        "--clients", str(tmp_path / "cl.ndx"), "--impostors", str(tmp_path / "im.ndx"),
        "--output", out2, "--cohort_embeddings", str(tmp_path / "k.npz"),
        "--snorm_topk", "2",
    ])
    assert rc == 0
    assert open(out).read() == open(out2).read()
