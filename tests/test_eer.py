"""EER semantics tests: vectorized implementation vs a literal oracle of the
reference's loops (``train.py:135-149``, ``utils.py:5-16``)."""

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.evaluation.eer import (
    cosine_scores,
    eer_exact,
    eer_reference,
)


def _score_oracle(scores, th, rate):
    # reference utils.Score (utils.py:5-16)
    count = 0.0
    for sc in scores:
        if rate == "FAR" and float(sc) >= float(th):
            count += 1
        elif rate == "FRR" and float(sc) < float(th):
            count += 1
    return round(count * 100 / float(len(scores)), 4)


def _eer_oracle(CL, IM):
    # reference Trainer.__calculate_EER (train.py:135-149)
    thresholds = np.arange(-1, 1, 0.01)
    FRR, FAR = np.zeros(len(thresholds)), np.zeros(len(thresholds))
    for idx, th in enumerate(thresholds):
        FRR[idx] = _score_oracle(CL, th, "FRR")
        FAR[idx] = _score_oracle(IM, th, "FAR")
    idxs = np.argwhere(np.diff(np.sign(FAR - FRR)) != 0).reshape(-1)
    if len(idxs) > 0:
        i = int(idxs[0])
        return round((FAR[i] + FRR[i]) / 2, 4)
    return 50.00


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_eer_reference_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    clients = np.clip(rng.normal(0.6, 0.25, 500), -1, 1)
    impostors = np.clip(rng.normal(0.1, 0.25, 800), -1, 1)
    assert eer_reference(clients, impostors) == _eer_oracle(clients, impostors)


def test_eer_edge_semantics():
    # all scores above the grid on the same side: no sign change -> 50.0
    # (train.py:147-149 fallback)
    assert eer_reference(np.full(5, 2.0), np.full(5, 2.0)) == 50.00
    # reference quirk: a degenerate step distribution (all clients equal, all
    # impostors equal) makes FAR jump 100->0 at the sign change, giving 50.0
    assert eer_reference(np.full(10, 0.99), np.full(10, -0.99)) == 50.00
    assert _eer_oracle(np.full(10, 0.99), np.full(10, -0.99)) == 50.00
    # graded well-separated scores: EER ~ (1 impostor step)/2 = 100/n/2
    rng = np.random.default_rng(0)
    clients = rng.uniform(0.3, 0.9, 500)
    impostors = rng.uniform(-0.9, -0.3, 500)
    e = eer_reference(clients, impostors)
    assert e == _eer_oracle(clients, impostors)
    assert e <= 1.0


def test_eer_exact_sanity():
    rng = np.random.default_rng(0)
    clients = rng.normal(0.7, 0.1, 2000)
    impostors = rng.normal(0.0, 0.1, 2000)
    e = eer_exact(clients, impostors)
    ref = eer_reference(np.clip(clients, -1, 1), np.clip(impostors, -1, 1))
    assert 0 <= e <= 100
    assert abs(e - ref) < 1.0  # same ballpark as grid EER
    # fully overlapping distributions -> ~50%
    same = rng.normal(0, 1, 4000)
    assert abs(eer_exact(same[:2000], same[2000:]) - 50.0) < 5.0


def test_cosine_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    a = rng.standard_normal((32, 40)).astype(np.float32)
    b = rng.standard_normal((32, 40)).astype(np.float32)
    ours = cosine_scores(a, b)
    ref = F.cosine_similarity(torch.tensor(a), torch.tensor(b), dim=-1, eps=1e-8).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_min_dcf():
    from doubleattentionspeakerverification_tpu.evaluation.eer import min_dcf

    rng = np.random.default_rng(0)
    # perfectly separable -> minDCF ~ 0
    assert min_dcf(rng.uniform(0.5, 1, 200), rng.uniform(-1, -0.5, 200)) < 1e-9
    # fully overlapped -> minDCF ~ 1 (the "accept everything/nothing" cost)
    same = rng.normal(0, 1, 4000)
    v = min_dcf(same[:2000], same[2000:])
    assert 0.8 <= v <= 1.01
    # partial overlap sits in between
    v2 = min_dcf(rng.normal(1.0, 0.5, 2000), rng.normal(0.0, 0.5, 2000))
    assert 0.0 < v2 < 0.9


def test_bucket_beyond_grid_rounds_up_not_truncates():
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        DEFAULT_BUCKETS,
        bucket_for,
    )

    assert bucket_for(300, DEFAULT_BUCKETS) == 350
    big = DEFAULT_BUCKETS[-1]
    # longer than every static bucket: rounded UP (reference embeds full
    # length, train.py:107-133), never truncated
    assert bucket_for(big + 1, DEFAULT_BUCKETS) == 2 * big
    assert bucket_for(3 * big, DEFAULT_BUCKETS) == 3 * big


def test_extractor_embeds_full_length_beyond_buckets():
    """Up to the cap (2x largest bucket by default), utterances longer than
    every static bucket are embedded at full length (rounded-up padded
    bucket), not truncated; long_audio='pad' keeps that exact reference
    semantics at ANY length."""
    import jax

    from doubleattentionspeakerverification_tpu.config import ModelConfig
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        EmbeddingExtractor,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        get_embedding,
        init_speaker_classifier,
    )

    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4)
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = {
        "just_over": rng.standard_normal((70, 80)).astype(np.float32),
        "long": rng.standard_normal((120, 80)).astype(np.float32),
    }

    # 70 <= cap (100): full-length pad even under the default chunk policy
    ex = EmbeddingExtractor(
        params, state, cfg, lambda u: feats[u], buckets=(50,), batch_size=2
    )
    cache = ex.extract(["just_over"])
    direct = np.asarray(
        get_embedding(params, state, feats["just_over"][None],
                      np.array([70], np.int32), cfg=cfg)
    )[0]
    np.testing.assert_allclose(cache["just_over"], direct, atol=1e-5)

    # 120 > cap: 'pad' policy still embeds the exact full length
    ex_pad = EmbeddingExtractor(
        params, state, cfg, lambda u: feats[u], buckets=(50,), batch_size=2,
        long_audio="pad",
    )
    cache = ex_pad.extract(["long"])
    direct = np.asarray(
        get_embedding(params, state, feats["long"][None], np.array([120], np.int32), cfg=cfg)
    )[0]
    np.testing.assert_allclose(cache["long"], direct, atol=1e-5)


def test_extractor_chunks_pathological_long_audio():
    """Beyond the cap the default policy chunks: every compiled shape stays
    within the static bucket grid (bounded compile count + batch memory for
    arbitrarily long audio, VERDICT r4 #7), the result is the
    duration-weighted centroid of unit chunk embeddings, and on stationary
    audio it stays close to the full-length embedding."""
    import jax
    import pytest

    from doubleattentionspeakerverification_tpu.config import ModelConfig
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        EmbeddingExtractor,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        get_embedding,
        init_speaker_classifier,
    )

    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4)
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    # stationary "speaker": constant band offsets + noise, > 2x largest bucket
    t_long = 230  # buckets (50, 100) -> cap 200; chunks 100+100+30
    base = 2.0 * rng.standard_normal((1, 80)).astype(np.float32)
    feats = {"vlong": (base + 0.3 * rng.standard_normal((t_long, 80))).astype(np.float32)}

    seen_shapes = []
    from functools import partial

    raw = jax.jit(partial(get_embedding, cfg=cfg))

    def spy_embed(p, s, x, lens):
        seen_shapes.append(int(x.shape[1]))
        return raw(p, s, x, lens)

    ex = EmbeddingExtractor(
        params, state, cfg, lambda u: feats[u], buckets=(50, 100),
        batch_size=2, embed_fn=spy_embed,
    )
    emb = ex.extract(["vlong"])["vlong"]
    # every forward ran a grid shape — nothing beyond the largest bucket
    assert seen_shapes and max(seen_shapes) <= 100, seen_shapes
    assert np.isfinite(emb).all()

    # exact semantics: duration-weighted centroid of unit chunk embeddings
    segs = [feats["vlong"][0:100], feats["vlong"][100:200], feats["vlong"][200:230]]
    acc, wsum = np.zeros(16, np.float64), 0.0
    for seg in segs:
        e = np.asarray(
            raw(params, state, seg[None], np.array([seg.shape[0]], np.int32))
        )[0].astype(np.float64)
        e /= np.linalg.norm(e)
        acc += seg.shape[0] * e
        wsum += seg.shape[0]
    # atol at the padded==unpadded invariant's tolerance (the extractor
    # embeds chunks in padded bucket batches; the manual path is unpadded)
    np.testing.assert_allclose(emb, (acc / wsum).astype(np.float32), atol=5e-4)

    # and close to the full-length embedding on stationary audio
    full = np.asarray(
        raw(params, state, feats["vlong"][None], np.array([t_long], np.int32))
    )[0]
    cos = float(full @ emb) / (np.linalg.norm(full) * np.linalg.norm(emb))
    assert cos > 0.95, cos

    with pytest.raises(ValueError):
        EmbeddingExtractor(
            params, state, cfg, lambda u: feats[u], long_audio="truncate"
        )


def test_extractor_mesh_sharded_matches_unsharded():
    """Validation embeds shard over the mesh 'data' axis and must match the
    single-device result (multi-chip EER validation path)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from doubleattentionspeakerverification_tpu.config import MeshConfig, ModelConfig
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
        EmbeddingExtractor,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=4)
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    feats = {
        f"u{i}": rng.standard_normal((30 + 7 * i, 80)).astype(np.float32)
        for i in range(10)
    }
    load = lambda u: feats[u]  # noqa: E731

    plain = EmbeddingExtractor(params, state, cfg, load, batch_size=8, num_workers=1)
    mesh = make_mesh(MeshConfig(model_axis=2))
    sharded = EmbeddingExtractor(
        params, state, cfg, load, batch_size=8, num_workers=4, mesh=mesh
    )
    assert sharded._x_sharding is not None
    ids = sorted(feats)
    a = plain.extract(ids)
    b = sharded.extract(ids)
    for u in ids:
        np.testing.assert_allclose(a[u], b[u], atol=1e-5)

    # batch not divisible by the data axis -> sharding quietly disabled
    odd = EmbeddingExtractor(params, state, cfg, load, batch_size=3, mesh=mesh)
    assert odd._x_sharding is None


def test_feature_cache_budget_and_hits():
    """FeatureCache: repeated loads hit the cache; budget caps insertion."""
    from doubleattentionspeakerverification_tpu.evaluation.embeddings import FeatureCache

    calls = []

    def loader(u):
        calls.append(u)
        return np.zeros((100, 80), np.float32)  # 32 kB

    cache = FeatureCache(loader, budget_mb=0.07)  # fits two utterances
    for _ in range(3):
        cache("a")
        cache("b")
    assert calls == ["a", "b"]  # everything after the first round is a hit
    for _ in range(2):
        cache("c")  # over budget: loaded every time, never inserted
    assert calls == ["a", "b", "c", "c"]
    np.testing.assert_array_equal(cache("a"), np.zeros((100, 80), np.float32))
