"""int8-quantized inference encoder (`models/quantized.py`)."""

import jax
import numpy as np

from doubleattentionspeakerverification_tpu.config import ExperimentConfig, ModelConfig
from doubleattentionspeakerverification_tpu.models.classifier import (
    get_embedding,
    init_speaker_classifier,
)
from doubleattentionspeakerverification_tpu.models.quantized import (
    calibrate_int8_scales,
    fold_static_scales,
    get_embedding_int8,
    get_embedding_int8_static,
    make_int8_embed_fn,
    quantize_vgg,
    quantized_vgg_apply,
    quantized_vgg_apply_static,
)
from doubleattentionspeakerverification_tpu.models.vgg import vgg_apply


def _tiny_cfg(**kw):
    kw.setdefault("kernel_size", 16)
    kw.setdefault("heads_number", 4)
    kw.setdefault("embedding_size", 32)
    kw.setdefault("num_spkrs", 5)
    return ModelConfig(**kw)


def _cos(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def test_quantized_vgg_close_to_fp():
    cfg = _tiny_cfg()
    params, _ = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 50, 80)).astype(np.float32)
    lens = np.array([50, 37, 21], np.int32)

    ref, ref_len = vgg_apply(params["vgg"], x, lens, cfg)
    qvgg = quantize_vgg(params["vgg"])
    out, out_len = quantized_vgg_apply(qvgg, x, lens, cfg)

    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(out_len))
    ref, out = np.asarray(ref), np.asarray(out)
    # 8-bit conv stack: relative error per activation stays small
    scale = np.abs(ref).max()
    assert np.abs(ref - out).max() < 0.05 * scale, np.abs(ref - out).max() / scale


def test_quantized_embedding_cosine_matches_fp():
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(1), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 60, 80)).astype(np.float32)
    lens = np.array([60, 60, 44, 30], np.int32)

    fp = np.asarray(get_embedding(params, state, x, lens, cfg))
    q = np.asarray(get_embedding_int8(params, qvgg, state, x, lens, cfg))
    cos = _cos(fp, q)
    assert (cos > 0.98).all(), cos


def test_quantized_preserves_speaker_separation():
    """Quantization must not reorder genuine vs impostor cosine scores."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(2), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(2)
    # two 'speakers' = two constant per-band offsets (a signal that survives
    # the attention pooling's time-average; zero-mean noise bases don't — an
    # untrained net maps those to embeddings identical to ~1e-6), 2 takes each
    base = {s: 3.0 * rng.standard_normal((1, 1, 80)).astype(np.float32) for s in (0, 1)}
    takes = []
    for s in (0, 1):
        for _ in range(2):
            takes.append(base[s] + 0.3 * rng.standard_normal((1, 70, 80)).astype(np.float32))
    x = np.concatenate(takes, 0)

    fp = np.asarray(get_embedding(params, state, x, None, cfg))
    q = np.asarray(get_embedding_int8(params, qvgg, state, x, None, cfg))
    # untrained embeddings carry a large input-independent component (fc
    # biases) that pushes every cosine to ~1 and makes raw ordering noise;
    # center across the batch so the comparison sees input-driven structure
    for e in (fp - fp.mean(0, keepdims=True), q - q.mean(0, keepdims=True)):
        same = _cos(e[0:1], e[1:2])[0]
        diff = _cos(e[0:1], e[2:3])[0]
        assert same > diff, (same, diff)
    # scores themselves stay close
    assert abs(_cos(fp[0:1], fp[1:2])[0] - _cos(q[0:1], q[1:2])[0]) < 0.02


def test_static_vgg_close_to_fp_and_dynamic():
    """Calibrated static scales reproduce the dynamic path closely (on the
    calibration batch the scales are near-identical; the static path's extra
    error source is inter-conv int8 requantization)."""
    cfg = _tiny_cfg()
    params, _ = init_speaker_classifier(jax.random.PRNGKey(5), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 50, 80)).astype(np.float32)
    lens = np.array([50, 37, 21], np.int32)

    scales = calibrate_int8_scales(qvgg, x, lens, cfg)
    assert len(scales) == 8 and all(s > 0 for s in scales)
    folded = fold_static_scales(qvgg, scales, cfg)
    out_s, len_s = quantized_vgg_apply_static(folded, scales[0], x, lens, cfg)
    ref, ref_len = vgg_apply(params["vgg"], x, lens, cfg)
    np.testing.assert_array_equal(np.asarray(ref_len), np.asarray(len_s))
    ref, out_s = np.asarray(ref), np.asarray(out_s)
    scale = np.abs(ref).max()
    assert np.abs(ref - out_s).max() < 0.08 * scale, np.abs(ref - out_s).max() / scale


def test_static_embedding_cosine_matches_fp():
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(6), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 60, 80)).astype(np.float32)
    lens = np.array([60, 60, 44, 30], np.int32)

    scales = calibrate_int8_scales(qvgg, x, lens, cfg)
    folded = fold_static_scales(qvgg, scales, cfg)
    fp = np.asarray(get_embedding(params, state, x, lens, cfg))
    st = np.asarray(
        get_embedding_int8_static(params, folded, scales[0], state, x, lens, cfg)
    )
    assert (_cos(fp, st) > 0.98).all(), _cos(fp, st)
    # and on a DIFFERENT batch than the calibration one (mild OOD: same
    # distribution, new draws — occasional >amax activations clip at 127)
    x2 = rng.standard_normal((4, 60, 80)).astype(np.float32)
    fp2 = np.asarray(get_embedding(params, state, x2, lens, cfg))
    st2 = np.asarray(
        get_embedding_int8_static(params, folded, scales[0], state, x2, lens, cfg)
    )
    assert (_cos(fp2, st2) > 0.98).all(), _cos(fp2, st2)


def test_static_padded_equals_unpadded():
    """int8 masking + int8 ceil-pool keep the padded==unpadded invariant;
    with BAKED scales the padded run quantizes identically, so this is
    tighter than the dynamic case."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(7), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(7)
    t = 43
    x = rng.standard_normal((1, t, 80)).astype(np.float32)
    scales = calibrate_int8_scales(qvgg, x, np.array([t], np.int32), cfg)
    folded = fold_static_scales(qvgg, scales, cfg)

    unpadded = np.asarray(
        get_embedding_int8_static(params, folded, scales[0], state, x, None, cfg)
    )
    x_pad = np.zeros((1, t + 29, 80), np.float32)
    x_pad[:, :t] = x
    padded = np.asarray(
        get_embedding_int8_static(
            params, folded, scales[0], state, x_pad, np.array([t], np.int32), cfg
        )
    )
    np.testing.assert_allclose(padded, unpadded, rtol=1e-5, atol=1e-5)


def test_make_int8_embed_fn_static_scheme():
    """scheme='static': first call runs (and calibrates on) the dynamic
    path; later calls run the fused static program and stay close."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 50, 80)).astype(np.float32)
    lens = np.array([50, 41], np.int32)

    dyn_fn = make_int8_embed_fn(params, cfg, scheme="dynamic")
    st_fn = make_int8_embed_fn(params, cfg, scheme="static")
    first = np.asarray(st_fn(params, state, x, lens))
    np.testing.assert_allclose(
        first, np.asarray(dyn_fn(params, state, x, lens)), rtol=1e-5, atol=1e-5
    )
    second = np.asarray(st_fn(params, state, x, lens))
    assert (_cos(first, second) > 0.995).all()

    import pytest

    with pytest.raises(ValueError):
        make_int8_embed_fn(params, cfg, scheme="int4")


def test_api_quantize_int8():
    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel

    cfg = ExperimentConfig(model=_tiny_cfg())
    fp_model = SpeakerEmbeddingModel.from_random_init(cfg, seed=3)
    q_model = SpeakerEmbeddingModel(
        fp_model.params, fp_model.model_state, cfg, quantize="int8"
    )
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((55, 80)).astype(np.float32)
    e_fp = fp_model.embed_features(feats)
    e_q = q_model.embed_features(feats)
    assert e_q.shape == e_fp.shape
    assert _cos(e_fp[None], e_q[None])[0] > 0.98

    q_static = SpeakerEmbeddingModel(
        fp_model.params, fp_model.model_state, cfg, quantize="int8_static"
    )
    e_s1 = q_static.embed_features(feats)  # calibration call (dynamic path)
    e_s2 = q_static.embed_features(feats)  # static program
    assert _cos(e_fp[None], e_s2[None])[0] > 0.98
    assert _cos(e_s1[None], e_s2[None])[0] > 0.995

    import pytest

    with pytest.raises(ValueError):
        SpeakerEmbeddingModel(fp_model.params, fp_model.model_state, cfg, quantize="int4")


def test_static_degenerate_warmup_batch_not_poisoned():
    """VERDICT r4 #1 / ADVICE r4 high: an all-zeros batch (serving warmup)
    must NOT become the calibration batch — it would bake amax~0 scales and
    saturate every later real input. Degenerate batches are served on the
    dynamic path; the first real batch calibrates."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(9), cfg)
    st_fn = make_int8_embed_fn(params, cfg, scheme="static")
    assert st_fn.calibration_state() == "uncalibrated"

    zeros = np.zeros((2, 50, 80), np.float32)
    lens = np.array([50, 41], np.int32)
    st_fn(params, state, zeros, lens)  # warmup-like traffic
    assert st_fn.calibration_state() == "uncalibrated"

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 50, 80)).astype(np.float32)
    st_fn(params, state, x, lens)  # real batch -> calibration
    assert st_fn.calibration_state() == "static"
    emb = np.asarray(st_fn(params, state, x, lens))
    fp = np.asarray(get_embedding(params, state, x, lens, cfg))
    assert (_cos(fp, emb) > 0.98).all(), _cos(fp, emb)


def test_static_scales_persist_restart_deterministic(tmp_path):
    """With --int8_scales, a restart loads the baked scales instead of
    recalibrating on whatever batch arrives first: embeddings are
    bit-identical across processes regardless of first-batch order."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(10), cfg)
    rng = np.random.default_rng(10)
    x_cal = rng.standard_normal((2, 50, 80)).astype(np.float32)
    x_probe = rng.standard_normal((2, 50, 80)).astype(np.float32)
    lens = np.array([50, 41], np.int32)
    path = str(tmp_path / "scales.npz")

    fn1 = make_int8_embed_fn(params, cfg, scheme="static", scales_path=path)
    fn1(params, state, x_cal, lens)  # calibrates + persists
    assert fn1.calibration_state() == "static"
    import os

    assert os.path.exists(path)
    want = np.asarray(fn1(params, state, x_probe, lens))

    # "restart": fresh fn, DIFFERENT first batch — must not recalibrate
    fn2 = make_int8_embed_fn(params, cfg, scheme="static", scales_path=path)
    assert fn2.calibration_state() == "static"  # static before any batch
    got = np.asarray(fn2(params, state, x_probe, lens))
    np.testing.assert_array_equal(want, got)

    # scales refuse to load into a mismatched model
    import pytest

    from doubleattentionspeakerverification_tpu.models.quantized import (
        load_int8_scales,
    )

    with pytest.raises(ValueError):
        load_int8_scales(path, _tiny_cfg(kernel_size=32))

    # ... and into the SAME architecture with DIFFERENT weights (stale
    # scales from a retrained checkpoint must never silently serve — the
    # runtime cosine guard only runs at calibration, not on restore)
    params2, _ = init_speaker_classifier(jax.random.PRNGKey(99), cfg)
    with pytest.raises(ValueError, match="fingerprint"):
        make_int8_embed_fn(params2, cfg, scheme="static", scales_path=path)


def test_static_cosine_guard_fallback():
    """When the static program fails the fp-vs-int8 cosine guard on its own
    calibration batch, the scheme must permanently fall back to the dynamic
    path — never serve bad embeddings. (Forced here with an unreachable
    guard threshold: an untrained tiny model's embeddings are so
    bias-dominated that even saturated scales keep cosine ~1, so the
    mechanism is what this test pins down.)"""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(11), cfg)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 50, 80)).astype(np.float32)
    lens = np.array([50, 41], np.int32)

    st_fn = make_int8_embed_fn(
        params, cfg, scheme="static", cosine_guard=1.01
    )
    first = np.asarray(st_fn(params, state, x, lens))
    assert st_fn.calibration_state() == "fallback_dynamic"
    # later calls serve the (correct) dynamic path
    later = np.asarray(st_fn(params, state, x, lens))
    fp = np.asarray(get_embedding(params, state, x, lens, cfg))
    assert (_cos(fp, later) > 0.98).all()
    np.testing.assert_allclose(first, later, rtol=1e-5, atol=1e-5)


def test_explicit_calibrate_api(tmp_path):
    """embed.calibrate raises on degenerate input; the api wrapper exposes
    calibration for serve --calibration_wav."""
    import pytest

    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel

    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(12), cfg)
    st_fn = make_int8_embed_fn(params, cfg, scheme="static")
    with pytest.raises(ValueError):
        st_fn.calibrate(params, state, np.zeros((1, 50, 80), np.float32), None)
    assert st_fn.calibration_state() == "uncalibrated"

    exp = ExperimentConfig(model=cfg)
    m = SpeakerEmbeddingModel(params, state, exp, quantize="int8_static",
                              quantize_scales_path=str(tmp_path / "s.npz"))
    assert m.quantize_calibration_state() == "uncalibrated"
    rng = np.random.default_rng(12)
    feats = rng.standard_normal((60, 80)).astype(np.float32)
    assert m.calibrate_quantization(feats) == "static"
    assert m.quantize_calibration_state() == "static"
    e = m.embed_features(feats)
    fp = SpeakerEmbeddingModel(params, state, exp).embed_features(feats)
    assert _cos(fp[None], e[None])[0] > 0.98
    # fp models expose no calibration
    with pytest.raises(ValueError):
        SpeakerEmbeddingModel(params, state, exp).calibrate_quantization(feats)


def test_quantized_padded_equals_unpadded():
    """The mask invariant holds for the int8 encoder too."""
    cfg = _tiny_cfg()
    params, state = init_speaker_classifier(jax.random.PRNGKey(4), cfg)
    qvgg = quantize_vgg(params["vgg"])
    rng = np.random.default_rng(4)
    t = 43
    x = rng.standard_normal((1, t, 80)).astype(np.float32)

    unpadded = np.asarray(get_embedding_int8(params, qvgg, state, x, None, cfg))
    x_pad = np.zeros((1, t + 29, 80), np.float32)
    x_pad[:, :t] = x
    padded = np.asarray(
        get_embedding_int8(params, qvgg, state, x_pad, np.array([t], np.int32), cfg)
    )
    # not bit-equal: the dynamic activation scale sees a different (padded)
    # tensor only through its abs-max, which masking keeps identical — so
    # this SHOULD be allclose
    np.testing.assert_allclose(padded, unpadded, rtol=2e-4, atol=2e-4)
