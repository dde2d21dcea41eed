"""Chunked large-vocab AM-Softmax CE vs the dense path: values and grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.models.amsoftmax import (
    amsoftmax_apply,
    cross_entropy,
    init_amsoftmax,
)
from doubleattentionspeakerverification_tpu.ops.chunked_amsoftmax import (
    chunked_amsoftmax_ce,
)


def _setup(n_classes=37, emb=16, b=9, annealing=True, seed=0):
    cfg = ModelConfig(embedding_size=emb, num_spkrs=n_classes, annealing=annealing,
                      margin_factor=0.35, scaling_factor=20.0)
    params = init_amsoftmax(jax.random.PRNGKey(seed), emb, n_classes)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, emb)).astype(np.float32)
    label = rng.integers(0, n_classes, b).astype(np.int32)
    return cfg, params, x, label


def _dense(params, x, label, step, cfg):
    costh, logits = amsoftmax_apply(params, x, label, step, cfg)
    loss = cross_entropy(logits, label)
    acc = jnp.mean((jnp.argmax(costh, -1) == label).astype(jnp.float32))
    return loss, acc


@pytest.mark.parametrize("chunk", [8, 16, 64])  # uneven + oversized chunks
@pytest.mark.parametrize("annealing", [False, True])
def test_matches_dense(chunk, annealing):
    cfg, params, x, label = _setup(annealing=annealing)
    step = 53
    dense_loss, dense_acc = _dense(params, x, label, step, cfg)
    loss, acc = chunked_amsoftmax_ce(params, x, label, step, cfg, chunk=chunk)
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=2e-6)
    assert float(acc) == pytest.approx(float(dense_acc))


def test_gradients_match_dense():
    cfg, params, x, label = _setup(annealing=False)

    def loss_dense(w, x):
        l, _ = _dense({"W": w}, x, label, 0, cfg)
        return l

    def loss_chunked(w, x):
        l, _ = chunked_amsoftmax_ce({"W": w}, x, label, 0, cfg, chunk=8)
        return l

    gw_d, gx_d = jax.grad(loss_dense, argnums=(0, 1))(params["W"], jnp.asarray(x))
    gw_c, gx_c = jax.grad(loss_chunked, argnums=(0, 1))(params["W"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_d), atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_d), atol=2e-6)


def test_jit_and_scale():
    # a larger vocab through jit for shape/memory sanity
    cfg, params, x, label = _setup(n_classes=5000, emb=32, b=16)
    f = jax.jit(lambda p, x, y: chunked_amsoftmax_ce(p, x, y, 0, cfg, chunk=512))
    loss, acc = f(params, x, label)
    dense_loss, dense_acc = _dense(params, x, label, 0, cfg)
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=2e-6)
    assert float(acc) == pytest.approx(float(dense_acc))


def test_train_step_with_chunked_head_matches_dense(tmp_path):
    import dataclasses

    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    base = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=24,
                          num_spkrs=10, mask_prob=0.02),
        train=TrainConfig(batch_size=4, gradient_accumulation=2),
    )
    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.standard_normal((2, 4, 60, 80)).astype(np.float32),
        "lengths": np.full((2, 4), 60, np.int32),
        "labels": rng.integers(0, 10, (2, 4)).astype(np.int32),
    }
    results = {}
    for name, chunk in (("dense", 0), ("chunked", 4)):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, classifier_chunk=chunk)
        )
        params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(params, ms, cfg)
        step = make_train_step(cfg, donate=False)
        new_state, m = step(state, batch, jax.random.PRNGKey(1))
        results[name] = (
            float(m["loss"]),
            float(m["accuracy"]),
            np.asarray(new_state.params["amsoftmax"]["W"]),
        )
    assert results["chunked"][0] == pytest.approx(results["dense"][0], rel=1e-5)
    assert results["chunked"][1] == results["dense"][1]
    np.testing.assert_allclose(results["chunked"][2], results["dense"][2], atol=2e-5)
