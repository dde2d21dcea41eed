"""Distributed-path tests on the virtual 8-device CPU mesh: sharded train
step equals the single-device step; explicit shard_map classifier equals the
dense computation; embedding all-gather works."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from doubleattentionspeakerverification_tpu.config import (
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from doubleattentionspeakerverification_tpu.models.amsoftmax import (
    amsoftmax_apply,
    cross_entropy,
    init_amsoftmax,
)
from doubleattentionspeakerverification_tpu.models.classifier import (
    init_speaker_classifier,
)
from doubleattentionspeakerverification_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_train_state,
    train_state_shardings,
)
from doubleattentionspeakerverification_tpu.parallel.sharded_amsoftmax import (
    sharded_amsoftmax_ce,
    sharded_cosine_scores_allgather,
)
from doubleattentionspeakerverification_tpu.training.step import (
    init_train_state,
    make_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg(n_spk=16, model_axis=1):
    return ExperimentConfig(
        model=ModelConfig(
            kernel_size=16, heads_number=4, embedding_size=32, num_spkrs=n_spk,
        ),
        train=TrainConfig(batch_size=8, gradient_accumulation=2, learning_rate=1e-3),
        mesh=MeshConfig(model_axis=model_axis),
    )


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    g, b = cfg.train.gradient_accumulation, cfg.train.batch_size
    return {
        "inputs": rng.standard_normal((g, b, 64, 80)).astype(np.float32),
        "lengths": np.full((g, b), 64, np.int32),
        "labels": rng.integers(0, cfg.model.num_spkrs, (g, b)).astype(np.int32),
    }


def test_mesh_construction():
    mesh = make_mesh(MeshConfig(model_axis=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}


@pytest.mark.parametrize("model_axis", [1, 2])
def test_sharded_train_step_matches_single_device(model_axis):
    cfg = _cfg(model_axis=model_axis)
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state0 = init_train_state(params, ms, cfg)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(3)

    # single-device run (dropout rng identical)
    step_fn = make_train_step(cfg, donate=False)
    state_1d, metrics_1d = step_fn(state0, batch, rng)

    # sharded run of the SAME jitted step
    mesh = make_mesh(cfg.mesh)
    state_sh = shard_train_state(state0, mesh)
    batch_sh = shard_batch(batch, mesh)
    state_8d, metrics_8d = step_fn(state_sh, batch_sh, rng)

    np.testing.assert_allclose(
        float(metrics_1d["loss"]), float(metrics_8d["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(metrics_1d["accuracy"]), float(metrics_8d["accuracy"]), rtol=1e-6
    )
    # parameters equal after the update. Tolerance: for a numerically-zero
    # gradient, Adam's update is ±lr * g/(|g|+eps) — reduction-order noise in
    # the sharded all-reduce can flip its sign, moving a weight by up to
    # 2*lr. Allow that, require everything else tight.
    flat1 = jax.tree_util.tree_leaves(state_1d.params)
    flat8 = jax.tree_util.tree_leaves(state_8d.params)
    n_loose, n_total = 0, 0
    tol = 2.1 * cfg.train.learning_rate
    for a, b in zip(flat1, flat8):
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() <= tol, diff.max()
        n_loose += int(np.sum(diff > 1e-4))
        n_total += diff.size
    # the overwhelming majority of weights must agree tightly
    assert n_loose / n_total < 0.001, (n_loose, n_total)


def test_classifier_w_stays_sharded():
    cfg = _cfg(model_axis=2)
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state0 = init_train_state(params, ms, cfg)
    mesh = make_mesh(cfg.mesh)
    state_sh = shard_train_state(state0, mesh)

    w_sharding = state_sh.params["amsoftmax"]["W"].sharding
    assert w_sharding.spec == P(None, "model")
    # optimizer moments of W also sharded
    shardings = train_state_shardings(state0, mesh)
    specs = [
        s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]
        if any(getattr(p, "key", None) == "W" for p in path)
    ]
    assert all(s == P(None, "model") for s in specs)
    assert len(specs) >= 3  # param + adam mu + adam nu

    step_fn = make_train_step(cfg, donate=False)
    new_state, _ = step_fn(state_sh, shard_batch(_batch(cfg), mesh), jax.random.PRNGKey(0))
    assert new_state.params["amsoftmax"]["W"].sharding.spec == P(None, "model")


def test_sharded_amsoftmax_matches_dense():
    cfg = ModelConfig(embedding_size=32, num_spkrs=24, margin_factor=0.4,
                      scaling_factor=30.0, annealing=True)
    mesh = make_mesh(MeshConfig(model_axis=4))
    params = init_amsoftmax(jax.random.PRNGKey(0), 32, 24)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    label = rng.integers(0, 24, 16).astype(np.int32)
    step = 37

    costh, logits = amsoftmax_apply(params, x, label, step, cfg)
    dense_loss = cross_entropy(logits, label)
    dense_acc = jnp.mean((jnp.argmax(costh, -1) == label).astype(jnp.float32))

    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        loss, acc = sharded_amsoftmax_ce(params, x, label, step, cfg, mesh)
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=2e-5)
    np.testing.assert_allclose(float(acc), float(dense_acc), rtol=1e-6)


def test_allgather_embeddings():
    mesh = make_mesh(MeshConfig(model_axis=1))
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    from jax.sharding import NamedSharding

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = sharded_cosine_scores_allgather(xs, mesh)
    np.testing.assert_array_equal(np.asarray(out), x)
