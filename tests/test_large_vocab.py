"""Large-vocabulary classifier at production speaker counts (SURVEY §7:
"numerics at n_spk ~ 10^4-10^5").

All three classifier paths — dense (models/amsoftmax.py), explicit
shard_map (parallel/sharded_amsoftmax.py), and memory-bounded chunked scan
(ops/chunked_amsoftmax.py) — must agree on loss, accuracy, AND gradients at
n_spkrs = 100,000, and the chunked path must compile with a bounded
temporary footprint (it exists so (B, n_spkrs) logits never materialize).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubleattentionspeakerverification_tpu.config import MeshConfig, ModelConfig
from doubleattentionspeakerverification_tpu.models.amsoftmax import (
    amsoftmax_apply,
    cross_entropy,
    init_amsoftmax,
)
from doubleattentionspeakerverification_tpu.ops.chunked_amsoftmax import (
    chunked_amsoftmax_ce,
)
from doubleattentionspeakerverification_tpu.parallel.mesh import make_mesh
from doubleattentionspeakerverification_tpu.parallel.sharded_amsoftmax import (
    sharded_amsoftmax_ce,
)

N_SPK = 100_000
EMB = 64
B = 16


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(embedding_size=EMB, num_spkrs=N_SPK, annealing=True,
                      margin_factor=0.4, scaling_factor=30.0)
    params = init_amsoftmax(jax.random.PRNGKey(0), EMB, N_SPK)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, EMB)).astype(np.float32))
    # include boundary labels: first/last class and shard/chunk edges
    label = jnp.asarray(
        np.concatenate([
            [0, N_SPK - 1, N_SPK // 4, N_SPK // 4 - 1],
            rng.integers(0, N_SPK, B - 4),
        ]).astype(np.int32)
    )
    return cfg, params, x, label


def _dense_loss(params, x, label, step, cfg):
    costh, logits = amsoftmax_apply(params, x, label, step, cfg)
    acc = jnp.mean((jnp.argmax(costh, -1) == label).astype(jnp.float32))
    return cross_entropy(logits, label), acc


def test_chunked_matches_dense_at_1e5(setup):
    cfg, params, x, label = setup
    step = 1234
    dense_l, dense_a = jax.jit(lambda p, x: _dense_loss(p, x, label, step, cfg))(params, x)
    chunk_l, chunk_a = jax.jit(
        lambda p, x: chunked_amsoftmax_ce(p, x, label, step, cfg, chunk=8192)
    )(params, x)
    np.testing.assert_allclose(float(chunk_l), float(dense_l), rtol=2e-5)
    np.testing.assert_allclose(float(chunk_a), float(dense_a), rtol=1e-6)


def test_chunked_grads_match_dense_at_1e5(setup):
    cfg, params, x, label = setup
    step = 7

    gd_w, gd_x = jax.jit(
        jax.grad(lambda w, x: _dense_loss({"W": w}, x, label, step, cfg)[0], argnums=(0, 1))
    )(params["W"], x)
    gc_w, gc_x = jax.jit(
        jax.grad(
            lambda w, x: chunked_amsoftmax_ce({"W": w}, x, label, step, cfg, chunk=8192)[0],
            argnums=(0, 1),
        )
    )(params["W"], x)
    np.testing.assert_allclose(np.asarray(gc_x), np.asarray(gd_x), atol=5e-5)
    # W grads: sparse rows touched; compare dense (atol covers f32
    # accumulation-order noise of the chunked logsumexp, ~1e-5 at 1e5 classes)
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gd_w), atol=5e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_dense_at_1e5(setup):
    cfg, params, x, label = setup
    mesh = make_mesh(MeshConfig(model_axis=4))
    step = 1234
    dense_l, dense_a = jax.jit(lambda p, x: _dense_loss(p, x, label, step, cfg))(params, x)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        sh_l, sh_a = sharded_amsoftmax_ce(params, x, label, step, cfg, mesh)
    np.testing.assert_allclose(float(sh_l), float(dense_l), rtol=2e-5)
    np.testing.assert_allclose(float(sh_a), float(dense_a), rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_grads_match_dense_at_1e5(setup):
    cfg, params, x, label = setup
    mesh = make_mesh(MeshConfig(model_axis=4))
    step = 7

    gd_w, gd_x = jax.jit(
        jax.grad(lambda w, x: _dense_loss({"W": w}, x, label, step, cfg)[0], argnums=(0, 1))
    )(params["W"], x)

    def sh_loss(w, x):
        return sharded_amsoftmax_ce({"W": w}, x, label, step, cfg, mesh)[0]

    # set_mesh must wrap the traced call from outside (it rejects use
    # under an active trace)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        gs_w, gs_x = jax.grad(sh_loss, argnums=(0, 1))(params["W"], x)
    np.testing.assert_allclose(np.asarray(gs_x), np.asarray(gd_x), atol=5e-5)
    np.testing.assert_allclose(np.asarray(gs_w), np.asarray(gd_w), atol=5e-5)


def test_chunked_memory_stays_bounded(setup):
    """The chunked path exists for the regime where the (B, n_spkrs) logits
    dominate: its compiled temporaries must stay near O(W + B*chunk) while the
    dense backward materializes B*n_spkrs several times over. Measured by
    compile-time memory analysis at B=256 (compile only, never executed)."""
    cfg, params, _, _ = setup
    step = 7
    bm = 256
    rng = np.random.default_rng(3)
    xm = jnp.asarray(rng.standard_normal((bm, EMB)).astype(np.float32))
    lm = jnp.asarray(rng.integers(0, N_SPK, bm).astype(np.int32))

    def temp_bytes(fn):
        lowered = jax.jit(fn).lower(params["W"], xm)
        mem = lowered.compile().memory_analysis()
        if mem is None:
            pytest.skip("backend exposes no memory analysis")
        return mem.temp_size_in_bytes

    dense_t = temp_bytes(
        jax.grad(lambda w, x: _dense_loss({"W": w}, x, lm, step, cfg)[0])
    )
    chunk_t = temp_bytes(
        jax.grad(
            lambda w, x: chunked_amsoftmax_ce({"W": w}, x, lm, step, cfg, chunk=4096)[0]
        )
    )
    w_bytes = EMB * N_SPK * 4
    logits_bytes = bm * N_SPK * 4
    # dense: materializes (B, n_spkrs) logits in fwd AND bwd
    assert dense_t > logits_bytes
    # chunked: bounded by the dW accumulator + a few (B, chunk) buffers —
    # must NOT scale with B*n_spkrs
    assert chunk_t < dense_t / 2, (chunk_t, dense_t)
    assert chunk_t < 3 * w_bytes + 16 * bm * 4096 * 4, (chunk_t, w_bytes)
