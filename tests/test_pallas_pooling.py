"""Fused pallas pooling vs the XLA reference path (interpret mode on CPU;
the same kernel compiles for TPU in bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.models.poolings import init_mha, mha_pool
from doubleattentionspeakerverification_tpu.ops import pooling_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _setup(b=3, t=50, heads=4, d_h=16, seed=0):
    rng = np.random.default_rng(seed)
    d = heads * d_h
    ht = rng.standard_normal((b, t, d)).astype(np.float32)
    params = init_mha(jax.random.PRNGKey(seed), d, heads)
    lengths = np.array([t, t - 13, t - 27], np.int32)[:b]
    return params, ht, lengths


@pytest.mark.parametrize("use_lengths", [True, False])
def test_fused_matches_xla(use_lengths):
    cfg = ModelConfig(heads_number=4, mha_dk_is_heads=True)
    params, ht, lengths = _setup()
    lens = lengths if use_lengths else None

    ref_ctx, _ = mha_pool(params, ht, lens, cfg)
    fused = pooling_pallas.mha_pool_pallas(
        params, ht, lens, heads=4, dk_is_heads=True, t_tile=16
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_ctx), atol=2e-5)


def test_fused_matches_xla_dk_head_size():
    cfg = ModelConfig(heads_number=4, mha_dk_is_heads=False)
    params, ht, lengths = _setup(seed=1)
    ref_ctx, _ = mha_pool(params, ht, lengths, cfg)
    fused = pooling_pallas.mha_pool_pallas(
        params, ht, lengths, heads=4, dk_is_heads=False, t_tile=16
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_ctx), atol=2e-5)


def test_fused_gradients_match_xla():
    cfg = ModelConfig(heads_number=4, mha_dk_is_heads=True)
    params, ht, lengths = _setup(b=2, t=30, seed=2)

    def loss_xla(q, ht):
        ctx, _ = mha_pool({"query": q}, ht, lengths[:2], cfg)
        return jnp.sum(jnp.sin(ctx))

    def loss_fused(q, ht):
        ctx = pooling_pallas.mha_pool_pallas(
            {"query": q}, ht, lengths[:2], heads=4, t_tile=8
        )
        return jnp.sum(jnp.sin(ctx.reshape(ctx.shape[0], -1)))

    gq_ref, ght_ref = jax.grad(loss_xla, argnums=(0, 1))(params["query"], jnp.asarray(ht))
    gq_f, ght_f = jax.grad(loss_fused, argnums=(0, 1))(params["query"], jnp.asarray(ht))
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ght_f), np.asarray(ght_ref), atol=3e-5)


def test_fused_uneven_tiles():
    # t not divisible by t_tile exercises the padding path
    params, ht, lengths = _setup(b=3, t=37)
    cfg = ModelConfig(heads_number=4)
    ref_ctx, _ = mha_pool(params, ht, lengths, cfg)
    fused = pooling_pallas.mha_pool_pallas(params, ht, lengths, heads=4, t_tile=16)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref_ctx), atol=2e-5)
