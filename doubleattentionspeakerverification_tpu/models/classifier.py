"""Speaker classifier assembly (reference ``scripts/model.py:8-71``).

Functional: parameters and BatchNorm running statistics are explicit pytrees,
the apply functions are pure and jittable. The FC block keeps the reference's
exact (quirky) topology: fc1+ReLU -> fc2+ReLU -> BN(b2) -> [embedding tap]
-> preLayer -> AM-Softmax; the reference's b1/b3 BatchNorms exist but are
never applied (``model.py:43-59``), so they are not materialized here (the
torch-checkpoint importer skips them).

BatchNorm note: under jit with a data-sharded batch, batch statistics are
global (sync-BN) — the reference under DataParallel used per-replica stats;
single-device parity is exact either way.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .amsoftmax import amsoftmax_apply, init_amsoftmax
from .init import linear_params
from .poolings import apply_pooling, init_pooling, pooled_dim
from .vgg import init_vgg, vgg_apply, vgg_output_dim


class ModelState(NamedTuple):
    """Mutable (non-gradient) state: BatchNorm running stats of b2."""

    bn_mean: jnp.ndarray
    bn_var: jnp.ndarray
    bn_count: jnp.ndarray  # batches seen (informational)


def encoder_dim(cfg: ModelConfig) -> int:
    return vgg_output_dim(cfg.front_end, cfg.kernel_size, cfg.feature_size)


def embedding_input_dim(cfg: ModelConfig) -> int:
    return pooled_dim(cfg.pooling_method, encoder_dim(cfg), cfg.heads_number)


def init_speaker_classifier(key, cfg: ModelConfig):
    kv, kp, k1, k2, k3, ka = jax.random.split(key, 6)
    enc_dim = encoder_dim(cfg)
    vec_dim = pooled_dim(cfg.pooling_method, enc_dim, cfg.heads_number)
    emb = cfg.embedding_size
    params = {
        "vgg": init_vgg(kv, cfg),
        "pooling": init_pooling(kp, cfg.pooling_method, enc_dim, cfg.heads_number),
        "fc1": linear_params(k1, vec_dim, emb),
        "fc2": linear_params(k2, emb, emb),
        "b2": {"scale": jnp.ones((emb,)), "bias": jnp.zeros((emb,))},
        "pre_layer": linear_params(k3, emb, emb),
        "amsoftmax": init_amsoftmax(ka, emb, cfg.num_spkrs),
    }
    state = ModelState(
        bn_mean=jnp.zeros((emb,)),
        bn_var=jnp.ones((emb,)),
        bn_count=jnp.zeros((), jnp.int32),
    )
    return params, state


def _batch_norm(
    x: jnp.ndarray,
    p,
    state: ModelState,
    cfg: ModelConfig,
    train: bool,
) -> Tuple[jnp.ndarray, ModelState]:
    """torch ``BatchNorm1d`` semantics: normalize with biased batch variance,
    update running stats with the unbiased variance, momentum 0.1."""
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.mean((x - mean) ** 2, axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(1, n - 1))
        m = cfg.bn_momentum
        new_state = ModelState(
            bn_mean=(1 - m) * state.bn_mean + m * mean,
            bn_var=(1 - m) * state.bn_var + m * unbiased,
            bn_count=state.bn_count + 1,
        )
    else:
        mean, var = state.bn_mean, state.bn_var
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + cfg.bn_eps)
    return y * p["scale"] + p["bias"], new_state


def _linear(p, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _embed_trunk(
    params,
    state: ModelState,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, ModelState, jnp.ndarray]:
    """Shared front: VGG -> pooling -> fc1 -> fc2 -> BN(b2).

    Returns (embedding2, new_state, alignment); embedding2 is the scoring
    embedding the reference taps in ``getEmbedding`` (``model.py:52-59``).
    """
    enc, enc_len = vgg_apply(params["vgg"], x, lengths, cfg)
    return trunk_tail(params, state, enc, enc_len, cfg, train, rng)


def trunk_tail(
    params,
    state: ModelState,
    enc: jnp.ndarray,
    enc_len: Optional[jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, ModelState, jnp.ndarray]:
    """Everything after the encoder: pooling -> fc1 -> fc2 -> BN(b2).

    Split out so alternative encoders (e.g. the int8-quantized VGG in
    ``models/quantized.py``) share the exact reference tail."""
    pooled, alignment = apply_pooling(
        params["pooling"], cfg.pooling_method, enc, enc_len, cfg, train=train, rng=rng
    )
    e1 = jax.nn.relu(_linear(params["fc1"], pooled))
    e2 = jax.nn.relu(_linear(params["fc2"], e1))
    e2, new_state = _batch_norm(e2, params["b2"], state, cfg, train)
    return e2, new_state, alignment


def get_embedding(
    params,
    state: ModelState,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Eval-mode scoring embedding (B, emb) — reference ``model.py:52-59``."""
    emb, _, _ = _embed_trunk(params, state, x, lengths, cfg, train=False, rng=None)
    return emb


def get_alignments(
    params,
    state: ModelState,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
):
    """Attention-alignment introspection (reference ``DoubleMHA.getAlignments``
    / ``MultiHeadAttention.getAlignments``, ``poolings.py:95-101,119-123``).

    Returns the time alignment (B, T', H) — and for DoubleMHA additionally
    the head alignment (B, H) — always via the XLA pooling path.
    """
    from .poolings import head_attention_pool, mha_pool

    enc, enc_len = vgg_apply(params["vgg"], x, lengths, cfg)
    acfg = cfg if not cfg.use_pallas_pooling else dataclasses_replace_no_pallas(cfg)
    if cfg.pooling_method == "MHA":
        _, w = mha_pool(params["pooling"], enc, enc_len, acfg)
        return w
    if cfg.pooling_method == "DoubleMHA":
        heads_ctx, w = mha_pool(params["pooling"]["mha"], enc, enc_len, acfg)
        _, head_w = head_attention_pool(
            params["pooling"]["head_att"], heads_ctx, acfg, train=False, rng=None
        )
        return w, head_w
    if cfg.pooling_method == "Attention":
        from .poolings import attention_pool

        _, w = attention_pool(params["pooling"], enc, enc_len)
        return w
    raise ValueError(f"no alignments for pooling_method {cfg.pooling_method!r}")


def dataclasses_replace_no_pallas(cfg: ModelConfig) -> ModelConfig:
    import dataclasses

    return dataclasses.replace(cfg, use_pallas_pooling=False)


def classifier_features(
    params,
    state: ModelState,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, ModelState]:
    """Trunk + preLayer: the (B, emb) vector the AM-Softmax head consumes
    (``model.py:61-68`` up to predictionLayer). Used by alternative heads
    (chunked / sharded large-vocab CE)."""
    e2, new_state, _ = _embed_trunk(params, state, x, lengths, cfg, train, rng)
    return _linear(params["pre_layer"], e2), new_state


def speaker_classifier_apply(
    params,
    state: ModelState,
    x: jnp.ndarray,
    label: jnp.ndarray,
    step,
    cfg: ModelConfig,
    lengths: Optional[jnp.ndarray] = None,
    train: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, ModelState]:
    """Full forward (reference ``model.py:61-71``):
    returns (costh, scaled margin logits, new_state)."""
    e2, new_state, _ = _embed_trunk(params, state, x, lengths, cfg, train, rng)
    e3 = _linear(params["pre_layer"], e2)
    costh, logits = amsoftmax_apply(params["amsoftmax"], e3, label, step, cfg)
    return costh, logits, new_state
