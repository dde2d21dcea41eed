"""Attention pooling family (reference ``scripts/poolings.py``), mask-aware.

Variants:
- ``attention_pool``      — single learned-vector attention (poolings.py:14-27)
- ``mha_pool``            — level-1 multi-head attention (poolings.py:73-109)
- ``head_attention_pool`` — level-2 attention over heads with random head
                            dropout in training (poolings.py:29-71)
- ``double_mha_pool``     — the paper's Double MHA (poolings.py:112-129)
- ``statistical_pool``    — masked mean+std pooling (extra baseline variant)

Reference quirk kept behind ``cfg.mha_dk_is_heads`` (default True): the MHA
score scale divides by sqrt(heads_number) because the reference's
``d_k = query.size(-1)`` is the heads count, not the head size
(poolings.py:75-76).

Head dropout parity (poolings.py:36-43): each head is masked to -inf with
probability ``1 / int(1 / mask_prob)`` (so mask_prob=0.3 -> P=1/3). The
reference uses the unseeded CUDA RNG; here the draw is a deterministic
function of the step's PRNG key. A fully-masked row falls back to the
unmasked scores instead of NaN (the reference would NaN; at 32 heads the
event has probability ~(1/3)^32 and is unobservable).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.masked_ops import NEG_INF, masked_softmax
from .init import xavier_normal


# --------------------------------------------------------------------- inits
def init_attention(key, dim: int):
    return {"att": xavier_normal(key, (dim, 1))}


def init_mha(key, encoder_size: int, heads: int):
    assert encoder_size % heads == 0
    return {"query": xavier_normal(key, (encoder_size // heads, heads))}


def init_double_mha(key, encoder_size: int, heads: int):
    k1, k2 = jax.random.split(key)
    return {
        "mha": init_mha(k1, encoder_size, heads),
        "head_att": init_attention(k2, encoder_size // heads),
    }


def init_pooling(key, method: str, encoder_size: int, heads: int):
    if method == "Attention":
        return init_attention(key, encoder_size)
    if method == "MHA":
        return init_mha(key, encoder_size, heads)
    if method == "DoubleMHA":
        return init_double_mha(key, encoder_size, heads)
    if method == "StatisticalPooling":
        return {}
    raise ValueError(f"unknown pooling_method {method!r}")


def pooled_dim(method: str, encoder_size: int, heads: int) -> int:
    """Output dim of the pooling layer (reference ``model.py:32-41``)."""
    if method in ("Attention", "MHA"):
        return encoder_size
    if method == "DoubleMHA":
        return encoder_size // heads
    if method == "StatisticalPooling":
        return 2 * encoder_size
    raise ValueError(f"unknown pooling_method {method!r}")


# ------------------------------------------------------------------- applies
def attention_pool(
    params, ht: jnp.ndarray, lengths: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> (B, D). scores = ht @ att, softmax over time
    (poolings.py:22-27)."""
    scores = jnp.einsum("btd,dk->bt", ht, params["att"])
    mask = None
    if lengths is not None:
        mask = jnp.arange(ht.shape[1])[None, :] < lengths[:, None]
    w = masked_softmax(scores, mask, axis=-1)
    ct = jnp.einsum("bt,btd->bd", w, ht)
    return ct, w


def mha_pool(
    params,
    ht: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> per-head contexts (B, H, d_h) + alignments (B, T, H).

    scores[b,t,h] = <ht[b,t,h*d_h:(h+1)*d_h], query[:,h]> / sqrt(d_k), softmax
    over time per head, weighted sum (``innerKeyValueAttention``,
    poolings.py:73-79).
    """
    b, t, d = ht.shape
    heads = cfg.heads_number
    d_h = d // heads
    if cfg.use_pallas_pooling:
        from ..ops.pooling_pallas import mha_pool_pallas

        ctx = mha_pool_pallas(
            params, ht, lengths, heads=heads, dk_is_heads=cfg.mha_dk_is_heads
        )
        return ctx, None  # alignments are introspection-only; use XLA path
    ht_r = ht.reshape(b, t, heads, d_h)
    d_k = float(heads if cfg.mha_dk_is_heads else d_h)
    scores = jnp.einsum("bthd,dh->bth", ht_r, params["query"]) / math.sqrt(d_k)
    mask = None
    if lengths is not None:
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]  # (B,T,1)
    w = masked_softmax(scores, mask, axis=1)                            # (B,T,H)
    heads_ctx = jnp.einsum("bth,bthd->bhd", w, ht_r)
    return heads_ctx, w


def head_attention_pool(
    params,
    heads_ctx: jnp.ndarray,
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, d_h) -> (B, d_h): attention over head vectors with train-time
    random head dropout (poolings.py:29-71, __narrowAttention path).

    ``cfg.mask_prob <= 0`` disables the dropout entirely (an extension: the
    reference computes ``int(1/mask_prob)`` at construction, poolings.py:36,
    so 0 is outside its domain — don't export such a model for reference
    TRAINING, inference is unaffected)."""
    scores = jnp.einsum("bhd,dk->bh", heads_ctx, params["att"])
    if train and cfg.mask_prob > 0:
        if rng is None:
            raise ValueError("head_attention_pool needs an rng in train mode")
        n_levels = int(1.0 / cfg.mask_prob)  # P(drop) = 1/n_levels
        draws = jax.random.randint(rng, scores.shape, 0, n_levels)
        keep = draws > 0
        masked = jnp.where(keep, scores, NEG_INF)
        # all-heads-dropped fallback (reference would NaN)
        any_kept = jnp.any(keep, axis=-1, keepdims=True)
        scores = jnp.where(any_kept, masked, scores)
    w = jax.nn.softmax(scores, axis=-1)
    ct = jnp.einsum("bh,bhd->bd", w, heads_ctx)
    return ct, w


def double_mha_pool(
    params,
    ht: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MHA over time then attention over heads (poolings.py:112-129)."""
    heads_ctx, alignment = mha_pool(params["mha"], ht, lengths, cfg)
    ct, _ = head_attention_pool(params["head_att"], heads_ctx, cfg, train, rng)
    return ct, alignment


def statistical_pool(
    ht: jnp.ndarray, lengths: Optional[jnp.ndarray], eps: float = 1e-8
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked mean++std pooling -> (B, 2D). Baseline variant (x-vector style)."""
    b, t, d = ht.shape
    if lengths is None:
        mean = jnp.mean(ht, axis=1)
        var = jnp.mean((ht - mean[:, None, :]) ** 2, axis=1)
    else:
        mask = (jnp.arange(t)[None, :] < lengths[:, None])[..., None]
        denom = jnp.maximum(1, lengths)[:, None].astype(ht.dtype)
        mean = jnp.sum(jnp.where(mask, ht, 0.0), axis=1) / denom
        var = jnp.sum(jnp.where(mask, (ht - mean[:, None, :]) ** 2, 0.0), axis=1) / denom
    std = jnp.sqrt(var + eps)
    return jnp.concatenate([mean, std], axis=-1), mean


def apply_pooling(
    params,
    method: str,
    ht: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    cfg: ModelConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if method == "Attention":
        return attention_pool(params, ht, lengths)
    if method == "MHA":
        heads_ctx, w = mha_pool(params, ht, lengths, cfg)
        b = heads_ctx.shape[0]
        return heads_ctx.reshape(b, -1), w
    if method == "DoubleMHA":
        return double_mha_pool(params, ht, lengths, cfg, train, rng)
    if method == "StatisticalPooling":
        return statistical_pool(ht, lengths)
    raise ValueError(f"unknown pooling_method {method!r}")
