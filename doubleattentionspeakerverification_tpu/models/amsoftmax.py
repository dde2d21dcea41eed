"""Additive-Margin Softmax head (reference ``scripts/loss.py:5-52``).

Fully on-device: the reference round-trips the label to host every step for
the margin scatter (``loss.py:46-48``); here the margin is a one-hot subtract
fused by XLA into the normalized matmul epilogue.

Annealing (``loss.py:26-35``): alpha(step) = max(0, 1000 / (1 + 1e-4*step)^2),
combined = (costh_m + alpha*costh) / (1 + alpha), logits = s * combined.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .init import xavier_normal

NORM_EPS = 1e-12  # clamp used by the reference's torch.norm(...).clamp(min=1e-12)


def init_amsoftmax(key, in_feats: int, n_classes: int):
    """W (in_feats, n_classes), xavier-normal gain 1 (``loss.py:22-23``)."""
    return {"W": xavier_normal(key, (in_feats, n_classes))}


def annealing_alpha(step: jnp.ndarray) -> jnp.ndarray:
    step = step.astype(jnp.float32)
    return jnp.maximum(0.0, 1000.0 / jnp.square(1.0 + 1e-4 * step))


def annealed_factor(step, cfg: ModelConfig) -> jnp.ndarray:
    """``getAnnealedFactor`` (``loss.py:26-28``): 1 / (1 + alpha)."""
    alpha = annealing_alpha(jnp.asarray(step)) if cfg.annealing else jnp.float32(0.0)
    return 1.0 / (1.0 + alpha)


def cosine_logits(params, x: jnp.ndarray) -> jnp.ndarray:
    """L2-normalized cosine similarity logits costh = x_hat @ W_hat."""
    x_norm = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), NORM_EPS)
    w = params["W"]
    w_norm = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), NORM_EPS)
    return x_norm @ w_norm


def amsoftmax_apply(
    params,
    x: jnp.ndarray,
    label: Optional[jnp.ndarray],
    step,
    cfg: ModelConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (costh, scaled margin logits) like ``AMSoftmax.forward``
    (``loss.py:37-52``): costh feeds accuracy, the scaled logits feed CE."""
    costh = cosine_logits(params, x)
    n_classes = costh.shape[-1]
    delt = jax.nn.one_hot(label, n_classes, dtype=costh.dtype) * cfg.margin_factor
    costh_m = costh - delt
    if cfg.annealing:
        alpha = annealing_alpha(jnp.asarray(step))
        combined = (costh_m + alpha * costh) / (1.0 + alpha)
    else:
        combined = costh_m
    return costh, cfg.scaling_factor * combined


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch (reference ``nn.CrossEntropyLoss``)."""
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)


def focal_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0) -> jnp.ndarray:
    """Focal softmax (reference ``loss.py:54-70``; defined there, never used —
    provided for completeness): loss = (1 - p)^gamma * CE with p = exp(-CE),
    computed on the batch-mean CE exactly as the reference does."""
    ce = cross_entropy(logits, labels)
    p = jnp.exp(-ce)
    return (1.0 - p) ** gamma * ce
