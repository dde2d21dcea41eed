"""Mask-aware primitive ops shared across the model.

The reference never pads (fixed 350-frame training windows, batch-of-1 eval),
so it has no masking at all. Here masks are first-class: they make bucketed
padded batches produce bit-identical results to unpadded forwards, which is
what unlocks batched EER evaluation and static shapes for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e30  # finite -inf stand-in: keeps masked softmax NaN-free


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int -> (B, max_len) bool validity mask."""
    return jnp.arange(max_len) < lengths[..., None]


def masked_softmax(
    scores: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int
) -> jnp.ndarray:
    """Numerically-stable softmax that assigns zero weight to masked slots.

    ``mask`` broadcasts against ``scores`` (True = valid). If every slot along
    ``axis`` is masked the result is all-zero rather than NaN.
    """
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=axis, keepdims=True)
    # Guard fully-masked rows: shift by 0 there so exp() stays finite.
    e = jnp.exp(scores - jnp.where(m <= NEG_INF * 0.5, 0.0, m))
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-30)


def mask_time(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero padded frames of (B, T, ...) given valid lengths (B,)."""
    if lengths is None:
        return x
    t = x.shape[1]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    return jnp.where(mask.reshape(mask.shape + (1,) * (x.ndim - 2)), x, 0.0)
