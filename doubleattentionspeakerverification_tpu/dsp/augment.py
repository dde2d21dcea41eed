"""On-device feature augmentation.

SpecAugment (Park et al., "SpecAugment: A Simple Data Augmentation Method
for ASR", Interspeech 2019) time/frequency masking — a capability beyond
the reference, whose only augmentation is batch-level random slicing
(``scripts/train.py:205-207``). Runs inside the jitted train step on the
already-normalized feature windows: masks are built from broadcasted iota
comparisons (static shapes, no data-dependent control flow), so the whole
augmentation fuses into the surrounding elementwise work and costs no
extra HBM round-trip.

Masked cells are zeroed; the features are CMN'd, so zero is the
per-utterance mean — the value SpecAugment recommends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_masks(rng: jax.Array, batch: int, n_masks: int, axis_len: int,
                max_width: int) -> jnp.ndarray:
    """(batch, axis_len) bool keep-mask from ``n_masks`` random spans.

    Per sample and mask: width ~ U{0..max_width}, start ~ U{0..axis_len-width}
    (SpecAugment's convention; width 0 = that mask is a no-op).
    """
    kw, ks = jax.random.split(rng)
    widths = jax.random.randint(kw, (batch, n_masks), 0, max_width + 1)
    starts = (
        jax.random.uniform(ks, (batch, n_masks))
        * (axis_len - widths + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    pos = jnp.arange(axis_len)[None, None, :]            # (1, 1, L)
    inside = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return ~jnp.any(inside, axis=1)                      # (batch, L)


def spec_augment(
    feats: jnp.ndarray,
    rng: jax.Array,
    time_masks: int = 2,
    time_width: int = 30,
    freq_masks: int = 2,
    freq_width: int = 10,
) -> jnp.ndarray:
    """Apply SpecAugment to a ``(B, T, F)`` feature batch."""
    b, t, f = feats.shape
    kt, kf = jax.random.split(rng)
    keep = jnp.ones((b, t, f), bool)
    if time_masks > 0 and time_width > 0:
        keep &= _axis_masks(kt, b, time_masks, t, min(time_width, t))[:, :, None]
    if freq_masks > 0 and freq_width > 0:
        keep &= _axis_masks(kf, b, freq_masks, f, min(freq_width, f))[:, None, :]
    return jnp.where(keep, feats, jnp.zeros((), feats.dtype))
