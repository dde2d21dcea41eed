"""Memory-bounded AM-Softmax cross-entropy for very large speaker counts.

The dense head (``models/amsoftmax.py``) materializes (B, n_spkrs) logits —
at 10^6 speakers that is ~0.5 GB per microbatch plus the same again in the
backward. This implementation scans W in class chunks with an online
(max, sum-exp) reduction, so peak memory is (B, chunk) regardless of
n_spkrs, and ``jax.checkpoint`` on the chunk body keeps the backward at the
same footprint (chunks are recomputed, costing ~1/3 extra FLOPs).

Semantics identical to the dense path (margin at the label, annealing,
scale, accuracy from unmargined cosine argmax) — tested equal.

Composes with the 'model'-axis sharding: under GSPMD each shard scans only
its local chunks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.amsoftmax import NORM_EPS, annealing_alpha


def chunked_amsoftmax_ce(
    params,
    x: jnp.ndarray,
    label: jnp.ndarray,
    step,
    cfg: ModelConfig,
    chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (mean CE loss, accuracy) without materializing full logits.

    ``params['W']``: (emb, n_classes); x: (B, emb); label: (B,).
    """
    w = params["W"]
    emb, n_classes = w.shape
    b = x.shape[0]
    chunk = min(chunk, n_classes)
    n_chunks = -(-n_classes // chunk)

    x_n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), NORM_EPS)
    alpha = annealing_alpha(jnp.asarray(step)) if cfg.annealing else jnp.float32(0.0)
    s = cfg.scaling_factor
    m = cfg.margin_factor

    # Chunks are taken with dynamic_slice inside the scan body instead of a
    # pre-reshaped (n_chunks, emb, chunk) xs input: the xs form costs a full
    # W-sized transpose copy in the forward AND a W-sized stacked cotangent
    # (+ its reshape) in the backward — ~3x W of temps. With dynamic_slice
    # the only W-sized buffer in the backward is the dW accumulator itself.
    # The last chunk is CLAMPED (start = n_classes - chunk) rather than W
    # being padded (another full copy); columns the clamp re-covers are
    # masked out via `valid`.
    def body(carry, c_idx):
        run_max, run_sum, gold, best, best_arg = carry
        start = jnp.minimum(c_idx * chunk, n_classes - chunk)
        w_c = jax.lax.dynamic_slice_in_dim(w, start, chunk, axis=1)
        w_norm = w_c / jnp.maximum(jnp.linalg.norm(w_c, axis=0, keepdims=True), NORM_EPS)
        costh = x_n @ w_norm                                    # (B, chunk)
        col = start + jnp.arange(chunk)[None, :]                # global class ids
        valid = col >= c_idx * chunk   # dedupe the clamped last chunk's overlap
        is_gold = (col == label[:, None]) & valid
        costh_m = costh - jnp.where(is_gold, m, 0.0)
        combined = (costh_m + alpha * costh) / (1.0 + alpha)
        logits = jnp.where(valid, s * combined, -jnp.inf)

        # online logsumexp
        c_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(run_max, c_max)
        scale_old = jnp.exp(run_max - new_max)
        run_sum = run_sum * scale_old + jnp.sum(
            jnp.exp(logits - new_max[:, None]), axis=-1
        )
        gold = gold + jnp.sum(jnp.where(is_gold, logits, 0.0), axis=-1)

        # accuracy argmax over unmargined cosine
        costh_v = jnp.where(valid, costh, -jnp.inf)
        c_best = jnp.max(costh_v, axis=-1)
        c_arg = start + jnp.argmax(costh_v, axis=-1)
        take = c_best > best
        best = jnp.where(take, c_best, best)
        best_arg = jnp.where(take, c_arg, best_arg)
        return (new_max, run_sum, gold, best, best_arg), None

    init = (
        jnp.full((b,), -jnp.inf, jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.zeros((b,), jnp.float32),
        jnp.full((b,), -jnp.inf, jnp.float32),
        jnp.zeros((b,), jnp.int32),
    )
    (run_max, run_sum, gold, _best, best_arg), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(n_chunks)
    )
    ce = jnp.mean(jnp.log(run_sum) + run_max - gold)
    acc = jnp.mean((best_arg == label).astype(jnp.float32))
    return ce, acc
