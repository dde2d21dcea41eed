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
    n_chunks = -(-n_classes // chunk)
    pad = n_chunks * chunk - n_classes
    if pad:
        # padded columns are zero vectors -> cosine 0; masked to -inf below
        w = jnp.pad(w, ((0, 0), (0, pad)))

    x_n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), NORM_EPS)
    alpha = annealing_alpha(jnp.asarray(step)) if cfg.annealing else jnp.float32(0.0)
    s = cfg.scaling_factor
    m = cfg.margin_factor

    w_chunks = w.reshape(emb, n_chunks, chunk).transpose(1, 0, 2)  # (n_chunks, emb, chunk)

    def body(carry, inputs):
        run_max, run_sum, gold, best, best_arg = carry
        w_c, c_idx = inputs
        w_norm = w_c / jnp.maximum(jnp.linalg.norm(w_c, axis=0, keepdims=True), NORM_EPS)
        costh = x_n @ w_norm                                    # (B, chunk)
        col = c_idx * chunk + jnp.arange(chunk)[None, :]        # global class ids
        valid = col < n_classes
        is_gold = col == label[:, None]
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
        c_arg = c_idx * chunk + jnp.argmax(costh_v, axis=-1)
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
        jax.checkpoint(body), init, (w_chunks, jnp.arange(n_chunks))
    )
    ce = jnp.mean(jnp.log(run_sum) + run_max - gold)
    acc = jnp.mean((best_arg == label).astype(jnp.float32))
    return ce, acc
