"""Explicit model-parallel AM-Softmax cross-entropy via shard_map.

The GSPMD path (sharding-annotated W + plain jnp code) is the default; this
module is the hand-written communication pattern for the large-speaker-count
regime (n_spkrs >> one chip), with the collectives made explicit:

- each 'model' shard holds W_shard (emb, n/m) and computes local cosine
  logits (B, n/m);
- the additive margin is applied on the label's owner shard only
  (local one-hot scatter with global->local index translation);
- CE needs a *global* softmax over speakers: global max via ``pmax``,
  sum-exp and the gold logit via ``psum`` over the 'model' axis — a pair of
  scalar-per-row collectives instead of materializing gathered logits;
- accuracy argmax uses the pmax-then-owner-vote trick.

All collectives ride ICI inside a slice; batch stays sharded over 'data'.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..models.amsoftmax import NORM_EPS, annealing_alpha


def _local_margin_logits(w_shard, x, label, step, cfg: ModelConfig, shard_idx, shard_size):
    """Per-shard (costh_local, scaled_local) with on-shard margin scatter."""
    x_n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), NORM_EPS)
    w_n = w_shard / jnp.maximum(jnp.linalg.norm(w_shard, axis=0, keepdims=True), NORM_EPS)
    costh = x_n @ w_n                                   # (B, n/m)
    local_label = label - shard_idx * shard_size
    in_range = (local_label >= 0) & (local_label < shard_size)
    onehot = jax.nn.one_hot(
        jnp.where(in_range, local_label, 0), shard_size, dtype=costh.dtype
    ) * in_range[:, None].astype(costh.dtype)
    costh_m = costh - onehot * cfg.margin_factor
    if cfg.annealing:
        alpha = annealing_alpha(jnp.asarray(step))
        combined = (costh_m + alpha * costh) / (1.0 + alpha)
    else:
        combined = costh_m
    return costh, cfg.scaling_factor * combined, onehot


def sharded_amsoftmax_ce(
    params,
    x: jnp.ndarray,
    label: jnp.ndarray,
    step,
    cfg: ModelConfig,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE + accuracy with W sharded over the mesh's 'model' axis.

    ``x`` (B, emb) and ``label`` (B,) replicated over 'model' (sharded over
    'data' outside). Returns (loss, accuracy), both replicated.
    """
    model_axis = mesh.axis_names[1]
    n_shards = mesh.shape[model_axis]
    n_classes = params["W"].shape[1]
    assert n_classes % n_shards == 0, "n_spkrs must divide by model axis"
    shard_size = n_classes // n_shards

    def shard_fn(w_shard, x, label, step):
        idx = jax.lax.axis_index(model_axis)
        costh, logits, onehot = _local_margin_logits(
            w_shard, x, label, step, cfg, idx, shard_size
        )
        # global logsumexp over the sharded class axis. The max is only a
        # numerical stabilizer — logsumexp's gradient is independent of it —
        # and pmax has no differentiation rule, so stop_gradient is both
        # exact and required for the backward pass (training uses this CE).
        local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
        gmax = jax.lax.pmax(local_max, model_axis)
        sumexp = jax.lax.psum(
            jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1), model_axis
        )
        gold = jax.lax.psum(jnp.sum(logits * onehot, axis=-1), model_axis)
        ce = jnp.mean(jnp.log(sumexp) + gmax - gold)

        # global argmax of costh for accuracy (pmax + owner vote);
        # metric-only, never differentiated
        costh = jax.lax.stop_gradient(costh)
        local_best = jnp.max(costh, axis=-1)
        local_arg = jnp.argmax(costh, axis=-1) + idx * shard_size
        gbest = jax.lax.pmax(local_best, model_axis)
        owner = (local_best == gbest).astype(jnp.int32)
        # first owner wins on exact ties: take the minimum owning index
        arg = jax.lax.pmin(
            jnp.where(owner == 1, local_arg, n_classes + 1), model_axis
        )
        acc = jnp.mean((arg == label).astype(jnp.float32))
        return ce, acc

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, model_axis), P(), P(), P()),
        out_specs=(P(), P()),
    )(params["W"], x, label, jnp.asarray(step))


def sharded_cosine_scores_allgather(embeddings: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """All-gather embedding shards over 'data' for trial scoring — the
    multi-chip EER path (each host scores against the full embedding set)."""
    data_axis = mesh.axis_names[0]

    def fn(local):
        return jax.lax.all_gather(local, data_axis, tiled=True)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(data_axis), out_specs=P(), check_vma=False
    )(embeddings)
