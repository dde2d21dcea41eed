"""Device mesh + sharding placement.

The reference's entire parallelism story is single-node ``nn.DataParallel``
(``scripts/train.py:68-70``). Here scaling is declarative: a
('data', 'model') ``jax.sharding.Mesh``; batches are sharded over 'data',
parameters are replicated except the AM-Softmax speaker matrix W
(emb, n_spkrs) which is sharded over 'model' when the speaker count warrants
it. Under ``jax.jit`` XLA GSPMD then inserts the gradient all-reduces
(psum over ICI) and the cross-shard logsumexp collectives automatically —
the same jitted train step runs unmodified on 1 chip or a pod slice.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model_axis)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model}")
    data = n // model if cfg.data_axis == -1 else cfg.data_axis
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (cfg.data_axis_name, cfg.model_axis_name))


def _is_classifier_w(path) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return "amsoftmax" in keys and keys[-1] == "W"


def train_state_shardings(state, mesh: Mesh):
    """Sharding tree for a TrainState: replicate everything except the
    speaker-classifier W (and its optimizer moments), sharded over 'model'."""
    model_axis = mesh.axis_names[1]

    def rule(path, leaf):
        if _is_classifier_w(path) and getattr(leaf, "ndim", 0) == 2:
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh (classifier W model-sharded)."""
    return jax.device_put(state, train_state_shardings(state, mesh))


def batch_shardings(batch: Dict[str, Any], mesh: Mesh):
    """Batches (G, B, ...) are sharded over 'data' on the B axis."""
    data_axis = mesh.axis_names[0]
    return {k: NamedSharding(mesh, P(None, data_axis)) for k in batch}


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    return jax.device_put(batch, batch_shardings(batch, mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
