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


# --------------------------------------------------------------- multi-host
def global_train_state(state, mesh: Mesh):
    """Multi-host version of :func:`shard_train_state`: every process holds
    an identical host-local copy of the state (same init seed); each provides
    the shards its devices own via ``make_array_from_callback`` and the
    result is one global jax.Array per leaf. Works single-process too
    (``device_put`` is just faster there)."""
    shardings = train_state_shardings(state, mesh)

    def to_global(x, sh):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree.map(to_global, state, shardings)


def host_batch_rows(mesh: Mesh, global_batch: int):
    """This process's contiguous row range [start, stop) of the global batch
    axis under the standard batch sharding ``P(None, 'data')``.

    Each host's loader assembles ONLY these rows
    (``global_batch // data_axis_span`` of them when the data axis spans
    processes; all of them when the batch is replicated across this host's
    devices, e.g. a pure-'model' mesh)."""
    import jax as _jax

    sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    rows = set()
    for d, idx in sh.devices_indices_map((1, global_batch)).items():
        if d.process_index != _jax.process_index():
            continue
        sl = idx[1]
        start = 0 if sl.start is None else sl.start
        stop = global_batch if sl.stop is None else sl.stop
        rows.update(range(start, stop))
    ordered = sorted(rows)
    if not ordered or ordered != list(range(ordered[0], ordered[-1] + 1)):
        raise ValueError(
            f"process {_jax.process_index()} owns non-contiguous batch rows "
            f"{ordered} under mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}; "
            "use a mesh whose 'data' axis aligns with process boundaries"
        )
    return ordered[0], ordered[-1] + 1


def globalize_batch(batch, mesh: Mesh, global_batch: int):
    """Assemble per-host batch row-slices into global arrays (multi-host).

    ``batch`` values are (G, local_rows, ...) host arrays; the result's
    values are global jax.Arrays of shape (G, global_batch, ...) sharded
    P(None, 'data') — the exact input contract of the jitted train step."""
    data_axis = mesh.axis_names[0]
    out = {}
    for k, v in batch.items():
        sh = NamedSharding(mesh, P(None, data_axis))
        global_shape = (v.shape[0], global_batch) + v.shape[2:]
        out[k] = jax.make_array_from_process_local_data(sh, v, global_shape)
    return out


def host_local_tree(tree):
    """Host-local numpy copies of a (possibly multi-host global) pytree.

    Fully-replicated leaves are read from an addressable shard; sharded
    leaves are all-gathered (collective — every process must call this at
    the same point). Used to run host-local programs (EER validation) on
    params that live on a global mesh."""
    import jax as _jax

    def fetch(x):
        if isinstance(x, _jax.Array) and not x.is_fully_addressable:
            if x.is_fully_replicated:
                return np.asarray(x.addressable_data(0))
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)
