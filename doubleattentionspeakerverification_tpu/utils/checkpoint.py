"""Checkpointing.

The reference pickles ``{model, optimizer, settings, epoch, step}`` with
torch.save, only on best-EER (``scripts/utils.py:23-40``), and requeue picks
the newest file by ctime (``train.py:31-49``). Here:

- a checkpoint is a single ``.npz`` (flattened pytree leaves keyed by path)
  plus an embedded JSON meta blob (config, step, epoch, best EER, ...);
- both periodic and best checkpoints are supported (the reference's
  best-only policy loses all work since the last improvement on requeue);
- ``latest_checkpoint`` resolves by highest step encoded in the filename
  (ctime as tiebreak).

Restore is template-based: leaves are loaded into a freshly-initialized
pytree of the same structure, so arbitrary optax states round-trip.
"""

from __future__ import annotations

import io
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_elem(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_elem(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def save_checkpoint(path: str, tree: Any, meta: Dict[str, Any]) -> str:
    """Atomic write of pytree + meta to ``path`` (.npz)."""
    flat = _flatten(tree)
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return path


class AsyncCheckpointer:
    """Non-blocking checkpoint writes.

    ``save`` snapshots the pytree to host memory synchronously (device
    buffers may be donated by the next step) and hands serialization + disk
    IO to a single background worker. A newer save to the SAME path
    supersedes a queued one; saves to distinct paths (best vs periodic) all
    land. ``wait`` drains outstanding writes (call before exit)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._thread: "threading.Thread | None" = None
        self._pending: Dict[str, Tuple[Any, Dict[str, Any]]] = {}

    def save(self, path: str, tree: Any, meta: Dict[str, Any]) -> str:
        import threading

        host_tree = jax.tree.map(np.asarray, tree)  # sync device->host copy
        with self._lock:
            self._pending[path] = (host_tree, meta)
            # _drain clears self._thread under this same lock before exiting,
            # so checking the attribute (not is_alive(), which stays True for
            # a worker that has already decided to exit) cannot lose a save
            if self._thread is None:
                self._thread = threading.Thread(target=self._drain, daemon=True)
                self._thread.start()
        return path

    def _drain(self) -> None:
        while True:
            with self._lock:
                if not self._pending:
                    self._thread = None
                    return
                path, (tree, meta) = self._pending.popitem()
            save_checkpoint(path, tree, meta)

    def wait(self, timeout: float = 120.0) -> None:
        import time

        deadline = time.monotonic() + timeout
        while True:
            with self._lock:
                t = self._thread
            if t is None:
                return
            t.join(max(0.0, deadline - time.monotonic()))
            if time.monotonic() >= deadline:
                return


def load_checkpoint(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with the structure of ``template`` plus the meta."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
        data = {k: z[k] for k in z.files if k != "__meta__"}

    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_elems, leaf in leaves_with_path:
        key = "/".join(_path_elem(p) for p in path_elems)
        if key not in data:
            raise KeyError(f"checkpoint {path} missing leaf {key!r}")
        arr = data[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs template {np.shape(leaf)}"
            )
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta


_STEP_RE = re.compile(r"_(\d+)\.npz$")


def checkpoint_path(out_dir: str, model_name: str, step: int) -> str:
    return os.path.join(out_dir, f"{model_name}_{step}.npz")


def latest_checkpoint(out_dir: str) -> Optional[str]:
    if not os.path.isdir(out_dir):
        return None
    best = None
    best_key = None
    for fname in os.listdir(out_dir):
        if not fname.endswith(".npz"):
            continue
        full = os.path.join(out_dir, fname)
        m = _STEP_RE.search(fname)
        step = int(m.group(1)) if m else -1
        key = (step, os.path.getctime(full))
        if best_key is None or key > best_key:
            best, best_key = full, key
    return best


def prune_checkpoints(out_dir: str, model_name: str, keep: int, protect: Tuple[str, ...] = ()) -> None:
    """Keep the newest ``keep`` periodic checkpoints. Best-EER checkpoints
    (``*_best_*.npz``) are never pruned — they are the requeue/inference
    artifact, and after a resume the trainer no longer holds their path."""
    if keep <= 0 or not os.path.isdir(out_dir):
        return
    entries = []
    for fname in os.listdir(out_dir):
        if fname.startswith(model_name) and fname.endswith(".npz"):
            full = os.path.join(out_dir, fname)
            if full in protect or "_best_" in fname:
                continue
            m = _STEP_RE.search(fname)
            entries.append((int(m.group(1)) if m else -1, full))
    entries.sort()
    for _, full in entries[:-keep] if len(entries) > keep else []:
        os.remove(full)


def load_train_state_any(checkpoint_path: str):
    """Full TrainState + meta + config from a ``.npz`` file or ``.orbax``
    directory — the shared loader behind the get_embedding / serve /
    export_checkpoint CLIs. Builds a freshly-initialized template from the
    checkpoint's embedded config and restores into it."""
    from ..config import ExperimentConfig
    from ..models.classifier import init_speaker_classifier
    from ..training.step import init_train_state

    if checkpoint_path.rstrip("/").endswith(".orbax"):
        from .orbax_ckpt import load_checkpoint_orbax

        with open(os.path.join(checkpoint_path, "meta.json")) as f:
            meta = json.load(f)
        cfg = ExperimentConfig.from_dict(meta["config"])
        p0, ms0 = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state, meta = load_checkpoint_orbax(
            checkpoint_path, init_train_state(p0, ms0, cfg)
        )
        return state, meta, cfg

    with np.load(checkpoint_path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
    cfg = ExperimentConfig.from_dict(meta["config"])
    p0, ms0 = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state, meta = load_checkpoint(checkpoint_path, init_train_state(p0, ms0, cfg))
    return state, meta, cfg
