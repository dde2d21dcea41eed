"""Orbax checkpoint backend (sharded, multi-host).

The default ``.npz`` backend (``utils.checkpoint``) gathers every array to
one host — fine single-host, wasteful on a pod where the AM-Softmax W and
its Adam moments are sharded over ``'model'``. This backend writes through
Orbax: every host persists only the shards it owns, restore re-shards to
the live mesh, and directory finalization is atomic (a crashed save is
invisible to ``latest``).

Selected with ``TrainConfig.checkpoint_backend='orbax'``; the reference has
no analogue (its ``torch.save`` is single-file, ``scripts/utils.py:23-40``).
A checkpoint is a directory ``<name>_<step>.orbax/`` containing the Orbax
pytree plus a ``meta.json`` (same meta dict as the npz backend).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax


def _finalize_meta(path: str, meta: Dict[str, Any]) -> None:
    """Write meta.json — which doubles as the finalization marker
    ``latest_orbax_checkpoint`` keys on — from process 0 only, with a
    cross-host barrier so no process can observe (or prune around) a
    checkpoint whose marker hasn't landed."""
    if jax.process_index() == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_meta:{os.path.basename(path)}")


def save_checkpoint_orbax(path: str, tree: Any, meta: Dict[str, Any]) -> str:
    """Synchronous write of ``tree`` to the directory ``path`` (should end
    in ``.orbax``); blocks through the full disk write.

    Multi-host: EVERY process must call this at the same point (orbax
    coordinates internally; each host persists only the shards its devices
    own)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    _finalize_meta(path, meta)
    return path


class OrbaxAsyncSaver:
    """Async orbax writes with deferred meta.json finalization.

    ``save`` blocks only for the device->host snapshot (orbax's async path
    copies arrays to host before returning, so the train step may donate
    the state buffers immediately after); serialization + disk IO run in
    orbax's background thread. The meta.json finalization marker is written
    at the next ``wait`` — the next save, a best-checkpoint blocking save,
    or end of training — so a crash mid-write leaves the directory
    invisible to ``latest_orbax_checkpoint``, exactly like the sync path.

    One save is in flight at a time (a second ``save`` first finalizes the
    previous one — by then its disk write has long landed, so the wait is
    ~free). Crash-window tradeoff vs the sync path: save N's marker lands
    at save N+1, so a hard kill between them resumes from N-1 — up to TWO
    checkpoint intervals lost where sync loses one. Shorten
    ``checkpoint_every`` (the saves are cheap now) or pass
    ``checkpoint_async=False`` where the single-interval bound matters
    more than the per-save stall; graceful SIGTERM preemption is unaffected
    (it blocks through finalization before exiting).

    Multi-host: every method is a COLLECTIVE — call at the same program
    point on every process (the Trainer only calls at identical step
    boundaries). Both orbax's internal finalize and the meta barrier
    coordinate across processes.
    """

    def __init__(self):
        self._ckptr = None
        self._pending: Optional[Tuple[str, Dict[str, Any]]] = None

    def _checkpointer(self):
        import orbax.checkpoint as ocp

        if self._ckptr is None:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        return self._ckptr

    def save(self, path: str, tree: Any, meta: Dict[str, Any],
             block: bool = False) -> str:
        import orbax.checkpoint as ocp

        self.wait()
        path = os.path.abspath(path)
        self._checkpointer().save(
            path, args=ocp.args.StandardSave(tree), force=True
        )
        self._pending = (path, meta)
        if block:
            self.wait()
        return path

    def wait(self) -> None:
        """Finalize the in-flight save (if any): block until orbax commits
        the directory, then land meta.json (+ barrier on multi-host)."""
        if self._pending is None:
            return
        path, meta = self._pending
        self._pending = None
        self._checkpointer().wait_until_finished()
        _finalize_meta(path, meta)

    def close(self) -> None:
        self.wait()
        if self._ckptr is not None:
            self._ckptr.close()
            self._ckptr = None


def load_checkpoint_orbax(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree with ``template``'s structure (and shardings, if its
    leaves are sharded jax.Arrays) plus the meta dict."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    tree = ckptr.restore(path, abstract)
    ckptr.close()
    meta_path = os.path.join(path, "meta.json")
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


_STEP_RE = re.compile(r"_(\d+)\.orbax$")


def latest_orbax_checkpoint(out_dir: str) -> Optional[str]:
    if not os.path.isdir(out_dir):
        return None
    best, best_key = None, None
    for fname in os.listdir(out_dir):
        full = os.path.join(out_dir, fname)
        m = _STEP_RE.search(fname)
        if m is None or not os.path.isdir(full):
            continue
        if not os.path.exists(os.path.join(full, "meta.json")):
            continue  # unfinished save
        key = (int(m.group(1)), os.path.getctime(full))
        if best_key is None or key > best_key:
            best, best_key = full, key
    return best


def prune_orbax_checkpoints(
    out_dir: str, model_name: str, keep: int, protect: Tuple[str, ...] = ()
) -> None:
    """Keep the newest ``keep`` FINALIZED periodic ``.orbax`` dirs; never
    best ones. Only finalized dirs (meta.json present) count toward
    ``keep`` — an in-flight async save must not displace the last
    resumable checkpoint (with keep=1 that would leave ZERO resumable
    checkpoints if the process died before the deferred finalization).
    Unfinalized dirs older than the newest finalized one are crashed
    leftovers and are removed. Multi-host: only process 0 deletes
    (concurrent rmtree of one dir from several hosts races; best-effort
    pruning needs no barrier)."""
    import shutil

    import jax

    if keep <= 0 or not os.path.isdir(out_dir) or jax.process_index() != 0:
        return
    finalized, unfinalized = [], []
    for fname in os.listdir(out_dir):
        full = os.path.join(out_dir, fname)
        m = _STEP_RE.search(fname)
        if (
            m is None
            or not fname.startswith(model_name)
            or not os.path.isdir(full)
            or "_best_" in fname
            or full in protect
            or os.path.abspath(full) in protect
        ):
            continue
        if os.path.exists(os.path.join(full, "meta.json")):
            finalized.append((int(m.group(1)), full))
        else:
            unfinalized.append((int(m.group(1)), full))
    finalized.sort()
    doomed = [full for _, full in finalized[:-keep]] if len(finalized) > keep else []
    if finalized:
        newest_final = finalized[-1][0]
        # stale crashed leftovers; anything newer may be the in-flight save
        doomed += [full for step, full in unfinalized if step < newest_final]
    for full in doomed:
        shutil.rmtree(full, ignore_errors=True)
