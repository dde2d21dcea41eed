"""Host->device prefetch pipeline.

On hosts where ``jax.device_put`` blocks (notably relayed/remote backends),
per-step transfers serialize with compute. This iterator wrapper moves the
``device_put`` into a background thread with a small bounded queue, so the
next batch's copy overlaps the current step. Transfer-dtype reduction
(``TrainConfig.transfer_dtype``) composes with this: fewer bytes AND
overlapped.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax


def device_prefetch(
    batches: Iterator[Dict[str, Any]],
    depth: int = 2,
    shardings: Optional[Dict[str, Any]] = None,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident batches, copying ``depth`` ahead."""
    if depth <= 0:
        for b in batches:
            if shardings is not None:
                b = jax.device_put(b, {k: shardings[k] for k in b})
            # single device: hand the HOST batch to jit — its argument
            # transfer pipelines with in-flight execution, while an explicit
            # device_put serializes (measured +110 ms/step on the relay)
            yield b
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for b in batches:
                if stop.is_set():
                    return
                if shardings is not None:
                    b = jax.device_put(b, {k: shardings[k] for k in b})
                else:
                    b = jax.device_put(b)
                q.put(b)
        except BaseException as e:
            q.put(e)
            return
        q.put(None)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while th.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        th.join(timeout=5)
