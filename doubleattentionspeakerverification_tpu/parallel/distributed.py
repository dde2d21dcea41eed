"""Multi-host initialization.

The reference scales past one node only via slurm requeue restarts (no
torch.distributed anywhere — SURVEY §2b). Here multi-host data parallelism
is native: ``jax.distributed.initialize`` connects the hosts, every host
runs the same program, the global mesh spans all chips (ICI within a slice,
DCN across hosts, both handled by the runtime). Every host derives the
IDENTICAL global batch stream — a pure function of (seed, epoch, step,
global row) — and assembles only the rows its own devices hold under the
batch sharding (``data.dataset.TrainLoader`` with ``local_rows``,
``parallel.mesh.globalize_batch``); a 2-host run therefore consumes
bit-identical batches to a 1-host run while touching batch/num_hosts
files per step.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class HostInfo:
    host_id: int
    num_hosts: int
    local_device_count: int
    global_device_count: int


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    force: bool = False,
) -> HostInfo:
    """Initialize multi-host JAX if configured; no-op for single host.

    Configuration comes from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also
    populated automatically on Cloud TPU VMs / slurm via jax's cluster
    detection). ``force=True`` calls ``jax.distributed.initialize`` even
    when no explicit configuration is visible (pure auto-detection
    environments, e.g. multi-host Cloud TPU pods).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    want_multi = (
        force or coordinator_address is not None or os.environ.get("SLURM_NTASKS")
    )
    # already-initialized check must NOT touch the backend: jax.process_count()
    # initializes XLA, after which jax.distributed.initialize refuses to run.
    # Public API first (backend-free); private fallback for older jax.
    if hasattr(jax.distributed, "is_initialized"):
        already = jax.distributed.is_initialized()
    else:  # pragma: no cover - older jax
        from jax._src import distributed as _dist

        already = (
            getattr(getattr(_dist, "global_state", None), "client", None) is not None
        )
    if want_multi and not already:
        kwargs = {}
        if coordinator_address:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return HostInfo(
        host_id=jax.process_index(),
        num_hosts=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )
