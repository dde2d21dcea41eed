"""Multi-PROCESS training-step check (real ``jax.distributed``, CPU).

The virtual 8-device CPU mesh used by the test suite exercises sharding
semantics inside ONE process. This tool goes further: it launches N actual
processes (gloo collectives over localhost — the same code path as N TPU
hosts over DCN), each owning a slice of the global device mesh and feeding
its own host shard of the batch, runs the real jitted train step, and
verifies the per-step losses match a single-process run of the identical
global batch bit-for-bit semantics (allclose).

This is the evidence that the multi-host story (``parallel/distributed.py``
+ per-host manifest sharding + GSPMD gradient all-reduce over DCN) is more
than a docstring — the reference has nothing comparable (its only
parallelism is single-node DataParallel, ``scripts/train.py:68-70``).

Usage:
  python tools/multihost_check.py            # orchestrates 2 procs + single
  python tools/multihost_check.py worker I N PORT OUT   # internal
  python tools/multihost_check.py single OUT            # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 2
GLOBAL_BATCH = 4    # rows; 2 per process in the 2-proc run
GRAD_ACCUM = 2
FRAMES = 48
LOCAL_DEVICES = 2   # per process


def _pin_cpu(n_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def _setup(n_devices_total: int):
    """Config, params, and the deterministic global batch stream."""
    import jax
    import numpy as np

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16,
                          num_spkrs=8),
        train=TrainConfig(batch_size=GLOBAL_BATCH, gradient_accumulation=GRAD_ACCUM),
    )
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(params, ms, cfg)
    step_fn = make_train_step(cfg, donate=False)

    rng = np.random.default_rng(7)
    batches = []
    for _ in range(STEPS):
        batches.append({
            "inputs": rng.standard_normal(
                (GRAD_ACCUM, GLOBAL_BATCH, FRAMES, 80)
            ).astype(np.float32),
            "lengths": np.full((GRAD_ACCUM, GLOBAL_BATCH), FRAMES, np.int32),
            "labels": rng.integers(
                0, cfg.model.num_spkrs, (GRAD_ACCUM, GLOBAL_BATCH)
            ).astype(np.int32),
        })
    return cfg, state, step_fn, batches


def run_single(out_path: str) -> None:
    _pin_cpu(LOCAL_DEVICES * 2)
    import jax

    from doubleattentionspeakerverification_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_train_state,
    )

    cfg, state, step_fn, batches = _setup(LOCAL_DEVICES * 2)
    mesh = make_mesh(cfg.mesh)
    state = shard_train_state(state, mesh)
    losses = []
    for i, b in enumerate(batches):
        state, metrics = step_fn(state, shard_batch(b, mesh), jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    with open(out_path, "w") as f:
        json.dump({"losses": losses}, f)


def run_worker(pid: int, nprocs: int, port: int, out_path: str) -> None:
    _pin_cpu(LOCAL_DEVICES)
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, state, step_fn, batches = _setup(LOCAL_DEVICES * nprocs)
    assert jax.device_count() == LOCAL_DEVICES * nprocs

    devices = np.array(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devices, ("data", "model"))

    # params/opt-state are identical on every process (same seed) -> declare
    # them replicated on the global mesh
    state = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()
        ),
        state,
    )

    rows = GLOBAL_BATCH // nprocs  # this host's shard of the batch dim
    losses = []
    for i, b in enumerate(batches):
        local = {k: v[:, pid * rows : (pid + 1) * rows] for k, v in b.items()}
        global_batch = {
            k: multihost_utils.host_local_array_to_global_array(
                v, mesh, P(None, "data")
            )
            for k, v in local.items()
        }
        state, metrics = step_fn(state, global_batch, jax.random.PRNGKey(i))
        loss = metrics["loss"]
        # replicated scalar: every process can read its addressable copy
        losses.append(float(jax.device_get(loss.addressable_data(0))))
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "processes": jax.process_count(),
                       "global_devices": jax.device_count()}, f)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def orchestrate(nprocs: int = 2, port: int = 0) -> int:
    port = port or _free_port()  # concurrent runs must not share a coordinator
    tmp = tempfile.mkdtemp(prefix="multihost_check_")
    single_out = os.path.join(tmp, "single.json")
    multi_out = os.path.join(tmp, "multi.json")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i),
             str(nprocs), str(port), multi_out],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for i in range(nprocs)
    ]
    single = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "single", single_out],
        env=env, capture_output=True, timeout=600,
    )
    for p in procs:
        if p.wait(timeout=600) != 0:
            print("worker failed")
            return 1
    if single.returncode != 0:
        print("single-process run failed:", single.stderr.decode()[-500:])
        return 1

    with open(single_out) as f:
        ref = json.load(f)["losses"]
    with open(multi_out) as f:
        multi = json.load(f)
    ok = all(abs(a - b) < 1e-4 for a, b in zip(ref, multi["losses"]))
    print(f"single-process losses: {ref}")
    print(f"{multi['processes']}-process losses:  {multi['losses']} "
          f"({multi['global_devices']} global devices)")
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    elif len(sys.argv) > 1 and sys.argv[1] == "single":
        run_single(sys.argv[2])
    else:
        raise SystemExit(orchestrate())
