"""PRODUCTION multi-host training check: the real Trainer + CLI across 2
processes (real ``jax.distributed``, CPU).

Where ``tools/multihost_check.py`` proves the raw jitted step, this drives
the full production path end to end in every process —
``cli/train.py --distributed`` -> Trainer -> TrainLoader (per-host batch-row
slices) -> globalized batches -> jitted step over the global mesh -> EER
validation -> Orbax checkpoints -> process restart -> ``--requeue`` resume —
and verifies against single-process runs:

  A. data-parallel parity: a 2-process run's per-step losses and EERs match
     a single-process run of the identical config (the loader's global batch
     stream is host-count-invariant by construction, ``data/dataset.py``);
  B. checkpoint lifecycle: train 2 procs -> stop -> fresh 2 procs with
     ``--requeue`` -> the continued loss stream equals an uninterrupted
     2-process run (Orbax restored every shard losslessly);
  C. cross-process model sharding: the same lifecycle with the AM-Softmax W
     sharded over a 'model' axis that SPANS the two processes
     (``--model_parallel 2``, one device per process).

The reference's only parallelism is single-node DataParallel
(``scripts/train.py:68-70``); none of this exists there.

Usage:
  python tools/multihost_trainer_check.py            # orchestrate A+B+C
  python tools/multihost_trainer_check.py A          # one scenario
  python tools/multihost_trainer_check.py worker ... # internal
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SPK = 4
PER_SPK = 8          # 32 files -> 2 optimizer steps/epoch at batch 8 x accum 2
FRAMES = 90
BATCH = 8
ACCUM = 2


def make_corpus(root: str) -> None:
    """Tiny class-separable synthetic feature corpus in reference pickle
    format ((n_mels, T) float32) + labels + trial lists."""
    os.makedirs(root, exist_ok=True)
    feat_dir = os.path.join(root, "feats")
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    means = rng.standard_normal((N_SPK, 80)).astype(np.float32) * 2.0
    labels, names = [], {}
    for s in range(N_SPK):
        for u in range(PER_SPK):
            name = f"spk{s}_u{u}"
            feats = (means[s][None, :]
                     + 0.5 * rng.standard_normal((FRAMES, 80))).astype(np.float32)
            with open(os.path.join(feat_dir, f"{name}.pickle"), "wb") as f:
                pickle.dump(np.transpose(feats), f)
            labels.append(f"{name} {s} -1\n")
            names.setdefault(s, []).append(name)
    with open(os.path.join(root, "labels.ndx"), "w") as f:
        f.writelines(labels)
    with open(os.path.join(root, "clients.ndx"), "w") as f:
        f.writelines(f"{v[0]} {v[1]}\n" for v in names.values())
    with open(os.path.join(root, "impostors.ndx"), "w") as f:
        f.writelines(f"{names[0][i]} {names[1][i]}\n" for i in range(2))


def train_argv(root: str, out_dir: str, max_epochs: int, requeue: bool,
               model_parallel: int = 1, validate_every: int = 2,
               optimizer: str = "Adam") -> list:
    argv = [
        "--optimizer", optimizer,
        "--train_data_dir", os.path.join(root, "feats"),
        "--valid_data_dir", os.path.join(root, "feats"),
        "--train_labels_path", os.path.join(root, "labels.ndx"),
        "--valid_clients", os.path.join(root, "clients.ndx"),
        "--valid_impostors", os.path.join(root, "impostors.ndx"),
        "--out_dir", out_dir, "--model_name", "mh",
        "--front_end", "VGG4L", "--kernel_size", "16", "--heads_number", "4",
        "--embedding_size", "32", "--window_size", "0.8",
        "--batch_size", str(BATCH), "--gradientAccumulation", str(ACCUM),
        "--learning_rate", "2e-3", "--max_epochs", str(max_epochs),
        "--print_every", "1", "--validate_every", str(validate_every),
        "--checkpoint_every", "1", "--checkpoint_backend", "orbax",
        "--sync_validation", "--num_workers", "1",
        "--model_parallel", str(model_parallel),
    ]
    if requeue:
        argv.append("--requeue")
    return argv


def run_worker(pid: int, nprocs: int, port: int, local_devices: int,
               argv: list) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from doubleattentionspeakerverification_tpu.cli.train import main

    raise SystemExit(main(argv + [
        "--distributed", "--coordinator_address", f"127.0.0.1:{port}",
        "--num_processes", str(nprocs), "--process_id", str(pid),
    ]))


def run_single(local_devices: int, argv: list) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    from doubleattentionspeakerverification_tpu.cli.train import main

    raise SystemExit(main(argv))


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_multi(nprocs: int, local_devices: int, argv: list) -> None:
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker", str(i),
             str(nprocs), str(port), str(local_devices)] + argv,
            env=env,
            stdout=subprocess.DEVNULL if i else None,
            stderr=subprocess.STDOUT if i else None,
        )
        for i in range(nprocs)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise RuntimeError(f"multi-process workers failed: rcs={rcs}")


def _launch_single(local_devices: int, argv: list) -> None:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "single",
         str(local_devices)] + argv,
        env=env, timeout=900,
    ).returncode
    if rc:
        raise RuntimeError(f"single-process run failed: rc={rc}")


def _events(out_dir: str):
    jsonl = [f for f in os.listdir(out_dir) if f.endswith("_metrics.jsonl")]
    assert len(jsonl) == 1, f"expected one metrics jsonl in {out_dir}: {jsonl}"
    with open(os.path.join(out_dir, jsonl[0])) as f:
        return [json.loads(line) for line in f]


def _losses(events):  # print_every=1 -> one train event per optimizer step
    return [(int(e["step"]), e["xent"]) for e in events if e["event"] == "train"]


def _eers(events):
    return [(int(e["step"]), e["eer"]) for e in events if e["event"] == "validate"]


def _assert_close(name, a, b, tol=2e-4):
    assert len(a) == len(b) and len(a) > 0, f"{name}: {len(a)} vs {len(b)} entries"
    for (sa, va), (sb, vb) in zip(a, b):
        assert sa == sb, f"{name}: step mismatch {sa} vs {sb}"
        assert abs(va - vb) <= tol, f"{name}: step {sa}: {va} vs {vb}"
    print(f"  {name}: {len(a)} entries match (max tol {tol})")


def scenario_A(root: str) -> None:
    """2-process DP Trainer == single-process Trainer (losses + EERs).

    SGD deliberately: its update is linear in the gradient, so the only
    cross-topology difference is all-reduce rounding (~1e-7) and per-step
    losses must agree tightly — any loader/mesh/row-mapping bug shows as
    O(1) divergence. (Adam's first-step update is lr*sign(g), which turns
    reduction-order rounding on near-zero gradients into +-lr parameter
    flips — inherent to f32 across topologies, not a framework defect;
    Adam exactness is covered by B/C's identical-topology continuation.)"""
    print("[A] data-parallel production-trainer parity (2 procs x 2 dev vs 1 proc x 4 dev)")
    single_out = os.path.join(root, "A_single")
    multi_out = os.path.join(root, "A_multi")
    args = dict(optimizer="SGD")
    _launch_single(4, train_argv(root, single_out, 2, False, **args))
    _launch_multi(2, 2, train_argv(root, multi_out, 2, False, **args))
    se, me = _events(single_out), _events(multi_out)
    _assert_close("losses", _losses(se), _losses(me), tol=1e-3)
    _assert_close("EERs", _eers(se), _eers(me), tol=0.51)


def scenario_B(root: str) -> None:
    """2-process orbax checkpoint lifecycle: train -> stop -> fresh
    processes --requeue -> continued losses == uninterrupted run."""
    print("[B] 2-process Orbax checkpoint + restart + --requeue resume")
    resumed_out = os.path.join(root, "B_resumed")
    full_out = os.path.join(root, "B_full")
    _launch_multi(2, 2, train_argv(root, resumed_out, max_epochs=2, requeue=False))
    # fresh processes = the post-kill requeue restart path
    _launch_multi(2, 2, train_argv(root, resumed_out, max_epochs=4, requeue=True))
    _launch_multi(2, 2, train_argv(root, full_out, max_epochs=4, requeue=False))
    _assert_close("losses", _losses(_events(resumed_out)),
                  _losses(_events(full_out)))


def scenario_C(root: str) -> None:
    """Same lifecycle with the classifier W sharded ACROSS the processes
    (model axis spans them; batch replicated; each host saves/restores its
    own W shard through orbax)."""
    print("[C] cross-process model-parallel sharding + checkpoint lifecycle")
    resumed_out = os.path.join(root, "C_resumed")
    full_out = os.path.join(root, "C_full")
    # validation ON: multi-host validate() all-gathers the cross-process W
    # shards (parallel/mesh.py:host_local_tree, process_allgather branch) —
    # this is the only place that path runs with truly remote shards
    args = dict(model_parallel=2, validate_every=2)
    _launch_multi(2, 1, train_argv(root, resumed_out, 1, False, **args))
    _launch_multi(2, 1, train_argv(root, resumed_out, 2, True, **args))
    _launch_multi(2, 1, train_argv(root, full_out, 2, False, **args))
    _assert_close("losses", _losses(_events(resumed_out)),
                  _losses(_events(full_out)))
    _assert_close("EERs", _eers(_events(resumed_out)),
                  _eers(_events(full_out)), tol=0.51)


def orchestrate(which: str = "ABC") -> int:
    root = tempfile.mkdtemp(prefix="multihost_trainer_")
    make_corpus(root)
    for name in which:
        {"A": scenario_A, "B": scenario_B, "C": scenario_C}[name](root)
    print("MATCH")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   int(sys.argv[5]), sys.argv[6:])
    elif len(sys.argv) > 1 and sys.argv[1] == "single":
        run_single(int(sys.argv[2]), sys.argv[3:])
    else:
        which = sys.argv[1] if len(sys.argv) > 1 else "ABC"
        raise SystemExit(orchestrate(which))
