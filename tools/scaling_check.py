"""Multi-chip scaling evidence without multi-chip hardware.

Runs the SAME jitted train step over ('data','model') meshes of 1/2/4/8
virtual CPU devices (the code path is identical on a real slice — GSPMD
decides the collectives, not us) and reports, per mesh:

- loss parity vs the single-device step (same batch, same init);
- the collectives XLA inserted (all-reduce / all-gather / reduce-scatter /
  collective-permute counts from the optimized HLO) — evidence that
  gradients ride ONE all-reduce and the model-sharded classifier's CE uses
  the expected cross-shard reductions;
- wall-clock per step (CPU-mesh timings are NOT throughput numbers; they
  only show the program runs and scales structurally).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_check.py
(or plain `python tools/scaling_check.py` — it self-pins like
``__graft_entry__.dryrun_multichip``.)
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pin_cpu(n: int) -> None:
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass


def collective_counts(hlo_text: str) -> dict:
    """Count collective instruction DEFINITIONS (opcode followed by its
    operand list). A bare word count over-reports 2-4x: the op name also
    appears in the instruction's own name (%all-reduce.2) and in every
    operand reference to it."""
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        n = len(re.findall(rf"(?<!%){op}(?:-start)?\(", hlo_text))
        if n:
            out[op] = n
    return out


def main() -> int:
    _pin_cpu(8)
    import jax

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        MeshConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
    )
    from doubleattentionspeakerverification_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_train_state,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    devices = jax.devices()
    if len(devices) < 8:
        print(f"need 8 devices, have {len(devices)}", file=sys.stderr)
        return 1

    n_spk, b, g, t = 64, 8, 2, 48
    rng = np.random.default_rng(0)
    host_batch = {
        "inputs": rng.standard_normal((g, b, t, 80)).astype(np.float32),
        "lengths": np.full((g, b), t, np.int32),
        "labels": rng.integers(0, n_spk, (g, b)).astype(np.int32),
    }

    window_s = 0.48  # t=48 frames
    ref_loss = None
    print(f"{'mesh':>12} {'loss':>10} {'parity':>8} {'ms/step':>8} "
          f"{'audio-s/s/chip':>14}  collectives")
    for n_dev, model_axis in (
        (1, 1), (2, 1), (2, 2), (4, 1), (4, 2), (4, 4), (8, 2), (8, 4)
    ):
        cfg = ExperimentConfig(
            model=ModelConfig(kernel_size=16, heads_number=4,
                              embedding_size=32, num_spkrs=n_spk),
            train=TrainConfig(batch_size=b, gradient_accumulation=g, seed=1234),
            mesh=MeshConfig(model_axis=model_axis),
        )
        params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(params, ms, cfg)
        mesh = make_mesh(cfg.mesh, devices=devices[:n_dev])
        state = shard_train_state(state, mesh)
        batch = shard_batch(dict(host_batch), mesh)

        step = make_train_step(cfg, donate=False)
        compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        hlo = compiled.as_text()
        new_state, metrics = compiled(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics["loss"])

        t0 = time.perf_counter()
        for _ in range(3):
            new_state, metrics = compiled(new_state, batch, jax.random.PRNGKey(1))
        float(metrics["loss"])
        ms = (time.perf_counter() - t0) / 3 * 1e3

        if ref_loss is None:
            ref_loss = loss
        ok = abs(loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss))
        shape = "x".join(f"{k}={v}" for k, v in mesh.shape.items())
        # per-chip throughput at this layout; on the virtual CPU mesh this
        # shows structural scaling only — rerun on a real slice for numbers
        audio_per_chip = b * g * window_s / (ms / 1e3) / n_dev
        print(f"{shape:>12} {loss:>10.5f} {'OK' if ok else 'MISMATCH':>8} "
              f"{ms:>8.1f} {audio_per_chip:>14.1f}  {collective_counts(hlo) or '-'}")
        if not ok:
            return 1
    print("scaling check passed: identical loss on every mesh")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
