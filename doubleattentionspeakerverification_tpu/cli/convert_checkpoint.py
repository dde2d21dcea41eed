"""Checkpoint backend conversion: .npz <-> .orbax.

Pod-resize migration path (VERDICT r4 #4): single-host runs default to the
single-file ``.npz`` backend, but multi-host training REQUIRES ``orbax``
(npz host-gathers every leaf — impossible once shards live on other
processes' devices, ``training/trainer.py``). This CLI converts either
direction so a run can move between laptops/single chips and pods:

  python -m doubleattentionspeakerverification_tpu.cli.convert_checkpoint \\
      --input run1/model_1200.npz                 # -> run1/model_1200.orbax
  python -m doubleattentionspeakerverification_tpu.cli.convert_checkpoint \\
      --input pod/model_3000.orbax --output run1/model_3000.npz

The full TrainState (params + optimizer moments + step) and the meta dict
(config, epoch, best EER, stopping counter, lr) convert losslessly; resume
from the converted checkpoint continues training exactly
(tests/test_training.py::test_npz_orbax_migration_resume). The reference
has a single torch.save format (``scripts/utils.py:23-40``).
"""

from __future__ import annotations

import argparse
import os


def convert(input_path: str, output_path: str) -> str:
    from ..utils.checkpoint import load_train_state_any, save_checkpoint

    state, meta, _cfg = load_train_state_any(input_path)
    if output_path.rstrip("/").endswith(".orbax"):
        from ..utils.orbax_ckpt import save_checkpoint_orbax

        return save_checkpoint_orbax(output_path, state, meta)
    return save_checkpoint(output_path, state, meta)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Convert a checkpoint between the npz and orbax backends."
    )
    p.add_argument("--input", type=str, required=True,
                   help=".npz file or .orbax directory")
    p.add_argument("--output", type=str, default=None,
                   help="output path; suffix picks the format (.npz/.orbax). "
                        "Default: the input with the other backend's suffix")
    args = p.parse_args(argv)

    src = args.input.rstrip("/")
    out = args.output
    if out is None:
        if src.endswith(".orbax"):
            out = src[: -len(".orbax")] + ".npz"
        elif src.endswith(".npz"):
            out = src[: -len(".npz")] + ".orbax"
        else:
            p.error(f"cannot infer output format from {src!r}; pass --output")
    if os.path.abspath(out) == os.path.abspath(src):
        p.error("input and output are the same path")
    path = convert(src, out)
    print(f"converted {src} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
