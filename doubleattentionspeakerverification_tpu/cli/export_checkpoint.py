"""Export one of our checkpoints as a reference-format torch ``.chkpt``.

Completes the interchange story: ``torch_import`` brings reference models
in; this takes models trained here back to the reference repo, where its
unmodified ``getEmbeddingExample.py`` / ``train.py --requeue`` can use them
(``scripts/utils.py:23-40`` file layout).

  python -m doubleattentionspeakerverification_tpu.cli.export_checkpoint \\
      --checkpoint models/run1/..._best_1234.npz --out model.chkpt
"""

from __future__ import annotations

import argparse

from ..utils.checkpoint import load_train_state_any
from ..utils.torch_export import save_torch_checkpoint


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert a framework checkpoint to a reference torch .chkpt."
    )
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="our .npz file or .orbax directory")
    parser.add_argument("--out", type=str, required=True, help="output .chkpt path")
    parser.add_argument("--no_optimizer", action="store_true",
                        help="skip moment export (a fresh, loadable optimizer "
                             "state_dict is still written — the reference's "
                             "requeue loads it unconditionally)")
    params = parser.parse_args(argv)

    state, meta, cfg = load_train_state_any(params.checkpoint)
    save_torch_checkpoint(
        params.out,
        state.params,
        state.model_state,
        cfg,
        opt_state=None if params.no_optimizer else state.opt_state,
        epoch=int(meta.get("epoch", 0)),
        step=int(state.step),
    )
    print(f"wrote {params.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
