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
import json
import os

import jax

from ..config import ExperimentConfig
from ..models.classifier import init_speaker_classifier
from ..training.step import init_train_state
from ..utils.torch_export import save_torch_checkpoint


def load_train_state(checkpoint_path: str):
    """Full TrainState + meta from a .npz or .orbax checkpoint."""
    if checkpoint_path.rstrip("/").endswith(".orbax"):
        from ..utils.orbax_ckpt import load_checkpoint_orbax

        with open(os.path.join(checkpoint_path, "meta.json")) as f:
            meta = json.load(f)
        cfg = ExperimentConfig.from_dict(meta["config"])
        p0, ms0 = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state, meta = load_checkpoint_orbax(checkpoint_path, init_train_state(p0, ms0, cfg))
        return state, meta, cfg
    import numpy as np

    from ..utils.checkpoint import load_checkpoint

    with np.load(checkpoint_path) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode())
    cfg = ExperimentConfig.from_dict(meta["config"])
    p0, ms0 = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state, meta = load_checkpoint(checkpoint_path, init_train_state(p0, ms0, cfg))
    return state, meta, cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Convert a framework checkpoint to a reference torch .chkpt."
    )
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="our .npz file or .orbax directory")
    parser.add_argument("--out", type=str, required=True, help="output .chkpt path")
    parser.add_argument("--no_optimizer", action="store_true",
                        help="skip Adam-moment export (weights + settings only)")
    params = parser.parse_args(argv)

    state, meta, cfg = load_train_state(params.checkpoint)
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
