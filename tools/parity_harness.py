"""Embedding / EER parity harness against a reference-trained checkpoint.

Usage:
  python tools/parity_harness.py --checkpoint model.chkpt \
      --features_dir feats/ --utts list.txt [--clients c.ndx --impostors i.ndx]

Loads a reference torch ``.chkpt`` (``scripts/utils.py:23-40`` layout),
converts it with ``utils.torch_import``, and
  1. if the reference repo + torch are importable: compares our embeddings
     against the torch model's, utterance by utterance (max abs diff);
  2. scores the trial lists with our batched pipeline and, when possible,
     with the reference's per-pair semantics — both EERs printed.

This is the tool a migrating user runs once to confirm their trained model
transfers losslessly.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from doubleattentionspeakerverification_tpu.evaluation.embeddings import (
    EmbeddingExtractor,
    pickle_feature_loader,
    validate_eer,
)
from doubleattentionspeakerverification_tpu.data.manifest import load_trials
from doubleattentionspeakerverification_tpu.utils.torch_import import (
    load_torch_checkpoint,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="reference .chkpt")
    ap.add_argument("--features_dir", required=True)
    ap.add_argument("--utts", required=True, help="file with one utterance id per line")
    ap.add_argument("--clients", default=None)
    ap.add_argument("--impostors", default=None)
    ap.add_argument("--normalization", default="cmn", choices=["cmn", "cmvn"])
    ap.add_argument("--reference_scripts", default="/root/reference/scripts")
    args = ap.parse_args(argv)

    params, state, cfg, epoch, step = load_torch_checkpoint(args.checkpoint)
    print(f"loaded checkpoint: epoch={epoch} step={step} "
          f"model={cfg.model.front_end}/{cfg.model.pooling_method} "
          f"k={cfg.model.kernel_size} H={cfg.model.heads_number}")

    with open(args.utts) as f:
        utts = [ln.strip() for ln in f if ln.strip()]

    loader = pickle_feature_loader(args.features_dir, args.normalization)
    extractor = EmbeddingExtractor(params, state, cfg.model, loader)
    cache = extractor.extract(utts)

    # torch-side comparison when the reference code is importable
    try:
        import torch

        sys.path.insert(0, args.reference_scripts)
        from model import SpeakerClassifier  # reference

        ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        net = SpeakerClassifier(ckpt["settings"], torch.device("cpu"))
        net.load_state_dict(ckpt["model"])
        net.eval()
        worst = 0.0
        for u in utts:
            feats = loader(u)
            with torch.no_grad():
                ref = net.getEmbedding(torch.tensor(feats[None])).numpy()[0]
            diff = float(np.abs(cache[u] - ref).max())
            worst = max(worst, diff)
        print(f"embedding parity over {len(utts)} utterances: max abs diff {worst:.3e}")
    except Exception as e:  # reference not importable here — skip cleanly
        print(f"torch-side comparison skipped ({type(e).__name__}: {e})")

    if args.clients and args.impostors:
        result = validate_eer(
            extractor, load_trials(args.clients), load_trials(args.impostors)
        )
        print(f"EER (reference semantics): {result['eer']}  exact: {result['eer_exact']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
