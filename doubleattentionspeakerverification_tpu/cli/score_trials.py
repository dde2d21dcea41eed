"""Batch trial-scoring CLI.

The reference only scores trials inside the training loop's validation
(``scripts/train.py:117-149``); there is no standalone verification tool. For
production use this CLI scores a trial list against a checkpoint: unique
utterances embedded once (length-bucketed batches), cosine per pair, one
``utt1 utt2 score`` line per trial, optional EER/minDCF summary when client
and impostor lists are given.

  python -m doubleattentionspeakerverification_tpu.cli.score_trials \
      --modelCheckpoint run1/..._best.npz --data_dir feats/ \
      --trials trials.ndx --output scores.txt
  # or labeled:
  ... --clients clients.ndx --impostors impostors.ndx
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..data.manifest import load_trials
from ..evaluation.embeddings import (
    EmbeddingExtractor,
    pickle_feature_loader,
    score_trials,
    validate_eer,
    wav_feature_loader,
)
from .get_embedding import load_model


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Score speaker-verification trials.")
    p.add_argument("--modelCheckpoint", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--trials", type=str, default=None,
                   help="unlabeled trial list (utt1 utt2 per line)")
    p.add_argument("--clients", type=str, default=None)
    p.add_argument("--impostors", type=str, default=None)
    p.add_argument("--output", type=str, default="-",
                   help="scores file ('-' = stdout)")
    p.add_argument("--data_source", type=str, default="features",
                   choices=["features", "wav"])
    p.add_argument("--normalization", type=str, default="cmn",
                   choices=["cmn", "cmvn"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_embeddings", type=str, default=None,
                   help="write every embedding computed during scoring to "
                        "this .npz (embedding store; reusable across runs)")
    p.add_argument("--load_embeddings", type=str, default=None,
                   help="seed the embedding cache from a previous "
                        "--save_embeddings store; only utterances missing "
                        "from it are run through the model")
    args = p.parse_args(argv)

    if (args.clients is None) != (args.impostors is None):
        p.error("--clients and --impostors must be given together")
    if args.trials is None and args.clients is None:
        p.error("give --trials, or --clients/--impostors")

    params, state, cfg = load_model(args.modelCheckpoint)
    if args.data_source == "wav":
        loader = wav_feature_loader(args.data_dir, cfg.features, args.normalization)
    else:
        loader = pickle_feature_loader(args.data_dir, args.normalization)
    extractor = EmbeddingExtractor(
        params, state, cfg.model, loader, batch_size=args.batch_size
    )
    if args.load_embeddings:
        from ..evaluation.embeddings import load_embeddings

        extractor.cache.update(load_embeddings(args.load_embeddings))

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        summary = {}
        if args.trials:
            trials = load_trials(args.trials)
            scores = score_trials(extractor, trials)
            for (a, b), s in zip(trials, scores):
                out.write(f"{a} {b} {s:.6f}\n")
            summary["n_trials"] = len(trials)
        if args.clients and args.impostors:
            cl_trials = load_trials(args.clients)
            im_trials = load_trials(args.impostors)
            cl = score_trials(extractor, cl_trials)
            im = score_trials(extractor, im_trials)
            for (a, b), s in zip(cl_trials, cl):
                out.write(f"{a} {b} {s:.6f} target\n")
            for (a, b), s in zip(im_trials, im):
                out.write(f"{a} {b} {s:.6f} nontarget\n")
            # same metric assembly as training validation (embeddings cached,
            # so this recomputes only the cosines)
            summary.update(validate_eer(extractor, cl_trials, im_trials))
            summary.update(n_clients=len(cl_trials), n_impostors=len(im_trials))
        if args.save_embeddings:
            from ..evaluation.embeddings import save_embeddings

            save_embeddings(args.save_embeddings, extractor.cache)
            summary["embeddings_saved"] = len(extractor.cache)
        print(" ".join(f"{k}={v}" for k, v in summary.items()), file=sys.stderr)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
