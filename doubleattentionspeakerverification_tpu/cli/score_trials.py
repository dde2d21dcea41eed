"""Batch trial-scoring CLI.

The reference only scores trials inside the training loop's validation
(``scripts/train.py:117-149``); there is no standalone verification tool. For
production use this CLI scores a trial list against a checkpoint: unique
utterances embedded once (length-bucketed batches), cosine per pair, one
``utt1 utt2 score`` line per trial, optional EER/minDCF summary when client
and impostor lists are given, and optional AS-Norm/S-norm score
normalization against a cohort (``--cohort`` id list and/or
``--cohort_embeddings`` store, ``--snorm_topk``; see ``evaluation/snorm.py``).

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
    p.add_argument("--long_audio", type=str, default="chunk",
                   choices=["chunk", "pad"],
                   help="beyond ~2x the largest length bucket (160 s): "
                        "'chunk' (default) embeds largest-bucket chunks and "
                        "duration-weights their unit-embedding centroid — "
                        "bounded compiles/memory for hour-long audio; 'pad' "
                        "keeps the reference's unbounded full-length "
                        "semantics (one fresh XLA compile per distinct "
                        "rounded length)")
    p.add_argument("--long_audio_max_frames", type=int, default=None,
                   help="override the chunking cap in frames "
                        "(default 2x the largest bucket = 16000 = 160 s)")
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "int8", "int8_static"],
                   help="'int8': int8 conv encoder with dynamic activation "
                        "scales (1.47x embed throughput on v5e); "
                        "'int8_static': scales calibrated on the first batch "
                        "and baked in — fully fused int8 program, faster "
                        "still. Scores cosine-match fp to ~1e-3 — prefer fp "
                        "when reporting parity EERs")
    p.add_argument("--calibration_wav", type=str, default=None,
                   help="int8_static only: calibrate the baked scales on this "
                        "wav file (path, not an utt id) before scoring "
                        "instead of on the first scoring batch")
    p.add_argument("--int8_scales", type=str, default=None,
                   help="int8_static only: persist/load baked scales at this "
                        ".npz (loaded if present — deterministic across "
                        "runs; else written after calibration)")
    p.add_argument("--save_embeddings", type=str, default=None,
                   help="write every embedding computed during scoring to "
                        "this .npz (embedding store; reusable across runs)")
    p.add_argument("--load_embeddings", type=str, default=None,
                   help="seed the embedding cache from a previous "
                        "--save_embeddings store; only utterances missing "
                        "from it are run through the model")
    p.add_argument("--cohort", type=str, default=None,
                   help="AS-Norm cohort: file listing cohort utterance ids "
                        "(one per line, embedded from --data_dir). Scores "
                        "are adaptively normalized against cohort statistics")
    p.add_argument("--cohort_embeddings", type=str, default=None,
                   help="AS-Norm cohort as a precomputed embedding store "
                        "(.npz from --save_embeddings)")
    p.add_argument("--snorm_topk", type=int, default=0,
                   help="AS-Norm top-K cohort neighbours per utterance "
                        "(0 = full cohort, i.e. plain S-norm)")
    p.add_argument("--plda", type=str, default=None,
                   help="score with a PLDA backend (.npz from train_plda) "
                        "instead of AS-Norm; LLR scores replace the cosine "
                        "column (raw cosine kept as raw=)")
    args = p.parse_args(argv)
    if args.plda and (args.cohort or args.cohort_embeddings):
        p.error("--plda and --cohort/--cohort_embeddings are exclusive "
                "(PLDA LLRs are already calibrated against the model; "
                "normalize one backend at a time)")

    if (args.clients is None) != (args.impostors is None):
        p.error("--clients and --impostors must be given together")
    if args.trials is None and args.clients is None:
        p.error("give --trials, or --clients/--impostors")

    params, state, cfg = load_model(args.modelCheckpoint)
    if args.data_source == "wav":
        loader = wav_feature_loader(args.data_dir, cfg.features, args.normalization)
    else:
        loader = pickle_feature_loader(args.data_dir, args.normalization)
    if args.quantize != "int8_static" and (args.calibration_wav or args.int8_scales):
        p.error("--calibration_wav/--int8_scales require --quantize int8_static")
    embed_fn = None
    if args.quantize in ("int8", "int8_static"):
        from ..models.quantized import make_int8_embed_fn

        embed_fn = make_int8_embed_fn(
            params, cfg.model,
            scheme="static" if args.quantize == "int8_static" else "dynamic",
            scales_path=args.int8_scales,
        )
        if args.calibration_wav and embed_fn.calibration_state() != "static":
            import dataclasses

            from ..data.wav import read_wav
            from ..dsp.features import extract_normalized

            wave, sr = read_wav(args.calibration_wav)
            fcfg = cfg.features
            if sr != fcfg.sample_rate:
                # keep every configured front-end constant; only the rate
                # (and the ms-denominated win/hop) follows the audio
                fcfg = dataclasses.replace(fcfg, sample_rate=sr, fmax=None)
            feats = np.asarray(extract_normalized(
                wave.astype(np.float32), fcfg, args.normalization))
            calib_state = embed_fn.calibrate(params, state, feats[None], None)
            print(f"int8_static calibration: {calib_state}", file=sys.stderr)
    extractor = EmbeddingExtractor(
        params, state, cfg.model, loader, batch_size=args.batch_size,
        embed_fn=embed_fn, long_audio=args.long_audio,
        max_frames=args.long_audio_max_frames,
    )
    if args.load_embeddings:
        from ..evaluation.embeddings import load_embeddings

        extractor.cache.update(
            load_embeddings(args.load_embeddings, expect_quantize=args.quantize)
        )

    # AS-Norm cohort (optional): embeddings from a precomputed store and/or
    # an id list embedded through the same extractor (so cohort utterances
    # share the cache/batching with trial utterances)
    cohort = None
    if args.cohort or args.cohort_embeddings:
        rows = []
        if args.cohort_embeddings:
            from ..evaluation.embeddings import load_embeddings

            rows.extend(
                load_embeddings(
                    args.cohort_embeddings, expect_quantize=args.quantize
                ).values()
            )
        if args.cohort:
            with open(args.cohort) as f:
                ids = [ln.strip().split()[0] for ln in f if ln.strip()]
            cache = extractor.extract(ids)
            rows.extend(cache[u] for u in ids)
        cohort = np.stack(rows)

    plda = None
    if args.plda:
        from ..evaluation.plda import PLDA

        plda = PLDA.load(args.plda)

    def trial_scores(trials):
        """Raw cosine scores, plus AS-Norm or PLDA-LLR scores when a cohort
        or PLDA model is given (both are unbounded, so the reference's
        -1..1 threshold-sweep EER only applies to the raw column)."""
        raw = score_trials(extractor, trials)
        if plda is not None:
            return raw, plda.score_trials(trials, extractor.cache)
        if cohort is None:
            return raw, None
        from ..evaluation.snorm import asnorm_trial_scores

        return raw, asnorm_trial_scores(
            trials, extractor.cache, cohort, args.snorm_topk
        )

    def write(trials, raw, snormed, label=""):
        for i, (a, b) in enumerate(trials):
            cols = [a, b, f"{(raw if snormed is None else snormed)[i]:.6f}"]
            if snormed is not None:
                cols.append(f"raw={raw[i]:.6f}")
            if label:
                cols.append(label)
            out.write(" ".join(cols) + "\n")

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        summary = {}
        if args.trials:
            trials = load_trials(args.trials)
            raw, snormed = trial_scores(trials)
            write(trials, raw, snormed)
            summary["n_trials"] = len(trials)
        if args.clients and args.impostors:
            cl_trials = load_trials(args.clients)
            im_trials = load_trials(args.impostors)
            cl_raw, cl_sn = trial_scores(cl_trials)
            im_raw, im_sn = trial_scores(im_trials)
            write(cl_trials, cl_raw, cl_sn, "target")
            write(im_trials, im_raw, im_sn, "nontarget")
            # same metric assembly as training validation (embeddings cached,
            # so this recomputes only the cosines)
            summary.update(validate_eer(extractor, cl_trials, im_trials))
            summary.update(n_clients=len(cl_trials), n_impostors=len(im_trials))
            if cl_sn is not None:
                from ..evaluation.eer import eer_exact, min_dcf

                backend = "plda" if plda is not None else "snorm"
                summary.update({
                    f"eer_exact_{backend}": eer_exact(cl_sn, im_sn),
                    f"min_dcf_{backend}": min_dcf(cl_sn, im_sn),
                })
                if cohort is not None:
                    summary.update(cohort_size=len(cohort), snorm_topk=args.snorm_topk)
        if args.save_embeddings:
            from ..evaluation.embeddings import save_embeddings

            save_embeddings(args.save_embeddings, extractor.cache,
                            quantize=args.quantize)
            summary["embeddings_saved"] = len(extractor.cache)
        print(" ".join(f"{k}={v}" for k, v in summary.items()), file=sys.stderr)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
