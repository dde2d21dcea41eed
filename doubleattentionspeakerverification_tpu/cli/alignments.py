"""Attention-alignment introspection CLI.

The reference exposes ``DoubleMHA.getAlignments`` /
``MultiHeadAttention.getAlignments`` (``poolings.py:95-101,119-123``) as a
programmatic introspection hook but ships no entry point for it. Here the
hook gets a CLI: print (or save as .npz) the time-attention weights — and
for DoubleMHA also the head-attention weights — of one audio file under any
checkpoint (ours ``.npz``/``.orbax`` or a reference ``.chkpt``).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import ExperimentConfig, FeatureConfig
from ..data.wav import read_wav
from ..dsp.features import extract_normalized
from ..models.classifier import get_alignments
from .get_embedding import load_model


def alignments_for_wav(audio_path: str, params, model_state, cfg: ExperimentConfig,
                       normalization: str = "cmn"):
    """Returns (time_alignment, head_alignment | None).

    time_alignment: (T', H) softmax weights over encoder frames (H=1 for
    single-head 'Attention' pooling); head_alignment: (H,) weights over
    heads (DoubleMHA only).
    """
    wave, sr = read_wav(audio_path)
    feat_cfg = cfg.features if sr == cfg.features.sample_rate else FeatureConfig(sample_rate=sr)
    feats = extract_normalized(wave.astype(np.float32), feat_cfg, normalization)
    out = get_alignments(params, model_state, np.asarray(feats)[None], None, cfg.model)
    if isinstance(out, tuple):
        time_w, head_w = out
        return np.asarray(time_w)[0], np.asarray(head_w)[0]
    return np.asarray(out)[0], None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Print the pooling attention alignments of one audio file."
    )
    parser.add_argument("--audioPath", type=str, required=True)
    parser.add_argument("--modelCheckpoint", type=str, required=True)
    parser.add_argument("--normalization", type=str, default="cmn", choices=["cmn", "cmvn"])
    parser.add_argument("--output", type=str, default="",
                        help="write alignments to this .npz instead of printing "
                             "(keys: time_alignment, head_alignment)")
    params = parser.parse_args(argv)

    model_params, model_state, cfg = load_model(params.modelCheckpoint)
    time_w, head_w = alignments_for_wav(
        params.audioPath, model_params, model_state, cfg, params.normalization
    )
    if params.output:
        payload = {"time_alignment": time_w}
        if head_w is not None:
            payload["head_alignment"] = head_w
        np.savez(params.output, **payload)
        print(f"wrote {params.output}: time_alignment {time_w.shape}"
              + (f", head_alignment {head_w.shape}" if head_w is not None else ""))
        return 0
    np.set_printoptions(precision=6, suppress=True)
    print("time_alignment", time_w.shape)
    print(time_w)
    if head_w is not None:
        print("head_alignment", head_w.shape)
        print(head_w)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
