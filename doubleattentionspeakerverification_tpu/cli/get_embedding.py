"""Embedding-inference CLI (reference ``scripts/getEmbeddingExample.py``).

Loads a checkpoint — ours (.npz) or a reference torch ``.chkpt`` (converted
on the fly) — extracts CMN'd log-mel features from a wav and prints the
scoring embedding. Like the reference, the model config embedded in the
checkpoint wins (``getEmbeddingExample.py:27-28``), and inference
normalization is CMN regardless of the training setting
(``featureExtractor.py:25-33``) unless overridden.
"""

from __future__ import annotations

import argparse


import numpy as np

from ..config import ExperimentConfig, FeatureConfig
from ..data.wav import read_wav
from ..dsp.features import extract_normalized
from ..models.classifier import get_embedding


def load_model(checkpoint_path: str):
    """Returns (params, model_state, ExperimentConfig)."""
    if checkpoint_path.endswith((".chkpt", ".pt", ".pth")):
        from ..utils.torch_import import load_torch_checkpoint

        params, state, cfg, _epoch, _step = load_torch_checkpoint(checkpoint_path)
        return params, state, cfg
    from ..utils.checkpoint import load_train_state_any

    state, _meta, cfg = load_train_state_any(checkpoint_path)
    return state.params, state.model_state, cfg


def embed_wav(audio_path: str, params, model_state, cfg: ExperimentConfig,
              normalization: str = "cmn") -> np.ndarray:
    wave, sr = read_wav(audio_path)
    if sr == cfg.features.sample_rate:
        feat_cfg = cfg.features
    else:
        import dataclasses

        # keep every configured front-end constant; only the rate (and the
        # ms-denominated win/hop) follows the audio
        feat_cfg = dataclasses.replace(cfg.features, sample_rate=sr, fmax=None)
    feats = extract_normalized(wave.astype(np.float32), feat_cfg, normalization)
    from ..utils.kernel_auto import resolve_model_kernels

    emb = get_embedding(
        params, model_state, np.asarray(feats)[None], None,
        resolve_model_kernels(cfg.model, cfg.features, need_dsp=False),
    )
    return np.asarray(emb)[0]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Print the speaker embedding of one audio file.")
    parser.add_argument("--audioPath", type=str, required=True)
    parser.add_argument("--modelCheckpoint", type=str, required=True)
    parser.add_argument("--normalization", type=str, default="cmn", choices=["cmn", "cmvn"])
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "int8", "int8_static"],
                        help="int8 conv encoder (same schemes as serve/"
                             "score_trials; embeddings cosine-match fp to "
                             "~1e-3 — prefer fp for parity checks)")
    params = parser.parse_args(argv)

    model_params, model_state, cfg = load_model(params.modelCheckpoint)
    if params.quantize != "none":
        from ..api import SpeakerEmbeddingModel

        model = SpeakerEmbeddingModel(
            model_params, model_state, cfg, params.normalization,
            quantize=params.quantize,
        )
        emb = model.embed_wav(params.audioPath)
    else:
        emb = embed_wav(params.audioPath, model_params, model_state, cfg,
                        params.normalization)
    np.set_printoptions(precision=6, suppress=False)
    print(emb)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
