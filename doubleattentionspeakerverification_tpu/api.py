"""High-level inference API.

The reference's inference surface is a script (``getEmbeddingExample.py``);
this is the library-first equivalent: load once, embed/score many.

    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel

    model = SpeakerEmbeddingModel.from_checkpoint("run1/..._best_1234.npz")
    emb = model.embed_wav("a.wav")
    sim = model.score_wavs("a.wav", "b.wav")   # cosine in [-1, 1]
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from .config import ExperimentConfig
from .data.wav import read_wav
from .dsp.features import extract_normalized
from .evaluation.eer import cosine_scores


class SpeakerEmbeddingModel:
    def __init__(self, params, model_state, cfg: ExperimentConfig,
                 normalization: str = "cmn", quantize: str = "none",
                 quantize_scales_path: Optional[str] = None):
        import jax

        from .models.classifier import get_embedding

        self.params = params
        self.model_state = model_state
        self.cfg = cfg
        self.normalization = normalization
        self.quantize = quantize
        if quantize in ("int8", "int8_static"):
            # int8 conv stack (models/quantized.py): weights quantized once,
            # tail stays fp. 'int8' = dynamic per-forward activation scales;
            # 'int8_static' additionally bakes one-batch-calibrated scales
            # into a fully fused int8 program (first non-degenerate batch =
            # calibration; explicit via calibrate_quantization*; persisted
            # across restarts via quantize_scales_path)
            from .models.quantized import make_int8_embed_fn

            self._embed = make_int8_embed_fn(
                params, cfg.model,
                scheme="static" if quantize == "int8_static" else "dynamic",
                scales_path=quantize_scales_path,
            )
        elif quantize == "none":
            from .utils.kernel_auto import resolve_model_kernels

            self._embed = jax.jit(
                partial(get_embedding, cfg=resolve_model_kernels(
                    cfg.model, cfg.features, need_dsp=False))
            )
        else:
            raise ValueError(f"unknown quantize mode {quantize!r}")

    # --------------------------------------------------------- calibration
    def calibrate_quantization(self, features: np.ndarray,
                               lengths: Optional[np.ndarray] = None) -> str:
        """Explicit ``int8_static`` calibration batch ((T, F) or (B, T, F)
        normalized features). Raises on degenerate input (zeros/silence) or
        when the quantize mode has no calibration; returns the resulting
        state ('static', or 'fallback_dynamic' if the runtime cosine guard
        rejected the baked scales)."""
        calibrate = getattr(self._embed, "calibrate", None)
        if calibrate is None:
            raise ValueError(
                f"quantize mode {self.quantize!r} takes no calibration batch"
            )
        x = features[None] if features.ndim == 2 else features
        return calibrate(self.params, self.model_state, x, lengths)

    def calibrate_quantization_wav(self, path: str) -> str:
        """Calibrate ``int8_static`` scales on one wav file (e.g. serve's
        ``--calibration_wav``) through the same feature path as inference."""
        wave, sr = read_wav(path)
        feats = np.asarray(
            extract_normalized(
                wave.astype(np.float32),
                self._features_cfg_for_rate(sr),
                self.normalization,
            )
        )
        return self.calibrate_quantization(feats)

    def quantize_calibration_state(self) -> str:
        """'none' (fp model), 'dynamic', 'uncalibrated', 'static', or
        'fallback_dynamic'."""
        state_fn = getattr(self._embed, "calibration_state", None)
        return state_fn() if state_fn is not None else "none"

    # ------------------------------------------------------------- loaders
    @classmethod
    def from_checkpoint(cls, path: str, normalization: str = "cmn",
                        quantize: str = "none",
                        quantize_scales_path: Optional[str] = None,
                        ) -> "SpeakerEmbeddingModel":
        """Load ours (.npz) or a reference torch .chkpt."""
        from .cli.get_embedding import load_model

        params, state, cfg = load_model(path)
        return cls(params, state, cfg, normalization, quantize=quantize,
                   quantize_scales_path=quantize_scales_path)

    @classmethod
    def from_random_init(cls, cfg: ExperimentConfig, seed: int = 0,
                         quantize: str = "none") -> "SpeakerEmbeddingModel":
        import jax

        from .models.classifier import init_speaker_classifier

        params, state = init_speaker_classifier(jax.random.PRNGKey(seed), cfg.model)
        return cls(params, state, cfg, quantize=quantize)

    # ------------------------------------------------------------- embed
    def embed_features(self, features: np.ndarray,
                       lengths: Optional[np.ndarray] = None) -> np.ndarray:
        """(T, F) or (B, T, F) normalized log-mel -> (emb,) or (B, emb)."""
        single = features.ndim == 2
        x = features[None] if single else features
        emb = np.asarray(self._embed(self.params, self.model_state, x, lengths))
        return emb[0] if single else emb

    def _features_cfg_for_rate(self, sample_rate: int):
        """The model's configured feature front-end, rate-adjusted: keep
        every configured constant (n_mels, n_fft, pre-emphasis, ...); only
        the rate — and with it the ms-denominated win/hop lengths — follows
        the audio (fmax=None re-derives sr/2). Same rule as the serving
        upload path."""
        cfg = self.cfg.features
        if sample_rate != cfg.sample_rate:
            import dataclasses

            cfg = dataclasses.replace(cfg, sample_rate=sample_rate, fmax=None)
        return cfg

    def embed_wave(self, wave: np.ndarray, sample_rate: int = 16000) -> np.ndarray:
        feats = np.asarray(
            extract_normalized(
                wave.astype(np.float32),
                self._features_cfg_for_rate(sample_rate),
                self.normalization,
            )
        )
        return self.embed_features(feats)

    def embed_wav(self, path: str) -> np.ndarray:
        wave, sr = read_wav(path)
        return self.embed_wave(wave, sr)

    # ------------------------------------------------------------- scoring
    def score(self, emb1: np.ndarray, emb2: np.ndarray) -> float:
        return float(cosine_scores(emb1[None], emb2[None])[0])

    def score_wavs(self, path1: str, path2: str) -> float:
        return self.score(self.embed_wav(path1), self.embed_wav(path2))

    def verify(self, path1: str, path2: str, threshold: float = 0.5) -> bool:
        return self.score_wavs(path1, path2) >= threshold
