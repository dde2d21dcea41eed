"""Auto-selection of the fast (Pallas) kernels behind a parity gate.

``ModelConfig.use_pallas_dsp`` / ``use_pallas_pooling`` are tri-state:
True/False = explicit user choice (always honored); None = auto. Auto
resolves to True only when (a) the default JAX backend is TPU and (b) a
one-batch numerical self-check passes — the Pallas kernel and the XLA
reference path are run on the same random inputs (forward AND backward for
the pooling kernel, which carries a custom VJP) and must agree to tight
tolerance. Any mismatch or kernel failure falls back to the XLA path with a
logged warning, so a Pallas regression can never silently corrupt training.

Resolution happens at jit-construction sites (train step, embedding jit),
NOT at config creation: checkpoints persist the tri-state value, so a model
trained on TPU with auto-Pallas loads cleanly on CPU (where auto resolves
to False).

Decisions are cached per-process and reported in ``decisions()`` (surfaced
by bench.py).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import numpy as np

from ..config import ExperimentConfig, FeatureConfig, ModelConfig

log = logging.getLogger(__name__)

_DECISIONS: Dict[str, str] = {}
_GATE_CACHE: Dict[tuple, bool] = {}


def decisions() -> Dict[str, str]:
    """How each auto flag resolved this process (for bench/debug output)."""
    return dict(_DECISIONS)


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _dsp_parity_ok(feat_cfg: FeatureConfig) -> bool:
    key = ("dsp", dataclasses.astuple(feat_cfg))
    if key in _GATE_CACHE:
        return _GATE_CACHE[key]
    ok = False
    try:
        import jax

        from ..dsp.features import log_mel_spectrogram
        from ..ops.logmel_pallas import log_mel_spectrogram_pallas

        waves = jax.numpy.asarray(
            np.random.default_rng(0).standard_normal((4, feat_cfg.sample_rate), np.float32)
            * 0.1
        )
        ref = np.asarray(jax.jit(lambda w: log_mel_spectrogram(w, feat_cfg))(waves))
        fast = np.asarray(
            jax.jit(lambda w: log_mel_spectrogram_pallas(w, feat_cfg))(waves)
        )
        # tolerance matches the kernel's measured accuracy class (~9e-6 max
        # abs diff vs the XLA path, docs/PERFORMANCE.md) with ~10x margin: a
        # kernel regression of even one accuracy class must NOT auto-enable.
        # rtol stays tiny — log-mel values are O(10), so a loose rtol would
        # quietly dominate the atol and re-widen the gate
        ok = ref.shape == fast.shape and bool(
            np.allclose(ref, fast, atol=1e-4, rtol=1e-5)
        )
        if not ok:
            log.warning(
                "pallas DSP parity self-check FAILED (max diff %.3g) — "
                "falling back to the XLA log-mel path",
                float(np.max(np.abs(ref - fast))) if ref.shape == fast.shape else float("nan"),
            )
    except Exception as e:  # kernel build/launch failure => fall back
        log.warning("pallas DSP self-check errored (%s) — using the XLA path", e)
    _GATE_CACHE[key] = ok
    return ok


def _pooling_parity_ok(mcfg: ModelConfig) -> bool:
    key = ("pool", mcfg.heads_number, mcfg.mha_dk_is_heads)
    if key in _GATE_CACHE:
        return _GATE_CACHE[key]
    ok = False
    try:
        import jax
        import jax.numpy as jnp

        from ..models.poolings import mha_pool

        heads, d_h = mcfg.heads_number, 16
        d = heads * d_h
        rng = np.random.default_rng(1)
        ht = jnp.asarray(rng.standard_normal((4, 96, d)).astype(np.float32))
        params = {"query": jnp.asarray(rng.standard_normal((d_h, heads)).astype(np.float32))}
        lengths = jnp.asarray([96, 50, 17, 96], jnp.int32)
        base = dataclasses.replace(mcfg, use_pallas_pooling=False)
        fast = dataclasses.replace(mcfg, use_pallas_pooling=True)

        def pooled_sum(cfg_v, h):
            return jnp.sum(mha_pool(params, h, lengths, cfg_v)[0] ** 2)

        ref_v, ref_g = jax.value_and_grad(lambda h: pooled_sum(base, h))(ht)
        fast_v, fast_g = jax.value_and_grad(lambda h: pooled_sum(fast, h))(ht)
        ok = bool(
            np.allclose(float(ref_v), float(fast_v), rtol=1e-4)
            and np.allclose(np.asarray(ref_g), np.asarray(fast_g), atol=1e-4, rtol=1e-4)
        )
        if not ok:
            log.warning(
                "pallas pooling parity self-check FAILED — "
                "falling back to the XLA pooling path"
            )
    except Exception as e:
        log.warning("pallas pooling self-check errored (%s) — using the XLA path", e)
    _GATE_CACHE[key] = ok
    return ok


def resolve_model_kernels(
    mcfg: ModelConfig,
    feat_cfg: Optional[FeatureConfig] = None,
    need_dsp: bool = True,
) -> ModelConfig:
    """Concrete use_pallas_* flags for this process's backend (see module doc).

    ``need_dsp=False`` marks jit sites that never run the on-device DSP
    (feature-mode training, embedding-from-features): the DSP flag resolves
    to False without compiling/executing the Pallas log-mel gate — the gate
    is real device work, and on relayed backends every avoidable first-call
    is one less chance to hit the first-call wedge.
    """
    dsp, pool = mcfg.use_pallas_dsp, mcfg.use_pallas_pooling
    if dsp is None:
        if need_dsp:
            dsp = _on_tpu() and _dsp_parity_ok(feat_cfg or FeatureConfig())
            _DECISIONS["use_pallas_dsp"] = f"auto->{dsp}"
        else:
            dsp = False
            _DECISIONS.setdefault("use_pallas_dsp", "auto->False (DSP unused here)")
    if pool is None:
        pool = _on_tpu() and _pooling_parity_ok(mcfg)
        _DECISIONS["use_pallas_pooling"] = f"auto->{pool}"
    if dsp == mcfg.use_pallas_dsp and pool == mcfg.use_pallas_pooling:
        return mcfg
    return dataclasses.replace(mcfg, use_pallas_dsp=dsp, use_pallas_pooling=pool)


def resolve_fast_kernels(cfg: ExperimentConfig) -> ExperimentConfig:
    """ExperimentConfig with concrete kernel flags (checkpoint configs keep
    the tri-state; call this where jitted programs are built)."""
    # the train step runs the on-device DSP only when batches carry raw
    # PCM; the source-mode decision lives in DataConfig.source_mode() (the
    # same resolver Trainer._load_data branches on)
    resolved = resolve_model_kernels(
        cfg.model, cfg.features, need_dsp=cfg.data.step_sees_waves()
    )
    if resolved is cfg.model:
        return cfg
    return cfg.replace(model=resolved)
