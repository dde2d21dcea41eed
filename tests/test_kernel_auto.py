"""Auto-selection of the Pallas kernels (``utils/kernel_auto.py``).

The tri-state flags must: honor explicit choices, resolve to off on
non-TPU backends, resolve to on when the backend reports TPU AND the parity
self-check passes, and fall back (with no exception) when the fast kernel
disagrees with the XLA path.
"""

import dataclasses

import numpy as np
import pytest

from doubleattentionspeakerverification_tpu.config import (
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
)
from doubleattentionspeakerverification_tpu.utils import kernel_auto


@pytest.fixture(autouse=True)
def _fresh_gate_cache():
    kernel_auto._GATE_CACHE.clear()
    kernel_auto._DECISIONS.clear()
    yield
    kernel_auto._GATE_CACHE.clear()


def test_auto_resolves_off_on_cpu():
    mcfg = ModelConfig(kernel_size=16, heads_number=4)
    assert mcfg.use_pallas_dsp is None and mcfg.use_pallas_pooling is None
    r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r.use_pallas_dsp is False and r.use_pallas_pooling is False
    assert kernel_auto.decisions() == {
        "use_pallas_dsp": "auto->False",
        "use_pallas_pooling": "auto->False",
    }


def test_explicit_choice_is_honored():
    mcfg = ModelConfig(kernel_size=16, heads_number=4,
                       use_pallas_dsp=True, use_pallas_pooling=False)
    r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r is mcfg  # untouched, no gate runs
    assert kernel_auto.decisions() == {}


def test_auto_enables_when_gates_pass(monkeypatch):
    monkeypatch.setattr(kernel_auto, "_on_tpu", lambda: True)
    from jax.experimental.pallas import tpu as pltpu

    mcfg = ModelConfig(kernel_size=16, heads_number=4)
    with pltpu.force_tpu_interpret_mode():
        r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r.use_pallas_pooling is True
    assert r.use_pallas_dsp is True


def test_gate_failure_falls_back(monkeypatch):
    monkeypatch.setattr(kernel_auto, "_on_tpu", lambda: True)
    from doubleattentionspeakerverification_tpu.ops import pooling_pallas

    def broken(params, ht, lengths, heads, dk_is_heads):
        import jax.numpy as jnp

        b, _, d = ht.shape
        return jnp.ones((b, heads, d // heads), ht.dtype)  # wrong values

    monkeypatch.setattr(pooling_pallas, "mha_pool_pallas", broken)
    from jax.experimental.pallas import tpu as pltpu

    mcfg = ModelConfig(kernel_size=16, heads_number=4)
    with pltpu.force_tpu_interpret_mode():
        r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r.use_pallas_pooling is False  # mismatch detected, XLA fallback
    assert kernel_auto.decisions()["use_pallas_pooling"] == "auto->False"


def test_dsp_gate_rejects_accuracy_class_regression(monkeypatch):
    """The DSP gate tolerance must sit at the kernel's accuracy class
    (~9e-6 measured): a kernel whose error grows ~50x must NOT auto-enable,
    even though it would still be 'roughly right' (5e-4)."""
    monkeypatch.setattr(kernel_auto, "_on_tpu", lambda: True)
    from doubleattentionspeakerverification_tpu.ops import logmel_pallas

    real = logmel_pallas.log_mel_spectrogram_pallas

    def degraded(waves, cfg):
        # ~50x the kernel's real error (9e-6) — would have slipped through
        # the old 1e-3 atol / 1e-4-rtol-on-O(10)-values gate
        return real(waves, cfg) + 5e-4

    monkeypatch.setattr(logmel_pallas, "log_mel_spectrogram_pallas", degraded)
    from jax.experimental.pallas import tpu as pltpu

    mcfg = ModelConfig(kernel_size=16, heads_number=4, use_pallas_pooling=False)
    with pltpu.force_tpu_interpret_mode():
        r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r.use_pallas_dsp is False
    assert kernel_auto.decisions()["use_pallas_dsp"] == "auto->False"


def test_pooling_gate_passes_textbook_dk_scaling(monkeypatch):
    """The gate must validate the Pallas pooling under BOTH d_k conventions
    (the kernel takes dk_is_heads through; a bug in the non-default branch
    must be caught by the gate, not by training)."""
    monkeypatch.setattr(kernel_auto, "_on_tpu", lambda: True)
    from jax.experimental.pallas import tpu as pltpu

    mcfg = ModelConfig(kernel_size=16, heads_number=4, mha_dk_is_heads=False,
                       use_pallas_dsp=False)
    with pltpu.force_tpu_interpret_mode():
        r = kernel_auto.resolve_model_kernels(mcfg, FeatureConfig())
    assert r.use_pallas_pooling is True
    # and the gate cache keys on the toggle: a second resolve with the
    # default convention runs its own gate rather than reusing this verdict
    assert ("pool", 4, False) in kernel_auto._GATE_CACHE


def test_need_dsp_follows_source_mode():
    """resolve_fast_kernels' step-modality predicate is DataConfig.
    step_sees_waves() — the same resolver Trainer._load_data branches on."""
    from doubleattentionspeakerverification_tpu.config import DataConfig

    cases = [
        (DataConfig(source="features"), "features", False),
        (DataConfig(source="wav"), "wav_pcm", True),
        (DataConfig(source="wav", host_dsp=True), "wav_host_dsp", False),
        (DataConfig(source="wav", train_feature_cache_mb=64), "wav_cache", False),
        (DataConfig(source="wav", host_dsp=True, train_feature_cache_dir="/tmp/x"),
         "wav_cache", False),
    ]
    for dcfg, mode, sees_waves in cases:
        assert dcfg.source_mode() == mode
        assert dcfg.step_sees_waves() is sees_waves


def test_tristate_survives_config_roundtrip():
    cfg = ExperimentConfig(model=ModelConfig(kernel_size=16, heads_number=4))
    rt = ExperimentConfig.from_json(cfg.to_json())
    assert rt.model.use_pallas_dsp is None and rt.model.use_pallas_pooling is None
    explicit = cfg.replace(
        model=dataclasses.replace(cfg.model, use_pallas_dsp=False, use_pallas_pooling=True)
    )
    rt2 = ExperimentConfig.from_json(explicit.to_json())
    assert rt2.model.use_pallas_dsp is False and rt2.model.use_pallas_pooling is True


def test_resolution_is_jit_site_local_not_baked():
    """Trainer must persist the tri-state config (portable checkpoints) while
    its compiled programs use concrete flags."""
    from doubleattentionspeakerverification_tpu.training.step import make_train_step

    cfg = ExperimentConfig(
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2)
    )
    make_train_step(cfg, donate=False)  # resolves internally
    assert cfg.model.use_pallas_dsp is None  # caller's config untouched
