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
