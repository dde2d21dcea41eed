"""Auto-selection of the wav training source path.

``--data_source wav`` alone must pick the fastest concrete mode for the
host it runs on (the reference leaves this to the user via its manual
offline pipeline, ``scripts/featureExtractor.py:35-43``): the one-shot host
probe (cores + free RAM) routes plain wav mode to the compute-once feature
cache / host DSP / device DSP, explicit flags always win, and the decision
is made in exactly one place (``DataConfig.source_mode``) shared by the
loader and the kernel resolver.
"""

import numpy as np

import doubleattentionspeakerverification_tpu.config as config_mod
from doubleattentionspeakerverification_tpu.config import (
    DataConfig,
    _auto_wav_mode_from,
)


class TestAutoDecision:
    def test_ram_available_prefers_cache(self):
        mode, cache_mb, reason = _auto_wav_mode_from(2, 16000.0)
        assert mode == "cache"
        assert cache_mb == 3200.0  # 20% of free RAM
        assert "cache" in reason

    def test_cache_budget_capped(self):
        mode, cache_mb, _ = _auto_wav_mode_from(96, 1_000_000.0)
        assert mode == "cache"
        assert cache_mb == 4096.0

    def test_low_ram_few_cores_host_dsp(self):
        mode, cache_mb, _ = _auto_wav_mode_from(2, 500.0)
        assert mode == "host_dsp"
        assert cache_mb == 0.0

    def test_low_ram_many_cores_pcm(self):
        mode, _, _ = _auto_wav_mode_from(16, 500.0)
        assert mode == "pcm"


class TestSourceModeResolution:
    def test_explicit_flags_beat_auto(self):
        d = DataConfig(source="wav", wav_mode="auto", host_dsp=True)
        assert d.source_mode() == "wav_host_dsp"
        d = DataConfig(source="wav", wav_mode="auto", train_feature_cache_mb=64.0)
        assert d.source_mode() == "wav_cache"
        assert d.effective_train_cache_mb() == 64.0

    def test_legacy_default_is_pcm(self):
        assert DataConfig(source="wav").source_mode() == "wav_pcm"

    def test_named_modes(self):
        assert DataConfig(source="wav", wav_mode="pcm").source_mode() == "wav_pcm"
        assert (
            DataConfig(source="wav", wav_mode="host_dsp").source_mode()
            == "wav_host_dsp"
        )
        assert DataConfig(source="wav", wav_mode="cache").source_mode() == "wav_cache"

    def test_auto_uses_host_probe(self, monkeypatch):
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 16000.0))
        d = DataConfig(source="wav", wav_mode="auto")
        assert d.source_mode() == "wav_cache"
        assert d.effective_train_cache_mb() == 3200.0
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 100.0))
        assert d.source_mode() == "wav_host_dsp"
        assert d.effective_train_cache_mb() == 0.0

    def test_named_cache_without_budget_gets_default(self, monkeypatch):
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (4, 100.0))
        d = DataConfig(source="wav", wav_mode="cache")
        # probe offers no budget (low RAM): the fallback must scale with the
        # RAM that host actually has, not hand the starved host a flat 512 MB
        assert d.effective_train_cache_mb() == 64.0
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (4, 1000.0))
        assert d.effective_train_cache_mb() == 200.0
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (4, 0.0))
        assert d.effective_train_cache_mb() == 64.0

    def test_pin_overrides_local_probe(self, monkeypatch):
        # multi-host: the coordinator broadcast pins (mode, budget) for every
        # consumer, regardless of what this host's own probe would say
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 100.0))
        d = DataConfig(source="wav", wav_mode="auto")
        assert d.source_mode() == "wav_host_dsp"
        config_mod.pin_auto_wav_mode("cache", 777.0, "coordinator broadcast")
        try:
            assert d.source_mode() == "wav_cache"
            assert d.effective_train_cache_mb() == 777.0
            assert config_mod.auto_wav_mode()[2] == "coordinator broadcast"
        finally:
            config_mod._AUTO_WAV_MODE_PIN = None

    def test_host_probe_env_override(self, monkeypatch):
        monkeypatch.setenv("DMHA_HOST_PROBE", "3,4321.5")
        config_mod._host_probe.cache_clear()
        try:
            assert config_mod._host_probe() == (3, 4321.5)
        finally:
            config_mod._host_probe.cache_clear()

    def test_non_wav_source_unaffected(self):
        d = DataConfig(source="features", wav_mode="auto")
        assert d.source_mode() == "features"
        assert d.effective_train_cache_mb() == 0.0

    def test_kernel_resolver_sees_same_modality(self, monkeypatch):
        # auto->cache means the step sees features: the resolver must not
        # compile the on-device DSP into the train step
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 16000.0))
        assert not DataConfig(source="wav", wav_mode="auto").step_sees_waves()
        monkeypatch.setattr(config_mod, "_host_probe", lambda: (16, 100.0))
        assert DataConfig(source="wav", wav_mode="auto").step_sees_waves()


def test_cli_defaults_to_auto():
    from doubleattentionspeakerverification_tpu.cli.train import make_parser

    assert make_parser().get_default("wav_mode") == "auto"


def test_working_set_estimator(tmp_path):
    from test_feature_cache import _make_wavs

    from doubleattentionspeakerverification_tpu.data.feature_cache import (
        estimate_feature_working_set_mb,
    )

    root = tmp_path / "wavs"
    lines = _make_wavs(root)
    paths = [ln.split()[0] for ln in lines]
    import os

    actual_mb = sum(
        os.path.getsize(root / f"{p}.wav") for p in paths
    ) / 1e6
    est = estimate_feature_working_set_mb(str(root), paths)
    # uniform sizes here, so the strided sample is near-exact
    assert abs(est - actual_mb) / actual_mb < 0.05
    assert estimate_feature_working_set_mb(str(root), []) == 0.0


def test_trainer_demotes_thrashing_auto_cache(tmp_path, monkeypatch):
    """Auto-selected cache whose budget can't hold the corpus falls back to
    per-window host DSP (and says why) instead of LRU-thrashing full-
    utterance DSP recomputes."""
    import doubleattentionspeakerverification_tpu.data.feature_cache as fc_mod
    from test_feature_cache import _make_wavs

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.data.dataset import HostDspWavSource
    from doubleattentionspeakerverification_tpu.training.trainer import Trainer

    monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 10000.0))
    # pretend the corpus is far bigger than the 2000 MB budget
    monkeypatch.setattr(
        fc_mod, "estimate_feature_working_set_mb", lambda d, p: 50000.0
    )
    root = tmp_path / "wavs"
    lines = _make_wavs(root)
    labels = tmp_path / "labels.ndx"
    labels.write_text("".join(lines))

    class _Rec:
        def __init__(self):
            self.events = []

        def log(self, e, **f):
            self.events.append((e, f))

        def close(self):
            pass

    cfg = ExperimentConfig(
        out_dir=str(tmp_path / "out"),
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
        train=TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=1),
        data=DataConfig(
            train_data_dir=str(root),
            train_labels_path=str(labels),
            source="wav",
            wav_mode="auto",
        ),
    )
    rec = _Rec()
    trainer = Trainer(cfg, logger=rec)
    assert isinstance(trainer.loader.source, HostDspWavSource)
    decisions = [f for e, f in rec.events if e == "source_mode"]
    assert decisions[0]["mode"] == "wav_host_dsp"
    assert "demoted" in decisions[0]["reason"]
    # a demoted run uses no cache: the log must not claim a budget
    assert decisions[0]["cache_mb"] == 0.0


def test_trainer_auto_selects_cached_source(tmp_path, monkeypatch):
    """End to end: plain wav source + auto on a RAM-rich host builds the
    compute-once cached source with the probe's budget, and logs why."""
    from test_feature_cache import _make_wavs

    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.data.feature_cache import (
        CachedDspWavSource,
    )
    from doubleattentionspeakerverification_tpu.training.trainer import Trainer

    monkeypatch.setattr(config_mod, "_host_probe", lambda: (2, 10000.0))
    root = tmp_path / "wavs"
    lines = _make_wavs(root)
    labels = tmp_path / "labels.ndx"
    labels.write_text("".join(lines))

    class _Rec:
        events = []

        def log(self, event, **fields):
            self.events.append((event, fields))

        def close(self):
            pass

    cfg = ExperimentConfig(
        out_dir=str(tmp_path / "out"),
        model=ModelConfig(kernel_size=16, heads_number=4, embedding_size=16, num_spkrs=2),
        train=TrainConfig(window_size=0.5, batch_size=2, gradient_accumulation=1),
        data=DataConfig(
            train_data_dir=str(root),
            train_labels_path=str(labels),
            source="wav",
            wav_mode="auto",
        ),
    )
    rec = _Rec()
    trainer = Trainer(cfg, logger=rec)
    assert isinstance(trainer.loader.source, CachedDspWavSource)
    assert trainer.loader.is_wave is False
    decisions = [f for e, f in rec.events if e == "source_mode"]
    assert decisions and decisions[0]["mode"] == "wav_cache"
    assert decisions[0]["cache_mb"] == 2000.0  # 20% of 10 GB
    assert "cache" in decisions[0]["reason"]
