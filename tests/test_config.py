import os

import pytest

from doubleattentionspeakerverification_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    count_speakers,
)

from conftest import add_reference_path, reference_available


def test_json_roundtrip():
    cfg = ExperimentConfig(
        model_name="Test",
        model=ModelConfig(kernel_size=128, heads_number=8, num_spkrs=42),
        train=TrainConfig(batch_size=4, learning_rate=3e-4),
    )
    s = cfg.to_json()
    back = ExperimentConfig.from_json(s)
    assert back == cfg


def test_json_ignores_unknown_keys():
    d = ExperimentConfig().to_dict()
    d["model"]["future_field"] = 123
    cfg = ExperimentConfig.from_dict(d)
    assert cfg.model.kernel_size == 1024


def test_count_speakers(tmp_path):
    p = tmp_path / "labels.ndx"
    p.write_text("a/b 0 -1\nc/d 1 -1\ne/f 0 -1\ng/h 2 -1\n")
    assert count_speakers(str(p)) == 3


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_model_name_matches_reference():
    """derived_model_name must byte-match reference getModelName (utils.py:61-69)."""
    add_reference_path()
    import argparse

    from utils import getModelName  # reference module

    ns = argparse.Namespace(
        model_name="CNN",
        front_end="VGG4L",
        window_size=3.5,
        batch_size=64,
        gradientAccumulation=2,
        learning_rate=0.0001,
        weight_decay=0.001,
        kernel_size=1024,
        embedding_size=400,
        scalingFactor=30.0,
        marginFactor=0.4,
        pooling_method="DoubleMHA",
        heads_number=32,
    )
    cfg = ExperimentConfig()
    assert cfg.derived_model_name() == getModelName(ns)
