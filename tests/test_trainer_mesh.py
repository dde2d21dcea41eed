"""Trainer on the 8-device CPU mesh: training + validation + resume all work
with sharded state (the driver's multi-chip dryrun covers the same path)."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from doubleattentionspeakerverification_tpu.training.trainer import Trainer

from test_training import _make_dataset, _tiny_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_trainer_uses_mesh(tmp_path):
    import dataclasses

    _make_dataset(tmp_path, n_speakers=4, per_speaker=8)
    cfg = _tiny_cfg(tmp_path, batch_size=8, validate_every=2, max_epochs=2)
    cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, model_axis=2)
    )
    tr = Trainer(cfg)
    assert tr.mesh is not None and dict(tr.mesh.shape) == {"data": 4, "model": 2}
    assert tr.state.params["amsoftmax"]["W"].sharding.spec == P(None, "model")
    tr.train()
    assert int(tr.state.step) >= 2
    # W stays sharded through updates
    assert tr.state.params["amsoftmax"]["W"].sharding.spec == P(None, "model")
    # validation ran on sharded params
    tr.best_eer = 1000.0
    tr._on_validation()
    tr._join_validation()  # async by default: wait for the result to land
    assert tr.best_ckpt_path is not None

    # resume reshards
    tr2 = Trainer(cfg)
    assert tr2.resume()
    assert tr2.state.params["amsoftmax"]["W"].sharding.spec == P(None, "model")
