"""The driver-facing multi-chip dryrun must sweep mesh layouts (VERDICT r1
#8): device counts x model_axis {1,2,4}, each asserting loss equality with
the single-device step. Runs on the suite's 8 virtual CPU devices."""

import jax
import pytest


def test_dryrun_multichip_sweep_8dev(capsys):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    out = capsys.readouterr().out
    # all 8 valid (n_dev, model_axis) layouts for 8 devices, batch 8
    assert out.count("ok") >= 8
    assert "MISMATCH" not in out
    assert "{'data': 2, 'model': 4}" in out  # deepest model sharding swept
