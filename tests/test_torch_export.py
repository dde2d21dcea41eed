"""Checkpoint EXPORT to the reference format (utils/torch_export.py).

The exported ``.chkpt`` must load into the actual, unmodified reference
implementation (strict state_dict, its optimizer, its settings pickle
contract) and produce identical embeddings — the mirror image of the
import-parity tests.
"""

import argparse
import os

import numpy as np
import pytest

from conftest import add_reference_path, reference_available

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from doubleattentionspeakerverification_tpu.config import (
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from doubleattentionspeakerverification_tpu.models.classifier import (
    get_embedding,
    init_speaker_classifier,
)
from doubleattentionspeakerverification_tpu.training.step import (
    init_train_state,
    make_train_step,
)
from doubleattentionspeakerverification_tpu.utils.torch_export import (
    save_torch_checkpoint,
)
from doubleattentionspeakerverification_tpu.utils.torch_import import (
    import_state_dict,
    load_torch_checkpoint,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

CFG = ExperimentConfig(
    model=ModelConfig(
        kernel_size=32, heads_number=4, embedding_size=32, num_spkrs=11,
        mask_prob=0.3, annealing=True,
    ),
    train=TrainConfig(batch_size=4, gradient_accumulation=2, window_size=0.5),
)


def _trained_state(steps=3):
    """A state with real Adam moments / BN stats (a few tiny train steps)."""
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), CFG.model)
    state = init_train_state(params, ms, CFG)
    step = make_train_step(CFG, donate=False)
    rng = np.random.default_rng(0)
    g, b, t = 2, 4, 50
    for i in range(steps):
        batch = {
            "inputs": rng.standard_normal((g, b, t, 80)).astype(np.float32),
            "lengths": np.full((g, b), t, np.int32),
            "labels": rng.integers(0, CFG.model.num_spkrs, (g, b)).astype(np.int32),
        }
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    return state


def test_export_loads_into_reference_and_matches(tmp_path):
    add_reference_path()
    from model import SpeakerClassifier  # the reference implementation

    state = _trained_state()
    path = str(tmp_path / "exported.chkpt")
    save_torch_checkpoint(path, state.params, state.model_state, CFG,
                          opt_state=state.opt_state, epoch=2, step=int(state.step))

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = SpeakerClassifier(ckpt["settings"], torch.device("cpu"))
    net.load_state_dict(ckpt["model"])  # strict: every reference key present
    net.eval()

    x = np.random.default_rng(1).standard_normal((2, 47, 80)).astype(np.float32)
    with torch.no_grad():
        ref_emb = net.getEmbedding(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        get_embedding(state.params, state.model_state, x, None, CFG.model)
    )
    np.testing.assert_allclose(ref_emb, ours, atol=2e-5)

    # the reference optimizer accepts the exported Adam state and can step
    opt = torch.optim.Adam(net.parameters(), lr=1e-4, weight_decay=1e-3)
    opt.load_state_dict(ckpt["optimizer"])
    with torch.enable_grad():
        pred, logits = net(torch.from_numpy(x), torch.tensor([1, 2]), ckpt["step"])
        torch.nn.functional.cross_entropy(logits, torch.tensor([1, 2])).backward()
    opt.step()  # would raise if the state tensors/shapes were wrong


def test_export_import_roundtrip(tmp_path):
    state = _trained_state()
    path = str(tmp_path / "roundtrip.chkpt")
    save_torch_checkpoint(path, state.params, state.model_state, CFG,
                          opt_state=state.opt_state, epoch=5, step=int(state.step))

    params2, ms2, cfg2, epoch2, step2 = load_torch_checkpoint(path)
    assert epoch2 == 5 and step2 == int(state.step)
    assert cfg2.model == CFG.model

    flat1 = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, state.params))
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    for path_key, leaf in flat1:
        np.testing.assert_allclose(
            leaf, flat2[path_key], atol=1e-6,
            err_msg=jax.tree_util.keystr(path_key),
        )
    np.testing.assert_allclose(np.asarray(state.model_state.bn_mean), ms2.bn_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.model_state.bn_var), ms2.bn_var, atol=1e-6)


@pytest.mark.parametrize("opt_name,torch_cls", [
    ("SGD", "SGD"), ("RMSprop", "RMSprop"), ("Adam", "Adam"),
])
def test_export_optimizer_always_loadable(tmp_path, opt_name, torch_cls):
    """The reference's requeue calls ``optimizer.load_state_dict``
    unconditionally (``train.py:42``) — every exported .chkpt must carry a
    loadable optimizer state for its configured optimizer, moments or not."""
    add_reference_path()
    from model import SpeakerClassifier

    import dataclasses

    cfg = CFG.replace(train=dataclasses.replace(CFG.train, optimizer=opt_name))
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(params, ms, cfg)
    step = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.standard_normal((2, 4, 50, 80)).astype(np.float32),
        "lengths": np.full((2, 4), 50, np.int32),
        "labels": rng.integers(0, cfg.model.num_spkrs, (2, 4)).astype(np.int32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    path = str(tmp_path / "opt.chkpt")
    save_torch_checkpoint(path, state.params, state.model_state, cfg,
                          opt_state=state.opt_state, step=1)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = SpeakerClassifier(ckpt["settings"], torch.device("cpu"))
    net.load_state_dict(ckpt["model"])
    opt = getattr(torch.optim, torch_cls)(
        net.parameters(), lr=1e-4, weight_decay=1e-3
    )
    opt.load_state_dict(ckpt["optimizer"])  # reference train.py:42 equivalent
    net.eval()  # reference train-mode head masking is CUDA-only (poolings.py:41)
    x = np.random.default_rng(2).standard_normal((2, 30, 80)).astype(np.float32)
    pred, logits = net(torch.from_numpy(x), torch.tensor([0, 1]), 1)
    torch.nn.functional.cross_entropy(logits, torch.tensor([0, 1])).backward()
    opt.step()


def test_export_cli(tmp_path):
    from doubleattentionspeakerverification_tpu.cli.export_checkpoint import (
        main as export_main,
    )
    from doubleattentionspeakerverification_tpu.utils.checkpoint import save_checkpoint

    state = _trained_state(steps=1)
    npz = str(tmp_path / "ours.npz")
    save_checkpoint(npz, state, {"config": CFG.to_dict(), "epoch": 1})
    out = str(tmp_path / "exported.chkpt")
    assert export_main(["--checkpoint", npz, "--out", out]) == 0
    ckpt = torch.load(out, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model", "optimizer", "settings", "epoch", "step"}
    assert isinstance(ckpt["settings"], argparse.Namespace)
    assert ckpt["settings"].pooling_method == "DoubleMHA"
    assert os.path.exists(out)
