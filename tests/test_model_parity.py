"""Numerical parity vs the reference PyTorch implementation.

The reference repo is imported directly (read-only) as the test oracle: we
build its SpeakerClassifier, export its state_dict, import the weights with
``utils.torch_import``, and require allclose outputs. Eval mode only for the
DoubleMHA path (the reference's train-mode head masking requires CUDA,
``poolings.py:41``); train-mode checks use the RNG-free poolings.
"""

import argparse

import numpy as np
import pytest

from conftest import add_reference_path, reference_available

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from doubleattentionspeakerverification_tpu.config import ModelConfig
from doubleattentionspeakerverification_tpu.models.classifier import (
    get_embedding,
    init_speaker_classifier,
    speaker_classifier_apply,
)
from doubleattentionspeakerverification_tpu.models.amsoftmax import annealed_factor
from doubleattentionspeakerverification_tpu.utils.torch_import import import_state_dict

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _ref_model(pooling="DoubleMHA", front_end="VGG4L", kernel=32, heads=4, emb=32, n_spk=11):
    add_reference_path()
    from model import SpeakerClassifier  # reference

    ns = argparse.Namespace(
        front_end=front_end,
        kernel_size=kernel,
        embedding_size=emb,
        heads_number=heads,
        pooling_method=pooling,
        mask_prob=0.3,
        num_spkrs=n_spk,
        scalingFactor=30.0,
        marginFactor=0.4,
        annealing=True,
    )
    torch.manual_seed(7)
    net = SpeakerClassifier(ns, torch.device("cpu"))
    cfg = ModelConfig(
        front_end=front_end,
        kernel_size=kernel,
        embedding_size=emb,
        heads_number=heads,
        pooling_method=pooling,
        mask_prob=0.3,
        num_spkrs=n_spk,
        scaling_factor=30.0,
        margin_factor=0.4,
        annealing=True,
    )
    return net, cfg


def _import(net, cfg):
    params, state = import_state_dict(net.state_dict(), cfg)
    return jax.tree.map(np.asarray, params), state


@pytest.mark.parametrize("pooling", ["DoubleMHA", "MHA", "Attention"])
@pytest.mark.parametrize("front_end", ["VGG4L", "VGG3L"])
def test_forward_parity_eval(pooling, front_end):
    net, cfg = _ref_model(pooling=pooling, front_end=front_end)
    net.eval()
    params, state = _import(net, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 47, 80)).astype(np.float32)
    label = np.array([1, 5, 9])
    step = 120

    with torch.no_grad():
        ref_costh, ref_logits = net(torch.tensor(x), torch.tensor(label), step)
        ref_emb = net.getEmbedding(torch.tensor(x))

    costh, logits, _ = speaker_classifier_apply(
        params, state, x, label, step, cfg, train=False
    )
    emb = get_embedding(params, state, x, None, cfg)

    np.testing.assert_allclose(np.asarray(costh), ref_costh.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), atol=2e-5)


def test_padded_equals_unpadded():
    """Bucketed-padded forward must equal the reference-style unpadded one."""
    net, cfg = _ref_model()
    net.eval()
    params, state = _import(net, cfg)

    rng = np.random.default_rng(1)
    lens = [33, 47, 40]
    t_max = 47
    xs = [rng.standard_normal((l, 80)).astype(np.float32) for l in lens]
    padded = np.zeros((3, t_max, 80), np.float32)
    for i, x in enumerate(xs):
        padded[i, : lens[i]] = x

    emb_padded = np.asarray(
        get_embedding(params, state, padded, np.array(lens), cfg)
    )
    for i, x in enumerate(xs):
        # batch-of-1 BN in eval mode uses running stats -> comparable
        e = np.asarray(get_embedding(params, state, x[None], None, cfg))[0]
        np.testing.assert_allclose(emb_padded[i], e, atol=3e-5)


def test_train_mode_bn_and_grads_parity():
    """Train-mode forward parity (batch-stat BN, margin+annealing active) and
    running-stat updates vs torch, using MHA pooling (no mask RNG)."""
    net, cfg = _ref_model(pooling="MHA")
    net.train()
    params, state = _import(net, cfg)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 47, 80)).astype(np.float32)
    label = np.array([0, 1, 2, 3, 4, 5, 6, 7])

    ref_costh, ref_logits = net(torch.tensor(x), torch.tensor(label), 0)
    costh, logits, new_state = speaker_classifier_apply(
        params, state, x, label, 0, cfg, train=True
    )
    np.testing.assert_allclose(np.asarray(costh), ref_costh.detach().numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.detach().numpy(), atol=6e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.bn_mean), net.b2.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.bn_var), net.b2.running_var.numpy(), atol=1e-5
    )


def test_annealed_factor_parity():
    net, cfg = _ref_model(pooling="MHA")
    for step in [0, 1, 999, 10000, 1000000]:
        ref = net.predictionLayer.getAnnealedFactor(step)
        ours = float(annealed_factor(step, cfg))
        assert ours == pytest.approx(ref, rel=1e-6)


def test_vgg_output_dimension_formulas():
    add_reference_path()
    from CNNs import getVGG3LOutputDimension, getVGG4LOutputDimension

    from doubleattentionspeakerverification_tpu.models.vgg import vgg_output_dim

    for feat in [80, 79, 64, 40]:
        for k in [16, 128, 1024]:
            assert vgg_output_dim("VGG3L", k, feat) == getVGG3LOutputDimension(feat, k)
            assert vgg_output_dim("VGG4L", k, feat) == getVGG4LOutputDimension(feat, k)


def test_head_mask_distribution():
    """Head dropout: P(drop) = 1/int(1/mask_prob) per head (poolings.py:36-43)."""
    from doubleattentionspeakerverification_tpu.models.poolings import (
        head_attention_pool,
        init_attention,
    )

    cfg = ModelConfig(heads_number=8, mask_prob=0.3)
    key = jax.random.PRNGKey(0)
    params = init_attention(jax.random.PRNGKey(1), 16)
    hctx = np.abs(np.random.default_rng(3).standard_normal((64, 8, 16))).astype(np.float32)

    drops = 0
    total = 0
    for i in range(50):
        _, w = head_attention_pool(params, hctx, cfg, train=True, rng=jax.random.fold_in(key, i))
        drops += int(np.sum(np.asarray(w) == 0.0))
        total += w.size
    p = drops / total
    assert abs(p - 1.0 / 3.0) < 0.02  # P(drop)=1/int(1/0.3)=1/3


def test_random_init_forward_finite():
    cfg = ModelConfig(
        kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=7,
        pooling_method="DoubleMHA",
    )
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((2, 35, 80)).astype(np.float32)
    costh, logits, _ = speaker_classifier_apply(
        params, state, x, np.array([0, 3]), 0, cfg, train=True,
        rng=jax.random.PRNGKey(5),
    )
    assert np.all(np.isfinite(np.asarray(costh)))
    assert np.all(np.isfinite(np.asarray(logits)))


def test_statistical_pooling_variant():
    cfg = ModelConfig(
        kernel_size=16, heads_number=4, embedding_size=24, num_spkrs=7,
        pooling_method="StatisticalPooling",
    )
    params, state = init_speaker_classifier(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((2, 35, 80)).astype(np.float32)
    emb = get_embedding(params, state, x, None, cfg)
    assert emb.shape == (2, 24)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_full_train_step_parity_vs_torch():
    """Whole optimizer step vs torch: 2 summed microbatch gradients
    (reference train.py:219-226), Adam + weight decay, train-mode BN.
    Uses MHA pooling (no dropout RNG on either side)."""
    import torch

    from doubleattentionspeakerverification_tpu.config import (
        DataConfig,
        ExperimentConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    net, mcfg = _ref_model(pooling="MHA", kernel=16, heads=4, emb=24, n_spk=6)
    net.train()
    params, state = _import(net, mcfg)

    cfg = ExperimentConfig(
        model=mcfg,
        train=TrainConfig(
            batch_size=4, gradient_accumulation=2, optimizer="Adam",
            learning_rate=1e-3, weight_decay=1e-2,
        ),
    )
    tstate = init_train_state(params, state, cfg)
    step_fn = make_train_step(cfg, donate=False)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 40, 80)).astype(np.float32)
    labels = np.array([[0, 1, 2, 3], [4, 5, 0, 1]], np.int32)
    batch = {
        "inputs": x,
        "lengths": np.full((2, 4), 40, np.int32),
        "labels": labels,
    }
    new_state, metrics = step_fn(tstate, batch, jax.random.PRNGKey(0))

    # torch equivalent
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=1e-2)
    crit = torch.nn.CrossEntropyLoss()
    opt.zero_grad()
    losses = []
    for g in range(2):
        pred, ampred = net(torch.tensor(x[g]), torch.tensor(labels[g]).long(), 0)
        loss = crit(ampred, torch.tensor(labels[g]).long())
        loss.backward()
        losses.append(float(loss))
    opt.step()

    np.testing.assert_allclose(
        float(metrics["loss"]), np.mean(losses), rtol=1e-5
    )
    ours_after, _ = _import(net, mcfg)  # re-export torch params post-step
    flat_t = jax.tree_util.tree_flatten_with_path(ours_after)[0]
    flat_j = dict(
        ("/".join(str(getattr(p, "key", p)) for p in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    )
    # tolerance: a numerically-zero gradient (dead ReLU unit) makes Adam's
    # update ±lr regardless of magnitude, so float noise can flip its sign;
    # bound per-element error by ~2*lr and require the bulk to agree tightly
    n_loose, n_total = 0, 0
    for path, torch_leaf in flat_t:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        diff = np.abs(np.asarray(flat_j[key]) - np.asarray(torch_leaf))
        assert diff.max() <= 2.1e-3, (key, diff.max())
        n_loose += int(np.sum(diff > 5e-5))
        n_total += diff.size
    assert n_loose / n_total < 0.001, (n_loose, n_total)
    # BN running stats after two microbatch forwards
    np.testing.assert_allclose(
        np.asarray(new_state.model_state.bn_mean), net.b2.running_mean.numpy(), atol=1e-5
    )
