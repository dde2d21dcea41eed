"""Import reference PyTorch checkpoints into this framework.

Users of the reference repo can bring a trained ``.chkpt``
(``scripts/utils.py:23-40`` layout: {'model': state_dict, 'optimizer': ...,
'settings': Namespace, 'epoch', 'step'}) and convert it to our param pytree +
ModelState + ExperimentConfig. Conversion rules:

- conv weights OIHW -> HWIO (TPU layout)
- linear weights (out, in) -> (in, out)
- ``b2`` BatchNorm -> params['b2'] + running stats in ModelState
- ``b1``/``b3`` BatchNorms are skipped: the reference defines but never
  applies them (``scripts/model.py:43-59``)
- AM-Softmax ``predictionLayer.W`` is (in_feats, n_classes) in both.

Only needs numpy; accepts torch tensors if torch is importable.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from ..config import ExperimentConfig, ModelConfig, TrainConfig
from ..models.classifier import ModelState


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v.copy()
    try:  # torch tensor: .numpy() shares memory — copy so later in-place
        # torch updates (e.g. BN running stats) can't leak into our pytree
        return v.detach().cpu().numpy().copy()
    except AttributeError:
        return np.asarray(v)


def import_state_dict(
    state_dict: Dict[str, Any], cfg: ModelConfig
) -> Tuple[Dict[str, Any], ModelState]:
    """Reference ``SpeakerClassifier.state_dict()`` -> (params, state)."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}

    def conv(name):
        w = sd[f"front_end.{name}.weight"].transpose(2, 3, 1, 0)  # OIHW->HWIO
        return {"w": w, "b": sd[f"front_end.{name}.bias"]}

    def linear(name):
        return {"w": sd[f"{name}.weight"].T.copy(), "b": sd[f"{name}.bias"]}

    n_blocks = 3 if cfg.front_end == "VGG3L" else 4
    vgg = {}
    for i in range(1, n_blocks + 1):
        vgg[f"conv{i}1"] = conv(f"conv{i}1")
        vgg[f"conv{i}2"] = conv(f"conv{i}2")

    if cfg.pooling_method == "Attention":
        pooling = {"att": sd["poolingLayer.att"]}
    elif cfg.pooling_method == "MHA":
        pooling = {"query": sd["poolingLayer.query"]}
    elif cfg.pooling_method == "DoubleMHA":
        pooling = {
            "mha": {"query": sd["poolingLayer.utteranceAttention.query"]},
            "head_att": {"att": sd["poolingLayer.headsAttention.att"]},
        }
    elif cfg.pooling_method == "StatisticalPooling":
        pooling = {}
    else:
        raise ValueError(f"unknown pooling_method {cfg.pooling_method!r}")

    params = {
        "vgg": vgg,
        "pooling": pooling,
        "fc1": linear("fc1"),
        "fc2": linear("fc2"),
        "b2": {"scale": sd["b2.weight"], "bias": sd["b2.bias"]},
        "pre_layer": linear("preLayer"),
        "amsoftmax": {"W": sd["predictionLayer.W"]},
    }
    state = ModelState(
        bn_mean=sd["b2.running_mean"],
        bn_var=sd["b2.running_var"],
        bn_count=np.asarray(
            int(np.asarray(sd.get("b2.num_batches_tracked", 0)).item()), dtype=np.int32
        ),
    )
    return params, state


def config_from_namespace(ns) -> ExperimentConfig:
    """Reference pickled argparse Namespace (``train.py:294-303``) -> config."""
    g = lambda k, d: getattr(ns, k, d)
    model = ModelConfig(
        front_end=g("front_end", "VGG4L"),
        kernel_size=g("kernel_size", 1024),
        embedding_size=g("embedding_size", 400),
        heads_number=g("heads_number", 32),
        pooling_method=g("pooling_method", "DoubleMHA"),
        mask_prob=g("mask_prob", 0.3),
        num_spkrs=g("num_spkrs", 5994),
        scaling_factor=g("scalingFactor", 30.0),
        margin_factor=g("marginFactor", 0.4),
        annealing=g("annealing", False),
    )
    train = TrainConfig(
        window_size=g("window_size", 3.5),
        random_slicing=g("randomSlicing", False),
        normalization=g("normalization", "cmn"),
        optimizer=g("optimizer", "Adam"),
        learning_rate=g("learning_rate", 1e-4),
        weight_decay=g("weight_decay", 1e-3),
        batch_size=g("batch_size", 64),
        gradient_accumulation=g("gradientAccumulation", 2),
        max_epochs=g("max_epochs", 1000000),
        early_stopping=g("early_stopping", 25),
        print_every=g("print_every", 1000),
        validate_every=g("validate_every", 10000),
    )
    return ExperimentConfig(
        model_name=g("model_name", "CNN"), out_dir=g("out_dir", "."), model=model, train=train
    )


def load_torch_checkpoint(path: str):
    """Load a reference ``.chkpt`` file. Requires torch.

    Returns (params, state, config, epoch, step).
    """
    import torch  # local import: torch only needed for this migration path

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = config_from_namespace(ckpt["settings"])
    params, state = import_state_dict(ckpt["model"], cfg.model)
    return params, state, cfg, ckpt.get("epoch", 0), ckpt.get("step", 0)
