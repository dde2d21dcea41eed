"""Export this framework's checkpoints AS reference PyTorch ``.chkpt`` files.

Inverse of :mod:`torch_import` — a model trained here can be handed back to
users of the reference repo and loaded by its unmodified tooling
(``scripts/getEmbeddingExample.py``, ``scripts/train.py --requeue``). The
produced file has the exact ``scripts/utils.py:23-40`` layout:
``{'model': state_dict, 'optimizer': state_dict, 'settings': Namespace,
'epoch', 'step'}``.

Conversion rules (mirror of torch_import):
- conv weights HWIO -> OIHW; linear weights (in, out) -> (out, in)
- ``b2`` params + ModelState running stats -> the reference's ``b2``
- ``b1``/``b3`` (defined but never applied by the reference,
  ``scripts/model.py:43-59``) are synthesized at their torch defaults
  (weight 1, bias 0, mean 0, var 1) so ``load_state_dict(strict=True)``
  succeeds
- Adam moments (optax ``scale_by_adam`` mu/nu) -> torch Adam ``exp_avg`` /
  ``exp_avg_sq`` in the reference module's ``named_parameters()`` order;
  b1/b3 get no state entries, matching torch's lazy state for parameters
  that never receive gradients.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np

from ..config import ExperimentConfig, ModelConfig
from ..models.classifier import ModelState


def export_state_dict(params: Dict[str, Any], state: ModelState, cfg: ModelConfig):
    """Our param pytree + ModelState -> reference ``state_dict`` (numpy)."""
    out: Dict[str, np.ndarray] = {}

    n_blocks = 3 if cfg.front_end == "VGG3L" else 4
    for i in range(1, n_blocks + 1):
        for j in (1, 2):
            c = params["vgg"][f"conv{i}{j}"]
            out[f"front_end.conv{i}{j}.weight"] = np.transpose(
                np.asarray(c["w"]), (3, 2, 0, 1)
            )  # HWIO -> OIHW
            out[f"front_end.conv{i}{j}.bias"] = np.asarray(c["b"])

    pooling = params["pooling"]
    if cfg.pooling_method == "Attention":
        out["poolingLayer.att"] = np.asarray(pooling["att"])
    elif cfg.pooling_method == "MHA":
        out["poolingLayer.query"] = np.asarray(pooling["query"])
    elif cfg.pooling_method == "DoubleMHA":
        out["poolingLayer.utteranceAttention.query"] = np.asarray(pooling["mha"]["query"])
        out["poolingLayer.headsAttention.att"] = np.asarray(pooling["head_att"]["att"])
    elif cfg.pooling_method == "StatisticalPooling":
        raise ValueError(
            "StatisticalPooling is an extension of this framework; the "
            "reference model has no equivalent module to export to"
        )
    else:
        raise ValueError(f"unknown pooling_method {cfg.pooling_method!r}")

    for ours, theirs in (("fc1", "fc1"), ("fc2", "fc2"), ("pre_layer", "preLayer")):
        out[f"{theirs}.weight"] = np.asarray(params[ours]["w"]).T.copy()
        out[f"{theirs}.bias"] = np.asarray(params[ours]["b"])

    emb = np.asarray(params["b2"]["scale"]).shape[0]
    out["b2.weight"] = np.asarray(params["b2"]["scale"])
    out["b2.bias"] = np.asarray(params["b2"]["bias"])
    out["b2.running_mean"] = np.asarray(state.bn_mean)
    out["b2.running_var"] = np.asarray(state.bn_var)
    out["b2.num_batches_tracked"] = np.asarray(int(state.bn_count), dtype=np.int64)
    for dead in ("b1", "b3"):  # torch BatchNorm1d defaults; never applied
        out[f"{dead}.weight"] = np.ones((emb,), np.float32)
        out[f"{dead}.bias"] = np.zeros((emb,), np.float32)
        out[f"{dead}.running_mean"] = np.zeros((emb,), np.float32)
        out[f"{dead}.running_var"] = np.ones((emb,), np.float32)
        out[f"{dead}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    out["predictionLayer.W"] = np.asarray(params["amsoftmax"]["W"])
    return out


def _torch_param_order(cfg: ModelConfig):
    """Keys of ``named_parameters()`` in the reference module's registration
    order (``scripts/model.py:10-21``: front_end, poolingLayer, fc1, b1, fc2,
    b2, preLayer, b3, predictionLayer). b1/b3 never receive gradients ->
    excluded from optimizer-state export (torch creates state lazily)."""
    order, dead = [], set()
    n_blocks = 3 if cfg.front_end == "VGG3L" else 4
    for i in range(1, n_blocks + 1):
        for j in (1, 2):
            order += [f"front_end.conv{i}{j}.weight", f"front_end.conv{i}{j}.bias"]
    if cfg.pooling_method == "Attention":
        order += ["poolingLayer.att"]
    elif cfg.pooling_method == "MHA":
        order += ["poolingLayer.query"]
    elif cfg.pooling_method == "DoubleMHA":
        order += [
            "poolingLayer.utteranceAttention.query",
            "poolingLayer.headsAttention.att",
        ]
    order += ["fc1.weight", "fc1.bias"]
    dead.update({len(order), len(order) + 1})
    order += ["b1.weight", "b1.bias"]
    order += ["fc2.weight", "fc2.bias", "b2.weight", "b2.bias"]
    order += ["preLayer.weight", "preLayer.bias"]
    dead.update({len(order), len(order) + 1})
    order += ["b3.weight", "b3.bias"]
    order += ["predictionLayer.W"]
    return order, dead


def _optax_moments(opt_state):
    """(kind, count, trees...) from our optimizer state (inject_hyperparams
    around chain(wd, core, scale)); ('none',) when the core keeps no state
    (SGD) or opt_state wasn't given."""
    import optax

    inner = getattr(opt_state, "inner_state", opt_state)
    try:
        states = list(inner)
    except TypeError:
        states = [inner]
    for s in states:
        if isinstance(s, optax.ScaleByAdamState):
            return ("adam", int(s.count), s.mu, s.nu)
        if isinstance(s, optax.ScaleByRmsState):
            return ("rms", 0, s.nu)
    return ("none",)


def _params_only_sd(tree, state: ModelState, cfg: ModelConfig):
    """export_state_dict for a params-shaped tree (optimizer moments): the
    BN running stats / synthesized buffers it also emits are never read."""
    zero = ModelState(state.bn_mean * 0, state.bn_var * 0 + 1, state.bn_count * 0)
    return export_state_dict(tree, zero, cfg)


def export_optimizer_state_dict(
    opt_state, params: Dict[str, Any], state: ModelState, cfg: ExperimentConfig,
    step: int = 0,
) -> Dict[str, Any]:
    """-> torch ``Optimizer.state_dict()`` for the reference's optimizer
    (``scripts/train.py:82-88``: Adam/SGD/RMSprop at lr + weight_decay,
    torch defaults otherwise). ALWAYS loadable — the reference's requeue
    path calls ``optimizer.load_state_dict`` unconditionally
    (``train.py:42``) — with moments included when ``opt_state`` has them.
    """
    order, dead = _torch_param_order(cfg.model)
    lr = _get_lr(opt_state, cfg) if opt_state is not None else cfg.train.learning_rate
    common = {
        "lr": lr,
        "weight_decay": cfg.train.weight_decay,
        "maximize": False,
        "foreach": None,
        "differentiable": False,
        "params": list(range(len(order))),
    }
    opt = cfg.train.optimizer
    if opt == "Adam":
        group = {**common, "betas": (0.9, 0.999), "eps": 1e-8, "amsgrad": False,
                 "capturable": False, "fused": None}
    elif opt == "SGD":
        group = {**common, "momentum": 0, "dampening": 0, "nesterov": False,
                 "fused": None}
    elif opt == "RMSprop":
        group = {**common, "momentum": 0, "alpha": 0.99, "eps": 1e-8,
                 "centered": False, "capturable": False}
    else:
        raise ValueError(f"unknown optimizer {opt!r}")

    moments = _optax_moments(opt_state) if opt_state is not None else ("none",)
    st: Dict[int, Dict[str, Any]] = {}
    if opt == "Adam" and moments[0] == "adam":
        _, count, mu, nu = moments
        sd_mu = _params_only_sd(mu, state, cfg.model)
        sd_nu = _params_only_sd(nu, state, cfg.model)
        st = {
            i: {"step": count, "exp_avg": sd_mu[k], "exp_avg_sq": sd_nu[k]}
            for i, k in enumerate(order)
            if i not in dead
        }
    elif opt == "RMSprop" and moments[0] == "rms":
        sd_nu = _params_only_sd(moments[2], state, cfg.model)
        st = {
            i: {"step": step, "square_avg": sd_nu[k]}
            for i, k in enumerate(order)
            if i not in dead
        }
    # SGD at the reference's momentum=0 keeps no per-param state; an empty
    # 'state' is exactly what a freshly-stepped torch SGD serializes.
    return {"state": st, "param_groups": [group]}


def _get_lr(opt_state, cfg: ExperimentConfig) -> float:
    try:
        from ..training.optimizers import get_lr

        return get_lr(opt_state)
    except Exception:
        return cfg.train.learning_rate


def settings_namespace(cfg: ExperimentConfig) -> argparse.Namespace:
    """Our config -> the reference's pickled argparse Namespace (the fields
    ``scripts/train.py:253-291`` defines; inverse of
    ``torch_import.config_from_namespace``)."""
    m, t, d = cfg.model, cfg.train, cfg.data
    return argparse.Namespace(
        train_data_dir=d.train_data_dir,
        valid_data_dir=d.valid_data_dir,
        train_labels_path=d.train_labels_path,
        valid_clients=d.valid_clients,
        valid_impostors=d.valid_impostors,
        out_dir=cfg.out_dir,
        model_name=cfg.model_name,
        front_end=m.front_end,
        window_size=t.window_size,
        randomSlicing=t.random_slicing,
        normalization=t.normalization,
        kernel_size=m.kernel_size,
        embedding_size=m.embedding_size,
        heads_number=m.heads_number,
        pooling_method=m.pooling_method,
        mask_prob=m.mask_prob,
        scalingFactor=m.scaling_factor,
        marginFactor=m.margin_factor,
        annealing=m.annealing,
        optimizer=t.optimizer,
        data_mode="normal",
        learning_rate=t.learning_rate,
        weight_decay=t.weight_decay,
        batch_size=t.batch_size,
        gradientAccumulation=t.gradient_accumulation,
        max_epochs=t.max_epochs,
        early_stopping=t.early_stopping,
        print_every=t.print_every,
        requeue=False,
        validate_every=t.validate_every,
        num_workers=d.num_workers,
        num_spkrs=m.num_spkrs,
        feature_size=m.feature_size,
    )


def save_torch_checkpoint(
    path: str,
    params: Dict[str, Any],
    state: ModelState,
    cfg: ExperimentConfig,
    opt_state=None,
    epoch: int = 0,
    step: int = 0,
) -> None:
    """Write a reference-layout ``.chkpt``. Requires torch."""
    import torch

    model_sd = {
        # copy(): leaves may be non-writable jax array views
        k: torch.from_numpy(np.ascontiguousarray(v).copy())
        for k, v in export_state_dict(params, state, cfg.model).items()
    }
    opt_sd = export_optimizer_state_dict(opt_state, params, state, cfg, step=step)
    opt_sd["state"] = {
        i: {
            k: (torch.tensor(float(v)) if np.isscalar(v)
                else torch.from_numpy(np.ascontiguousarray(v).copy()))
            for k, v in ent.items()
        }
        for i, ent in opt_sd["state"].items()
    }
    torch.save(
        {
            "model": model_sd,
            "optimizer": opt_sd,
            "settings": settings_namespace(cfg),
            "epoch": epoch,
            "step": step,
        },
        path,
    )
