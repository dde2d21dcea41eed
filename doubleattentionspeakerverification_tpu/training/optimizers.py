"""Optimizer factory (optax) with torch-parity semantics.

Reference (``scripts/train.py:82-95``): Adam / SGD / RMSprop, shared lr and
weight decay; weight decay is torch-style L2 folded into the gradient (not
decoupled). LR is a mutable hyperparameter (``inject_hyperparams``) so the
trainer can halve it on validation stagnation (``train.py:90-95,200-203``).
"""

from __future__ import annotations

import optax

from ..config import TrainConfig


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def build(learning_rate):
        wd = optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity()
        if cfg.optimizer == "Adam":
            core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        elif cfg.optimizer == "SGD":
            core = optax.identity()
        elif cfg.optimizer == "RMSprop":
            # torch RMSprop: v = 0.99 v + 0.01 g^2 ; update g / (sqrt(v) + eps)
            core = optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
        else:
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
        return optax.chain(wd, core, optax.scale(-learning_rate))

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def with_lr(opt_state, lr: float):
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lr
    return opt_state._replace(hyperparams=hp)
