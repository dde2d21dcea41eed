"""The jitted train step.

One XLA program per optimizer step: a ``lax.scan`` over the gradient-
accumulation microbatches (forward + backward + BN-state carry), gradient
summation (the reference sums microbatch gradients — ``loss.backward()``
per batch with no division, ``train.py:219-226``), then the optax update.
When the batch is data-sharded over a mesh, XLA inserts the gradient
all-reduce automatically.

In 'wav' mode the log-mel front-end runs inside the step (device DSP).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ExperimentConfig
from ..dsp.features import frames_for_samples, log_mel_spectrogram, normalize_features
from ..models.amsoftmax import cross_entropy, focal_cross_entropy
from ..models.classifier import ModelState, speaker_classifier_apply
from .optimizers import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    model_state: ModelState
    step: jnp.ndarray  # int32 scalar, counts optimizer updates


def init_train_state(params, model_state: ModelState, cfg: ExperimentConfig) -> TrainState:
    opt = make_optimizer(cfg.train)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        model_state=model_state,
        step=jnp.zeros((), jnp.int32),
    )


def _prepare_inputs(batch: Dict[str, jnp.ndarray], cfg: ExperimentConfig):
    """Returns (features (G,B,T,F), frame_lengths (G,B) or None)."""
    full = cfg.train.assume_full_lengths
    if "waves" in batch:
        waves = batch["waves"]
        if waves.dtype == jnp.int16:  # PCM transfer: undo the host-side scale
            waves = waves.astype(jnp.float32) / 32768.0
        if cfg.model.use_pallas_dsp:
            from ..ops.logmel_pallas import log_mel_spectrogram_pallas

            g, b = waves.shape[:2]
            feats = log_mel_spectrogram_pallas(
                waves.reshape(g * b, -1), cfg.features
            ).reshape(g, b, -1, cfg.features.n_mels)
        else:
            feats = log_mel_spectrogram(waves, cfg.features)
        if full:
            return normalize_features(feats, cfg.train.normalization), None
        lens = frames_for_samples(batch["lengths"], cfg.features)
        feats = normalize_features(feats, cfg.train.normalization, lengths=lens)
        return feats, lens
    inputs = batch["inputs"].astype(jnp.float32)  # upcast bf16 transfers
    return inputs, (None if full else batch["lengths"])


def make_train_step(cfg: ExperimentConfig, donate: bool = True):
    """Returns jitted ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: inputs/waves (G,B,...), lengths (G,B), labels (G,B).
    metrics: mean loss / accuracy over the G microbatches (the reference
    averages printed loss the same way, ``train.py:186-194``).
    """
    from ..utils.kernel_auto import resolve_fast_kernels

    cfg = resolve_fast_kernels(cfg)  # concrete use_pallas_* for this backend
    opt = make_optimizer(cfg.train)
    mcfg = cfg.model
    if cfg.train.criterion not in ("cross_entropy", "focal"):
        raise ValueError(f"unknown criterion {cfg.train.criterion!r}")
    if cfg.train.criterion == "focal" and mcfg.classifier_chunk > 0:
        raise ValueError(
            "criterion='focal' needs full logits; incompatible with classifier_chunk"
        )

    def microbatch_loss(params, model_state, feats, lengths, labels, step, rng):
        if mcfg.classifier_chunk > 0:
            from ..models.classifier import classifier_features
            from ..ops.chunked_amsoftmax import chunked_amsoftmax_ce

            e3, new_ms = classifier_features(
                params, model_state, feats, lengths, mcfg, train=True, rng=rng
            )
            loss, acc = chunked_amsoftmax_ce(
                params["amsoftmax"], e3, labels, step, mcfg,
                chunk=mcfg.classifier_chunk,
            )
            return loss, (new_ms, acc)
        costh, logits, new_ms = speaker_classifier_apply(
            params, model_state, feats, labels, step, mcfg,
            lengths=lengths, train=True, rng=rng,
        )
        if cfg.train.criterion == "focal":
            loss = focal_cross_entropy(logits, labels, cfg.train.focal_gamma)
        else:
            loss = cross_entropy(logits, labels)
        acc = jnp.mean((jnp.argmax(costh, axis=-1) == labels).astype(jnp.float32))
        return loss, (new_ms, acc)

    grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        feats, lens = _prepare_inputs(batch, cfg)
        g = feats.shape[0]

        def body(carry, micro):
            grads_acc, ms, loss_acc, acc_acc, i = carry
            f, l, y = micro
            rng_i = jax.random.fold_in(rng, i)
            if cfg.train.specaugment:
                from ..dsp.augment import spec_augment

                # separate key so the head-dropout stream is unchanged when
                # augmentation is toggled
                f = spec_augment(
                    f, jax.random.fold_in(rng_i, 0x5A),
                    cfg.train.specaugment_time_masks,
                    cfg.train.specaugment_time_width,
                    cfg.train.specaugment_freq_masks,
                    cfg.train.specaugment_freq_width,
                )
            (loss, (new_ms, acc)), grads = grad_fn(
                state.params, ms, f, l, y, state.step, rng_i
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_ms, loss_acc + loss, acc_acc + acc, i + 1), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        init = (zeros, state.model_state, jnp.float32(0.0), jnp.float32(0.0), jnp.int32(0))
        (grads, new_ms, loss_sum, acc_sum, _), _ = jax.lax.scan(
            body, init, (feats, lens, batch["labels"])
        )
        if cfg.train.grad_accum_mean:
            grads = jax.tree.map(lambda x: x / g, grads)

        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, new_ms, state.step + 1)
        metrics = {"loss": loss_sum / g, "accuracy": acc_sum / g}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(cfg: ExperimentConfig):
    """Jitted forward-only loss/accuracy (no state mutation) for eval."""
    from ..utils.kernel_auto import resolve_fast_kernels

    cfg = resolve_fast_kernels(cfg)
    mcfg = cfg.model

    def eval_step(params, model_state, batch):
        feats, lens = _prepare_inputs(batch, cfg)
        f = feats.reshape((-1,) + feats.shape[2:])
        l = None if lens is None else lens.reshape(-1)
        y = batch["labels"].reshape(-1)
        costh, logits, _ = speaker_classifier_apply(
            params, model_state, f, y, 0, mcfg, lengths=l, train=False
        )
        return {
            "loss": cross_entropy(logits, y),
            "accuracy": jnp.mean((jnp.argmax(costh, -1) == y).astype(jnp.float32)),
        }

    return jax.jit(eval_step)
