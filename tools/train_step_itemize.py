"""Itemize the flagship train step's residual (non-conv) time on the TPU.

The conv stack is ~83% MFU (BENCH_r03/r04); this attributes where the other
~17% of the 108 ms step goes, by timing ablated variants of the REAL jitted
step (same `make_train_step`, modified configs) and differencing:

  optimizer update   = full step            - grads-only step
  grad-accum scan    = accum=2 step         - 2x accum=1 step (same samples)
  masking            = masked step          - assume_full_lengths step
  attention pooling  = DoubleMHA step       - StatisticalPooling step
  AM-Softmax head    = full fwd loss        - encoder+pool fwd
  conv fwd (floor)   = vgg_apply fwd alone; bwd ~= 2x fwd FLOPs

Differences of medians on a drifting relay carry ~2-3% noise each; treat
<2 ms attributions as bounds, not point estimates (the table in
docs/PERFORMANCE.md says so).

  python tools/train_step_itemize.py          # one JSON line
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools._timing import timed_ms


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from doubleattentionspeakerverification_tpu.models.classifier import (
        init_speaker_classifier,
        speaker_classifier_apply,
    )
    from doubleattentionspeakerverification_tpu.models.vgg import vgg_apply
    from doubleattentionspeakerverification_tpu.training.step import (
        init_train_state,
        make_train_step,
    )

    g, b, t = 2, 64, 350
    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.standard_normal((g, b, t, 80)).astype(np.float32),
        "lengths": np.full((g, b), t, np.int32),
        "labels": rng.integers(0, 5994, (g, b)).astype(np.int32),
    }
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    def step_ms(model_kw=None, train_kw=None, batch_override=None):
        mcfg = ModelConfig(compute_dtype="bfloat16", **(model_kw or {}))
        tcfg = TrainConfig(**{"assume_full_lengths": True, **(train_kw or {})})
        cfg = ExperimentConfig(model=mcfg, train=tcfg)
        params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(params, ms, cfg)
        step = make_train_step(cfg, donate=False)
        bb = batch if batch_override is None else batch_override
        box = [state]

        def one():
            s, m = step(box[0], bb, key)
            box[0] = s
            return m["loss"]

        return timed_ms(one, k1=4, k2=16)

    out = {}
    out["full_ms"] = step_ms()
    out["masked_ms"] = step_ms(train_kw=dict(assume_full_lengths=False))
    out["stat_pooling_ms"] = step_ms(model_kw=dict(pooling_method="StatisticalPooling"))
    out["sgd_ms"] = step_ms(train_kw=dict(assume_full_lengths=True, optimizer="SGD",
                                          weight_decay=0.0))

    # accum=1 at half the samples: 2x this ~= the accum-2 step minus the
    # scan/summation plumbing
    b1 = {k: np.ascontiguousarray(v[:1]) for k, v in
          jax.tree.map(np.asarray, batch).items()}
    out["accum1_ms"] = step_ms(train_kw=dict(assume_full_lengths=True,
                                             gradient_accumulation=1),
                               batch_override=jax.device_put(b1))

    # forward-only components (bf16, unmasked)
    mcfg = ModelConfig(compute_dtype="bfloat16")
    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), mcfg)
    x2 = jax.device_put(batch["inputs"].reshape(g * b, t, 80))

    labels2 = jax.device_put(np.zeros((g * b,), np.int32))
    fwd_full = jax.jit(
        lambda p, s, x: speaker_classifier_apply(
            p, s, x, labels2, 0, mcfg, lengths=None, train=False, rng=None
        )[1].sum()
    )
    out["fwd_loss_ms"] = timed_ms(lambda: fwd_full(params, ms, x2), k1=4, k2=16)
    fwd_conv = jax.jit(lambda p, x: vgg_apply(p, x, None, mcfg)[0].sum())
    out["fwd_conv_ms"] = timed_ms(lambda: fwd_conv(params["vgg"], x2), k1=4, k2=16)

    out = {k: round(v, 2) for k, v in out.items()}
    attributions = {
        "optimizer_adam_vs_sgd_ms": round(out["full_ms"] - out["sgd_ms"], 2),
        "masking_ms": round(out["masked_ms"] - out["full_ms"], 2),
        "attention_pooling_ms": round(out["full_ms"] - out["stat_pooling_ms"], 2),
        "grad_accum_scan_ms": round(out["full_ms"] - 2 * out["accum1_ms"], 2),
        "head_loss_fwd_ms": round(out["fwd_loss_ms"] - out["fwd_conv_ms"], 2),
        "conv_fwd_per_micro_ms": out["fwd_conv_ms"],
    }
    print(json.dumps({"metric": "train_step_itemization",
                      "batch": f"{g}x{b}x{t}", "timings": out,
                      "attributions": attributions,
                      "device": str(jax.devices()[0])}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
