"""Benchmark: training + embedding throughput of the flagship model on TPU.

Flagship = the reference's shipped paper config (VGG4L, kernel 1024, 32
heads, DoubleMHA, emb 400, ~5994 speakers; batch 64 x grad-accum 2, 3.5 s
windows — ``scripts/train.py:263-291`` defaults).

Prints ONE JSON line:
  {"metric": "train_throughput", "value": <audio-seconds/s/chip>,
   "unit": "audio_s/s/chip", "vs_baseline": <ratio>, ...extras}

vs_baseline: the reference publishes no numbers (README links the paper
only). BASELINE.md documents the estimate used here: the identical
architecture costs ~45.6 GFLOP forward per 3.5 s sample (analytic count,
``models/flops.py``), ~137 GFLOP trained; a V100-class GPU at a generous
30% fp32 utilization (4.7 TFLOP/s sustained) gives ~34 samples/s =
~120 audio-seconds/s for the reference implementation. The ratio is our
measured audio-s/s per chip against that estimate.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_BASELINE_AUDIO_S_PER_S = 120.0  # see BASELINE.md
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    if os.environ.get("DMHA_BENCH_HANG_ONCE"):
        # test hook for the watchdog harness: wedge the FIRST attempt
        # (marker file absent), run normally on the retry
        marker = os.environ["DMHA_BENCH_HANG_ONCE"]
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("hung")
            time.sleep(3600)

    if os.environ.get("DMHA_BENCH_FAKE_RESULT"):
        # test hook: emit a canned result without touching jax, so the
        # watchdog harness is testable in seconds
        print(os.environ["DMHA_BENCH_FAKE_RESULT"], flush=True)
        return

    import jax

    smoke = "--smoke" in sys.argv
    if smoke:
        # tiny-model CPU mode: exercises the full bench path (both timing
        # chains, the JSON contract) without TPU access; used by tests and
        # as a fast sanity check of the harness itself
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: repeat bench runs skip the ~2 min
    # flagship-step compile where the backend honors it
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

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
    from functools import partial

    compute_dtype = "bfloat16" if "--f32" not in sys.argv else "float32"
    # The bench batch is fixed full-length 3.5 s windows, so the
    # loader-verified assume_full_lengths fast path (masking ops dropped
    # from the compiled step) is exactly the production configuration for
    # this workload; --masked benches the general masked step instead.
    assume_full = "--masked" not in sys.argv
    model_cfg = ModelConfig(compute_dtype=compute_dtype)
    train_cfg = TrainConfig(assume_full_lengths=assume_full)
    if smoke:
        model_cfg = ModelConfig(
            compute_dtype=compute_dtype, kernel_size=16, heads_number=4,
            embedding_size=32, num_spkrs=64,
        )
        train_cfg = TrainConfig(
            assume_full_lengths=assume_full, batch_size=4, gradient_accumulation=2
        )
    # --large_vocab: the production-scale classifier (VERDICT r1 #4) — the
    # same flagship step with a 100k-speaker AM-Softmax head (reference
    # loss.py:5-52 scaled past what torch DP could fit on one card).
    # --classifier_chunk N additionally benches the memory-bounded chunked
    # CE (ops/chunked_amsoftmax.py) instead of dense logits.
    large_vocab = "--large_vocab" in sys.argv
    if large_vocab:
        import dataclasses

        chunk = 0
        for a in sys.argv:
            if a.startswith("--classifier_chunk="):
                chunk = int(a.split("=", 1)[1])
        model_cfg = dataclasses.replace(
            model_cfg,
            num_spkrs=1024 if smoke else 100_000,
            classifier_chunk=chunk,
        )
    cfg = ExperimentConfig(model=model_cfg, train=train_cfg)
    g, b = cfg.train.gradient_accumulation, cfg.train.batch_size
    t = int(cfg.train.window_size * 100)  # 350 frames = 3.5 s
    window_audio_s = cfg.train.window_size

    params, ms = init_speaker_classifier(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(params, ms, cfg)
    step_fn = make_train_step(cfg, donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "inputs": rng.standard_normal((g, b, t, 80)).astype(np.float32),
        "lengths": np.full((g, b), t, np.int32),
        "labels": rng.integers(0, cfg.model.num_spkrs, (g, b)).astype(np.int32),
    }
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    # Timing method: on relayed/async TPU backends block_until_ready can
    # return before execution completes; only a host read of a result forces
    # a sync, and each sync carries a large constant RPC latency. So: run k
    # chained steps, fetch one scalar, and difference two chain lengths to
    # cancel the latency term.
    def timed_chain(run_one, k):
        t0 = time.perf_counter()
        last = None
        for i in range(k):
            last = run_one(i)
        float(last)  # host fetch -> full sync
        return time.perf_counter() - t0

    # ---- train throughput
    state_box = [state]

    def one_train_step(_i):
        s, m = step_fn(state_box[0], batch, key)
        state_box[0] = s
        return m["loss"]

    timed_chain(one_train_step, 1)  # compile + warm
    k1, k2 = 4, 16
    t_a = timed_chain(one_train_step, k1)
    t_b = timed_chain(one_train_step, k2)
    step_time = max(1e-9, (t_b - t_a) / (k2 - k1))
    steps_per_s = 1.0 / step_time
    train_audio = steps_per_s * g * b * window_audio_s
    train_elapsed = step_time  # per-step
    state = state_box[0]

    # ---- embedding throughput (10 s utterances, batch 16); skipped in
    # large-vocab mode (the head doesn't affect embedding extraction)
    eb, et = (4, 200) if smoke else (16, 1000)
    embed_time = embed_audio = None
    if not large_vocab:
        # resolve the auto kernel flags exactly like the production embed
        # paths (api.py / EmbeddingExtractor) so the bench measures the
        # configuration users actually run
        from doubleattentionspeakerverification_tpu.utils.kernel_auto import (
            resolve_model_kernels,
        )

        embed_cfg = resolve_model_kernels(cfg.model, need_dsp=False)
        embed_fn = jax.jit(partial(get_embedding, cfg=embed_cfg))
        x = rng.standard_normal((eb, et, 80)).astype(np.float32)
        # full-length batch: lengths=None compiles the unmasked forward (same
        # code path the embedding CLI uses for single unpadded utterances);
        # --masked keeps masks
        lens = np.full((eb,), et, np.int32) if not assume_full else None
        x = jax.device_put(x)

        scalar_of = jax.jit(lambda e: e[0, 0])

        def one_embed(_i):
            e = embed_fn(state.params, state.model_state, x, lens)
            return scalar_of(e)

        timed_chain(one_embed, 1)
        # longer chains than the train section: embed steps are ~2x faster,
        # so the same chain lengths leave the latency-corrected difference
        # noisier (20-30% run-to-run spread was observed on the relay at 4/16)
        ek1, ek2 = 8, 40
        e_a = timed_chain(one_embed, ek1)
        e_b = timed_chain(one_embed, ek2)
        embed_time = max(1e-9, (e_b - e_a) / (ek2 - ek1))
        embed_audio = (eb * (et / 100.0)) / embed_time

    # ---- int8 embedding throughput (same 16x10 s workload): the serving
    # fast path (models/quantized.py) quantizes the conv stack to int8 on
    # the MXU; measured with the same two-point timing plus an on-device
    # cosine-parity guard against the fp embeddings just benched
    int8_time = int8_audio = int8_cos_min = None
    if not large_vocab:
        from doubleattentionspeakerverification_tpu.models.quantized import (
            get_embedding_int8,
            quantize_vgg,
        )

        qvgg = quantize_vgg(state.params["vgg"])
        int8_fn = jax.jit(partial(get_embedding_int8, cfg=embed_cfg))

        def one_int8(_i):
            e = int8_fn(state.params, qvgg, state.model_state, x, lens)
            return scalar_of(e)

        timed_chain(one_int8, 1)
        q_a = timed_chain(one_int8, ek1)
        q_b = timed_chain(one_int8, ek2)
        int8_time = max(1e-9, (q_b - q_a) / (ek2 - ek1))
        int8_audio = (eb * (et / 100.0)) / int8_time

        # parity guard: per-row cosine vs the fp path, min over the batch,
        # reduced on device (one scalar fetch)
        import jax.numpy as jnp

        def _cos_min(p, q_p, s_ms):
            a = get_embedding(p, s_ms, x, lens, embed_cfg)
            b_ = get_embedding_int8(p, q_p, s_ms, x, lens, embed_cfg)
            a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
            b_ = b_ / jnp.linalg.norm(b_, axis=-1, keepdims=True)
            return jnp.min(jnp.sum(a * b_, -1))

        int8_cos_min = float(
            jax.jit(_cos_min)(state.params, qvgg, state.model_state)
        )

    # ---- int8 STATIC-scale embedding (same workload): activation scales
    # calibrated on the bench batch and baked in — the fully fused int8
    # program (no per-tensor amax barrier; int8 intermediates; see
    # models/quantized.py). This is the serving configuration
    # `--quantize int8_static` after its first (calibration) batch.
    int8s_time = int8s_audio = int8s_cos_min = None
    if not large_vocab:
        from doubleattentionspeakerverification_tpu.models.quantized import (
            calibrate_int8_scales,
            fold_static_scales,
            get_embedding_int8_static,
        )

        scales = calibrate_int8_scales(qvgg, x, lens, embed_cfg)
        folded = fold_static_scales(qvgg, scales, embed_cfg)
        static_fn = jax.jit(
            lambda p, s_ms, xx, ll: get_embedding_int8_static(
                p, folded, scales[0], s_ms, xx, ll, embed_cfg
            )
        )

        def one_int8s(_i):
            return scalar_of(static_fn(state.params, state.model_state, x, lens))

        timed_chain(one_int8s, 1)
        s_a = timed_chain(one_int8s, ek1)
        s_b = timed_chain(one_int8s, ek2)
        int8s_time = max(1e-9, (s_b - s_a) / (ek2 - ek1))
        int8s_audio = (eb * (et / 100.0)) / int8s_time

        def _cos_min_static(p, s_ms):
            a = get_embedding(p, s_ms, x, lens, embed_cfg)
            b_ = get_embedding_int8_static(p, folded, scales[0], s_ms, x, lens, embed_cfg)
            a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
            b_ = b_ / jnp.linalg.norm(b_, axis=-1, keepdims=True)
            return jnp.min(jnp.sum(a * b_, -1))

        int8s_cos_min = float(
            jax.jit(_cos_min_static)(state.params, state.model_state)
        )

    # ---- end-to-end train: fresh host batches each step, bf16 transfer
    # (the production path: loader -> device copy -> step; proves the copy
    # is hidden / cheap with the reduced transfer dtype). Opt-in: it costs
    # an extra full train-step compile (bf16 input signature).
    e2e_time = e2e_audio = None
    if "--e2e" in sys.argv:
        import ml_dtypes

        host_batches = [
            {
                "inputs": rng.standard_normal((g, b, t, 80)).astype(ml_dtypes.bfloat16),
                "lengths": np.full((g, b), t, np.int32),
                "labels": rng.integers(0, cfg.model.num_spkrs, (g, b)).astype(np.int32),
            }
            for _ in range(4)
        ]
        e2e_state = [state]

        def one_e2e(i):
            s, m = step_fn(e2e_state[0], host_batches[i % 4], key)
            e2e_state[0] = s
            return m["loss"]

        timed_chain(one_e2e, 1)
        z_a = timed_chain(one_e2e, k1)
        z_b = timed_chain(one_e2e, k2)
        e2e_time = max(1e-9, (z_b - z_a) / (k2 - k1))
        e2e_audio = g * b * window_audio_s / e2e_time

    from doubleattentionspeakerverification_tpu.models.flops import (
        forward_flops_per_sample,
        train_flops_per_sample,
    )

    train_tflops = steps_per_s * g * b * train_flops_per_sample(cfg.model, t) / 1e12

    result = {
        "metric": "train_throughput_large_vocab" if large_vocab else "train_throughput",
        "value": round(train_audio, 1),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(train_audio / REFERENCE_BASELINE_AUDIO_S_PER_S, 3),
        "extras": {
            "step_time_ms": round(1000 * step_time, 2),
            "train_samples_per_s": round(steps_per_s * g * b, 1),
            "train_tflops": round(train_tflops, 1),
            "train_mfu": round(train_tflops / V5E_BF16_PEAK_TFLOPS, 3),
            **(
                {
                    "num_spkrs": cfg.model.num_spkrs,
                    "classifier_chunk": cfg.model.classifier_chunk,
                }
                if large_vocab
                else {}
            ),
            **(
                {
                    "embed_audio_s_per_s": round(embed_audio, 1),
                    "embed_tflops": round(
                        (eb / embed_time)
                        * forward_flops_per_sample(cfg.model, et)
                        / 1e12,
                        1,
                    ),
                    "embed_mfu": round(
                        (eb / embed_time)
                        * forward_flops_per_sample(cfg.model, et)
                        / 1e12
                        / V5E_BF16_PEAK_TFLOPS,
                        3,
                    ),
                }
                if embed_time is not None
                else {}
            ),
            **(
                {
                    "embed_int8_audio_s_per_s": round(int8_audio, 1),
                    "embed_int8_tflops": round(
                        (eb / int8_time)
                        * forward_flops_per_sample(cfg.model, et)
                        / 1e12,
                        1,
                    ),
                    # fp-embedding cosine floor across the bench batch; the
                    # serving fast path is only honest if this stays ~1
                    "embed_int8_cos_min": round(int8_cos_min, 5),
                }
                if int8_time is not None
                else {}
            ),
            **(
                {
                    "embed_int8_static_audio_s_per_s": round(int8s_audio, 1),
                    "embed_int8_static_tflops": round(
                        (eb / int8s_time)
                        * forward_flops_per_sample(cfg.model, et)
                        / 1e12,
                        1,
                    ),
                    "embed_int8_static_cos_min": round(int8s_cos_min, 5),
                }
                if int8s_time is not None
                else {}
            ),
            **(
                {
                    "e2e_audio_s_per_s": round(e2e_audio, 1),
                    "e2e_step_time_ms": round(1000 * e2e_time, 2),
                }
                if e2e_time is not None
                else {}
            ),
            "compute_dtype": compute_dtype,
            "kernel_auto": __import__(
                "doubleattentionspeakerverification_tpu.utils.kernel_auto",
                fromlist=["decisions"],
            ).decisions(),
            "batch": f"{g}x{b}x{t}",
            "device": str(jax.devices()[0]),
            **({"smoke": True} if smoke else {}),
        },
    }
    print(json.dumps(result), flush=True)


def _run_with_watchdog() -> int:
    """Run the measurement in a child process with a timeout + retry.

    The relayed TPU backend intermittently wedges inside a backend call
    (observed on first-compiles and even trivial dispatches; a wedged RPC
    cannot be unwound in-process — see Trainer's stall_exit for the same
    issue). A fresh process gets a fresh relay connection, so: kill the
    exact child on timeout and retry. The persistent compilation cache
    makes a post-compile retry cheap. Tunables:
    DMHA_BENCH_ATTEMPTS (default 2), DMHA_BENCH_ATTEMPT_TIMEOUT_S (default
    540). The child prints the single JSON line; the parent forwards it.
    """
    import subprocess

    attempts = int(os.environ.get("DMHA_BENCH_ATTEMPTS", "2"))
    timeout_s = float(os.environ.get("DMHA_BENCH_ATTEMPT_TIMEOUT_S", "540"))
    cmd = [sys.executable, os.path.abspath(__file__), "--inner", *sys.argv[1:]]
    last_err = "no attempts ran"
    for i in range(1, attempts + 1):
        try:
            r = subprocess.run(cmd, stdout=subprocess.PIPE, timeout=timeout_s)
            out = r.stdout.decode(errors="replace")
            line = next(
                (l for l in out.splitlines() if l.startswith('{"metric"')), None
            )
            if r.returncode == 0 and line:
                print(line, flush=True)
                return 0
            last_err = f"exit code {r.returncode}, json line missing"
        except subprocess.TimeoutExpired:
            last_err = f"timed out after {timeout_s:.0f}s (wedged backend call?)"
        print(f"bench attempt {i}/{attempts}: {last_err}", file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv or os.environ.get("DMHA_BENCH_NO_WATCHDOG"):
        sys.argv = [a for a in sys.argv if a != "--inner"]
        main()
    else:
        sys.exit(_run_with_watchdog())
