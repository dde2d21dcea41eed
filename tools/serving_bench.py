"""Serving latency/throughput point for the MicroBatcher on real hardware.

Measures the micro-batched embedding service (serving.py) with the flagship
model: N client threads issue requests of mixed utterance lengths for a
fixed duration; reports p50/p90/p99 latency, requests/s, audio-s/s, and the
batching ratio. One JSON line, mirroring bench.py's contract.

  python tools/serving_bench.py                  # flagship model, ~2 min compile/bucket
  python tools/serving_bench.py --smoke          # tiny model on CPU (harness check)

NOTE (this environment): the axon relay adds ~26 ms RPC latency per host
read — per-request latency here is relay-dominated; on a directly-attached
TPU the same dispatch costs microseconds. Throughput is the honest number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--pipeline", type=int, default=2,
                    help="overlapping in-flight forwards (MicroBatcher pipeline depth)")
    ap.add_argument("--quantize", type=str, default="none", choices=["none", "int8"],
                    help="serve the int8 conv encoder (cli/serve.py --quantize int8)")
    ap.add_argument("--ab_pending", type=int, default=0,
                    help="same-session A/B: run one unbounded phase, then one "
                         "phase with max_pending set to this value; reports "
                         "both (relay sessions drift, so the comparison must "
                         "stay in one process)")
    ap.add_argument("--max_pending", type=int, default=0,
                    help="admission bound (0 = unbounded): shed requests get "
                         "an immediate ServerOverloaded; clients here back "
                         "off 20 ms and retry, and the shed count is reported")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    # persistent compilation cache: sweep runs (e.g. pipeline {1,2,4}) skip
    # the multi-bucket flagship compiles after the first invocation
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from doubleattentionspeakerverification_tpu.api import SpeakerEmbeddingModel
    from doubleattentionspeakerverification_tpu.config import (
        ExperimentConfig,
        ModelConfig,
    )
    from doubleattentionspeakerverification_tpu.serving import (
        MicroBatcher,
        ServerOverloaded,
    )

    if args.smoke:
        cfg = ExperimentConfig(
            model=ModelConfig(kernel_size=16, heads_number=4,
                              embedding_size=16, num_spkrs=4)
        )
        buckets = (64, 128, 256)
        lengths = [40, 100, 200]
    else:
        cfg = ExperimentConfig()  # flagship
        buckets = (200, 350, 500, 1000)
        lengths = [150, 300, 350, 480, 800, 1000]  # 1.5 s - 10 s utterances

    model = SpeakerEmbeddingModel.from_random_init(cfg, seed=0, quantize=args.quantize)
    batcher = MicroBatcher(
        model, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        buckets=buckets, pipeline=args.pipeline,
        max_pending=args.max_pending,
    )
    rng0 = np.random.default_rng(0)
    feats = {
        t: rng0.standard_normal((t, 80)).astype(np.float32) for t in lengths
    }

    try:
        # compile every bucket before timing; warmup() also resets the
        # request/forward counters so warm-up traffic doesn't skew the
        # reported batching ratio
        batcher.warmup(lengths)

        def run_phase(seconds: float) -> dict:
            stop_at = time.perf_counter() + seconds
            lat, audio, lock = [], [0.0], threading.Lock()
            errors = []

            def client(tid):
                rng = np.random.default_rng(tid)
                while time.perf_counter() < stop_at:
                    t = int(rng.choice(lengths))
                    t0 = time.perf_counter()
                    try:
                        batcher.embed(feats[t], timeout=120)
                    except ServerOverloaded:
                        time.sleep(0.02)  # Retry-After analog
                        continue
                    except Exception as e:
                        errors.append(repr(e))
                        return
                    dt = time.perf_counter() - t0
                    with lock:
                        lat.append(dt)
                        audio[0] += t / 100.0

            shed0 = batcher.stats()["shed"]
            t_start = time.perf_counter()
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(args.threads)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=seconds + 300)
            elapsed = time.perf_counter() - t_start
            if errors:
                raise RuntimeError(errors[:3])
            ls = np.sort(lat)
            s = batcher.stats()
            return {
                "audio_s_per_s": round(audio[0] / elapsed, 1),
                "requests_per_s": round(len(ls) / elapsed, 1),
                "p50_ms": round(1e3 * float(ls[len(ls) // 2]), 1),
                "p90_ms": round(1e3 * float(ls[int(len(ls) * 0.9)]), 1),
                "p99_ms": round(1e3 * float(ls[int(len(ls) * 0.99)]), 1),
                "n_requests": len(ls),
                "shed": s["shed"] - shed0,
                "max_pending": batcher.max_pending,
            }

        phases = {}
        if args.ab_pending:
            # same-session A/B (relay sessions drift ~25%, so the shed
            # comparison must not span processes): unbounded, then bounded
            batcher.max_pending = 0
            phases["unbounded"] = run_phase(args.seconds)
            batcher.max_pending = args.ab_pending
            phases["bounded"] = run_phase(args.seconds)
            main_phase = phases["bounded"]
        else:
            main_phase = run_phase(args.seconds)

        result = {
            "metric": "serve_throughput",
            "value": main_phase["audio_s_per_s"],
            "unit": "audio_s/s/chip",
            "extras": {
                **main_phase,
                "threads": args.threads,
                "batched_ratio": round(
                    batcher.stats()["requests"]
                    / max(1, batcher.stats()["forwards"]), 2
                ),
                "max_batch": args.max_batch,
                "max_wait_ms": args.max_wait_ms,
                "pipeline": args.pipeline,
                "quantize": args.quantize,
                "device": str(jax.devices()[0]),
                **({"ab": phases} if phases else {}),
                **({"smoke": True} if args.smoke else {}),
            },
        }
        print(json.dumps(result), flush=True)
        return 0
    except RuntimeError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    finally:
        batcher.close()


if __name__ == "__main__":
    raise SystemExit(main())
