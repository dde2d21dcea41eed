"""End-to-end training-throughput soak (BASELINE.md methodology, one command).

Generates a synthetic 64-speaker wav corpus, runs the REAL train CLI for N
optimizer steps at the flagship config (VGG4L k=1024, H=32, emb 400) through
the full pipeline — loader -> host DSP/cache -> transfer -> jitted step ->
periodic async EER validation -> checkpoints — and reports throughput
parsed from the trainer's own metrics JSONL plus the wall-clock number that
includes everything.

  python tools/e2e_soak.py --mode hostdsp --steps 400
  python tools/e2e_soak.py --mode features --steps 400   # offline pickles
  python tools/e2e_soak.py --mode pcm --steps 400        # int16 waves + device DSP

Modes map to BASELINE.md's three e2e rows. The corpus persists under
--workdir and is reused across runs. Output: one JSON line.

NOTE (this environment): relay-session throughput varies ~2x run-to-run;
compare medians of repeated runs, not single numbers (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

STEP_CEILING_AUDIO_S = 4150.0  # bench.py jitted-step ceiling, r1/r2 measured

# One source of truth for the soak's training shape: used both to build the
# train CLI argv and in the throughput/ceiling formulas below — editing one
# without the other would silently skew pct_of_session_ceiling.
BATCH = 64
ACCUM = 2
WINDOW_S = 3.5


def make_corpus(root: str, n_speakers=64, per_speaker=20, seconds=4.0, sr=16000):
    """FM-sweep speakers (CMN-surviving — rationale in examples/
    example_corpus.py, whose generator this reuses) with a denser frequency
    schedule so 64 classes stay separable; seeded, reused across runs."""
    from examples.example_corpus import make_wavs

    stamp = os.path.join(root, ".corpus_ok")
    if os.path.exists(stamp):
        return
    make_wavs(
        root, n_speakers=n_speakers, per_speaker=per_speaker, seconds=seconds,
        sr=sr,
        freq_plan=lambda spk: (120.0 + 3.5 * spk, 1.5 + 0.11 * spk,
                               40.0 + 1.6 * spk),
        name_fmt="spk{spk:03d}_utt{utt:03d}.wav",
    )
    with open(stamp, "w") as f:
        f.write("ok")


def write_indexes(workdir: str, wav_dir: str, n_speakers=64, per_speaker=20):
    names = [
        f"spk{s:03d}_utt{i:03d}" for s in range(n_speakers) for i in range(per_speaker)
    ]
    labels = [s for s in range(n_speakers) for _ in range(per_speaker)]
    with open(os.path.join(workdir, "labels.ndx"), "w") as f:
        f.writelines(f"{n} {l} -1\n" for n, l in zip(names, labels))
    with open(os.path.join(workdir, "clients.ndx"), "w") as f:
        for s in range(32):
            f.write(f"spk{s:03d}_utt000 spk{s:03d}_utt001\n")
    with open(os.path.join(workdir, "impostors.ndx"), "w") as f:
        for s in range(32):
            f.write(f"spk{s:03d}_utt000 spk{(s + 7) % n_speakers:03d}_utt002\n")


def extract_pickles(wav_dir: str, workdir: str):
    stamp = os.path.join(wav_dir, ".pickles_ok")
    if os.path.exists(stamp):
        return
    lst = os.path.join(workdir, "files.lst")
    with open(lst, "w") as f:
        f.writelines(
            os.path.join(wav_dir, n) + "\n"
            for n in sorted(os.listdir(wav_dir))
            if n.endswith(".wav")
        )
    rc = subprocess.run(
        [sys.executable, "-m",
         "doubleattentionspeakerverification_tpu.cli.extract_features", "-i", lst],
        cwd=REPO,
    ).returncode
    if rc != 0:
        raise RuntimeError("feature extraction failed")
    with open(stamp, "w") as f:
        f.write("ok")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["features", "hostdsp", "pcm", "auto"],
                    default="hostdsp")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--workdir", default="/tmp/dmha_soak")
    ap.add_argument("--per_speaker", type=int, default=20,
                    help="utterances per speaker (20 -> 1280 files, the "
                         "BASELINE.md corpus; larger amortizes the 10-step "
                         "epoch pipeline restarts of the small corpus)")
    ap.add_argument("--validate_every", type=int, default=50)
    ap.add_argument("--print_every", type=int, default=10)
    ap.add_argument("--sync_validation", action="store_true",
                    help="disable the async-validation overlap (for A/B)")
    ap.add_argument("--assume_full_lengths", action="store_true",
                    help="loader-verified full-window fast path (valid here: "
                         "every soak utterance exceeds the train window)")
    ap.add_argument("--device_prefetch", type=int, default=0)
    ap.add_argument("--timeout_s", type=int, default=3000)
    ap.add_argument("--attempts", type=int, default=3,
                    help="retries for runs the stall watchdog killed before "
                         "step 1 (the relay sometimes wedges on the first "
                         "device call; rc=17, CLAUDE.md)")
    args = ap.parse_args()

    n_files = 64 * args.per_speaker
    wav_dir = os.path.join(args.workdir, f"wavs_{args.per_speaker}")
    os.makedirs(args.workdir, exist_ok=True)
    make_corpus(wav_dir, per_speaker=args.per_speaker)
    write_indexes(args.workdir, wav_dir, per_speaker=args.per_speaker)
    if args.mode == "features":
        extract_pickles(wav_dir, args.workdir)

    # e.g. 1280 files / (64 batch x 2 accum) = 10 optimizer steps per epoch
    steps_per_epoch = n_files // (BATCH * ACCUM)
    epochs = -(-args.steps // steps_per_epoch)
    out_dir = os.path.join(args.workdir, f"out_{args.mode}_{int(time.time())}")

    cli = [
        sys.executable, "-m", "doubleattentionspeakerverification_tpu.cli.train",
        "--train_data_dir", wav_dir,
        "--valid_data_dir", wav_dir,
        "--train_labels_path", os.path.join(args.workdir, "labels.ndx"),
        "--valid_clients", os.path.join(args.workdir, "clients.ndx"),
        "--valid_impostors", os.path.join(args.workdir, "impostors.ndx"),
        "--out_dir", out_dir, "--model_name", "soak",
        # flagship model (defaults: VGG4L kernel 1024, 32 heads, emb 400)
        "--window_size", str(WINDOW_S), "--batch_size", str(BATCH),
        "--gradientAccumulation", str(ACCUM),
        "--max_epochs", str(epochs),
        "--validate_every", str(args.validate_every),
        "--print_every", str(args.print_every),
        "--checkpoint_every", "100",
        "--stall_exit_s", "600",
        # measure THIS session's isolated-step ceiling after training: relay
        # sessions drift ~25% run-to-run, so pct-of-ceiling must be computed
        # against the same session, not a stored constant
        "--post_step_bench", "16",
    ]
    if args.sync_validation:
        cli.append("--sync_validation")
    if args.assume_full_lengths:
        cli.append("--assume_full_lengths")
    if args.device_prefetch:
        cli += ["--device_prefetch", str(args.device_prefetch)]
    if args.mode == "features":
        cli += ["--data_source", "features", "--transfer_dtype", "bfloat16"]
    elif args.mode == "hostdsp":
        cli += ["--data_source", "wav", "--host_dsp", "--transfer_dtype", "bfloat16",
                "--feature_cache_mb", "2048"]
    elif args.mode == "auto":
        # plain wav: the one-shot host probe picks the concrete path
        # (config.py:auto_wav_mode) — the production default a migrating
        # user hits with nothing but --data_source wav
        cli += ["--data_source", "wav", "--transfer_dtype", "bfloat16"]
    else:  # pcm: int16 waves to the device, DSP on-chip (pallas auto-gates)
        cli += ["--data_source", "wav", "--transfer_dtype", "int16",
                "--wav_mode", "pcm"]

    result = run_training(cli, out_dir, args)
    if result is None:
        return 1

    # The trainer emits a one-shot `perf_hint` when step dispatch is paying
    # the host->device batch transfer synchronously (some relay sessions do;
    # CLAUDE.md) — a background transfer thread recovers ~10 points of step
    # ceiling (BASELINE.md r3: 72.8% -> 83.4%, recovered manually then).
    # Auto-retry with --device_prefetch 2 so the soak RECORDS the
    # best-achievable number for the session, keeping both measurements.
    if result.pop("_perf_hint_fired", False) and args.device_prefetch == 0:
        print(json.dumps({"note": "perf_hint fired; retrying with "
                                  "--device_prefetch 2"}), file=sys.stderr)
        retry = run_training(
            cli + ["--device_prefetch", "2"],
            os.path.join(args.workdir, f"out_{args.mode}_pf_{int(time.time())}"),
            args,
        )
        if retry is not None:
            retry.pop("_perf_hint_fired", None)
            # report the BETTER run (judged against each run's own session
            # ceiling — sessions drift) as the primary result: prefetch
            # recovered ~10 pts in r3 sessions but measured slightly slower
            # in an r4 session, so neither direction is assumed
            key = lambda r: (r.get("pct_of_session_ceiling")
                             or r["median_audio_s_per_s"])
            best, other = ((retry, result) if key(retry) >= key(result)
                           else (result, retry))
            best["alternate"] = {
                "device_prefetch": other["device_prefetch"],
                **{k: other[k]
                   for k in ("median_audio_s_per_s", "pct_of_session_ceiling",
                             "session_step_ms", "wallclock_audio_s_per_s")},
            }
            best["perf_hint"] = ("dispatch paid the transfer synchronously; "
                                 "auto-retried with --device_prefetch 2 and "
                                 "kept the faster run")
            result = best
    print(json.dumps(result))
    return 0


def run_training(cli, base_out, args):
    """One soak run (with relay-wedge retries): returns the parsed result
    dict, or None after persistent failure. ``_perf_hint_fired`` marks runs
    whose trainer detected synchronous-transfer dispatch."""
    cli = list(cli)
    for attempt in range(max(1, args.attempts)):
        out_dir = base_out if attempt == 0 else f"{base_out}_retry{attempt}"
        cli[cli.index("--out_dir") + 1] = out_dir
        t0 = time.time()
        try:
            proc = subprocess.run(cli, cwd=REPO, timeout=args.timeout_s)
        except subprocess.TimeoutExpired:
            # treat like a watchdog kill: retry in a fresh process
            proc = subprocess.CompletedProcess(cli, returncode=17)
        wall = time.time() - t0
        if proc.returncode == 0:
            break
        # rc 17 = stall-watchdog exit; before step 1 it's the known relay
        # first-call wedge — a fresh process (fresh relay connection) retries
        print(json.dumps({"error": f"train CLI rc={proc.returncode}",
                          "attempt": attempt}), file=sys.stderr)
        if proc.returncode != 17:
            break
    if proc.returncode != 0:
        print(json.dumps({"error": f"train CLI rc={proc.returncode}"}))
        return None

    jsonl = [f for f in os.listdir(out_dir) if f.endswith("_metrics.jsonl")]
    events = [json.loads(l) for l in open(os.path.join(out_dir, jsonl[0]))]
    train = [e for e in events if e["event"] == "train"]
    eers = [e["eer"] for e in events if e["event"] == "validate" and "eer" in e]
    bench = [e for e in events if e["event"] == "step_bench"]
    session_step_ms = bench[-1]["ms_per_step"] if bench else None
    session_ceiling = (
        BATCH * ACCUM * WINDOW_S / (session_step_ms / 1e3) if session_step_ms else None
    )
    tput = np.array([e["audio_s_per_s"] for e in train])
    warm = tput[2:] if len(tput) > 4 else tput  # drop compile windows
    total_steps = int(train[-1]["step"]) if train else 0
    # train-loop wall-clock: first train print -> last event. The first
    # window absorbs the compiles, so count only the audio-seconds of the
    # steps after it (validations + checkpoints stay included).
    steady_steps = total_steps - (int(train[0]["step"]) if train else 0)
    total_audio_s = steady_steps * BATCH * ACCUM * WINDOW_S
    span = events[-1]["time"] - train[0]["time"] if train else wall
    return {
        "metric": "e2e_train_throughput",
        "mode": args.mode,
        "steps": total_steps,
        "median_audio_s_per_s": round(float(np.median(warm)), 1),
        "p10": round(float(np.percentile(warm, 10)), 1),
        "p90": round(float(np.percentile(warm, 90)), 1),
        "wallclock_audio_s_per_s": round(total_audio_s / span, 1),
        "pct_of_step_ceiling": round(
            100.0 * float(np.median(warm)) / STEP_CEILING_AUDIO_S, 1
        ),
        # vs the ceiling measured in the SAME relay session (post_step_bench)
        "session_step_ms": session_step_ms,
        "pct_of_session_ceiling": (
            round(100.0 * float(np.median(warm)) / session_ceiling, 1)
            if session_ceiling
            else None
        ),
        "final_acc": train[-1]["accuracy"] if train else None,
        "eers": eers,
        "sync_validation": bool(args.sync_validation),
        "total_wall_s": round(wall, 1),
        "device_prefetch": (
            int(cli[cli.index("--device_prefetch") + 1])
            if "--device_prefetch" in cli else 0
        ),
        "_perf_hint_fired": any(e["event"] == "perf_hint" for e in events),
    }


if __name__ == "__main__":
    raise SystemExit(main())
