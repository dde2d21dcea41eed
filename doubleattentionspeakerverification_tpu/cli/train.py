"""Training CLI (reference ``scripts/train.py:251-305``).

Flag names mirror the reference so its users can bring their launch scripts
over; everything maps onto the typed ExperimentConfig, which is written to
``{out_dir}/{model_name}_config.json`` at startup (the reference pickles the
argparse Namespace, ``train.py:302-303``).
"""

from __future__ import annotations

import argparse
import os

from ..config import (
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    count_speakers,
)
from ..training.trainer import Trainer
from ..utils.logging import MetricLogger


def build_config(params: argparse.Namespace) -> ExperimentConfig:
    num_spkrs = count_speakers(params.train_labels_path)
    print(f"{num_spkrs} Speaker Labels")
    cfg = ExperimentConfig(
        model_name=params.model_name,
        out_dir=params.out_dir,
        model=ModelConfig(
            front_end=params.front_end,
            kernel_size=params.kernel_size,
            embedding_size=params.embedding_size,
            heads_number=params.heads_number,
            pooling_method=params.pooling_method,
            mask_prob=params.mask_prob,
            num_spkrs=num_spkrs,
            scaling_factor=params.scalingFactor,
            margin_factor=params.marginFactor,
            annealing=params.annealing,
            compute_dtype=params.compute_dtype,
            use_pallas_dsp=params.use_pallas_dsp,
            use_pallas_pooling=params.use_pallas_pooling,
            classifier_chunk=params.classifier_chunk,
        ),
        train=TrainConfig(
            window_size=params.window_size,
            random_slicing=params.randomSlicing,
            normalization=params.normalization,
            optimizer=params.optimizer,
            criterion=params.criterion,
            focal_gamma=params.focal_gamma,
            learning_rate=params.learning_rate,
            weight_decay=params.weight_decay,
            batch_size=params.batch_size,
            gradient_accumulation=params.gradientAccumulation,
            max_epochs=params.max_epochs,
            early_stopping=params.early_stopping,
            print_every=params.print_every,
            validate_every=params.validate_every,
            checkpoint_every=params.checkpoint_every,
            checkpoint_backend=params.checkpoint_backend,
            checkpoint_async=params.checkpoint_async,
            preempt_sync_every=params.preempt_sync_every,
            valid_long_audio=params.valid_long_audio,
            seed=params.seed,
            transfer_dtype=params.transfer_dtype,
            device_prefetch=params.device_prefetch,
            stall_exit_s=params.stall_exit_s,
            assume_full_lengths=params.assume_full_lengths,
            profile_dir=params.profile_dir,
            profile_start_step=params.profile_start_step,
            profile_steps=params.profile_steps,
            async_validation=not params.sync_validation,
            shard_validation=params.shard_validation,
            post_step_bench=params.post_step_bench,
            specaugment=params.specaugment,
            specaugment_time_masks=params.specaugment_time_masks,
            specaugment_time_width=params.specaugment_time_width,
            specaugment_freq_masks=params.specaugment_freq_masks,
            specaugment_freq_width=params.specaugment_freq_width,
        ),
        data=DataConfig(
            train_data_dir=params.train_data_dir,
            valid_data_dir=params.valid_data_dir,
            train_labels_path=params.train_labels_path,
            valid_clients=params.valid_clients,
            valid_impostors=params.valid_impostors,
            source=params.data_source,
            host_dsp=params.host_dsp,
            wav_mode=params.wav_mode,
            num_workers=params.num_workers,
            valid_feature_cache_mb=params.valid_feature_cache_mb,
            train_feature_cache_mb=params.feature_cache_mb,
            train_feature_cache_dir=params.feature_cache_dir,
        ),
        mesh=MeshConfig(model_axis=params.model_parallel),
    )
    return cfg


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train a VGG + attention-pooling speaker embedding extractor (TPU-native)."
    )
    parser.add_argument("--train_data_dir", type=str, default="")
    parser.add_argument("--valid_data_dir", type=str, default="")
    parser.add_argument("--train_labels_path", type=str, default="labels/Vox2.ndx")
    parser.add_argument("--valid_clients", type=str, default="labels/clients.ndx")
    parser.add_argument("--valid_impostors", type=str, default="labels/impostors.ndx")
    parser.add_argument("--out_dir", type=str, default="./models/model1")
    parser.add_argument("--model_name", type=str, default="CNN")
    parser.add_argument("--front_end", type=str, default="VGG4L", choices=["VGG3L", "VGG4L"])
    # network
    parser.add_argument("--window_size", type=float, default=3.5)
    parser.add_argument("--randomSlicing", action="store_true")
    parser.add_argument("--normalization", type=str, default="cmn", choices=["cmn", "cmvn"])
    parser.add_argument("--kernel_size", type=int, default=1024)
    parser.add_argument("--embedding_size", type=int, default=400)
    parser.add_argument("--heads_number", type=int, default=32)
    parser.add_argument("--pooling_method", type=str, default="DoubleMHA",
                        choices=["Attention", "MHA", "DoubleMHA", "StatisticalPooling"])
    parser.add_argument("--mask_prob", type=float, default=0.3)
    # AM-Softmax
    parser.add_argument("--scalingFactor", type=float, default=30.0)
    parser.add_argument("--marginFactor", type=float, default=0.4)
    parser.add_argument("--annealing", action="store_true")
    # optimization
    parser.add_argument("--optimizer", type=str, default="Adam", choices=["Adam", "SGD", "RMSprop"])
    parser.add_argument("--criterion", type=str, default="cross_entropy",
                        choices=["cross_entropy", "focal"],
                        help="loss criterion; 'focal' activates the reference's "
                             "dead FocalSoftmax semantics (loss.py:54-70)")
    parser.add_argument("--focal_gamma", type=float, default=2.0)
    # Parsed-but-unused in the reference (train.py:258); accepted here so
    # reference invocations are drop-in.
    parser.add_argument("--data_mode", type=str, default="normal")
    parser.add_argument("--learning_rate", type=float, default=0.0001)
    parser.add_argument("--weight_decay", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--gradientAccumulation", type=int, default=2)
    parser.add_argument("--max_epochs", type=int, default=1000000)
    parser.add_argument("--early_stopping", type=int, default=25)
    parser.add_argument("--print_every", type=int, default=1000)
    parser.add_argument("--requeue", action="store_true")
    parser.add_argument("--resume_step", type=int, default=None,
                        help="resume from the checkpoint at this exact "
                             "optimizer step instead of the newest")
    parser.add_argument("--validate_every", type=int, default=10000)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--valid_feature_cache_mb", type=float, default=512.0,
                        help="host RAM budget for caching validation features "
                             "across validation rounds (0 disables)")
    # TPU-native extensions
    parser.add_argument("--data_source", type=str, default="features", choices=["features", "wav"],
                        help="'features': reference-format pickles; 'wav': on-device log-mel")
    parser.add_argument("--compute_dtype", type=str, default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="shards of the AM-Softmax classifier over the mesh 'model' axis")
    parser.add_argument("--feature_cache_mb", type=float, default=0.0,
                        help="wav mode: RAM budget (MB) for the compute-once "
                        "full-utterance feature cache; steady-state epochs then "
                        "re-window cached frames like the reference's offline-"
                        "features pipeline (0 = recompute DSP every window)")
    parser.add_argument("--feature_cache_dir", type=str, default="",
                        help="wav mode: disk tier for the feature cache — "
                        "reference-format pickles, reusable as a features dir")
    parser.add_argument("--host_dsp", action="store_true",
                        help="wav mode: compute log-mel on the host (fused native C++ "
                             "kernel when built) and ship bf16/f32 feature frames instead "
                             "of PCM — ~2x fewer host->device bytes")
    parser.add_argument("--wav_mode", type=str, default="auto",
                        choices=["auto", "pcm", "host_dsp", "cache", "explicit"],
                        help="wav mode selection when neither --host_dsp nor a "
                             "--feature_cache_* flag is given (those always win): "
                             "'auto' probes this host (cores + free RAM) and picks "
                             "the fastest path, logging the decision; or force "
                             "'pcm' / 'host_dsp' / 'cache'")
    parser.add_argument("--use_pallas_dsp", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="fused pallas log-mel kernel for the wav path (~2x DSP). "
                        "Unset = auto: on for TPU backends after a parity self-check")
    parser.add_argument("--use_pallas_pooling", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="fused pallas attention-pooling kernel. Unset = auto: "
                        "on for TPU backends after a fwd+bwd parity self-check")
    parser.add_argument("--classifier_chunk", type=int, default=0,
                        help=">0: scan the AM-Softmax W in class chunks of this size "
                             "(memory-bounded CE for very large speaker counts)")
    parser.add_argument("--checkpoint_every", type=int, default=0)
    parser.add_argument("--checkpoint_backend", type=str, default="npz",
                        choices=["npz", "orbax"],
                        help="'orbax' writes sharded checkpoint dirs (each "
                             "host persists only its own shards)")
    parser.add_argument("--checkpoint_async", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="periodic saves block only for the device->host "
                             "snapshot; disk IO runs off the train loop "
                             "(best-EER saves always block). "
                             "--no-checkpoint_async = fully synchronous")
    parser.add_argument("--valid_long_audio", type=str, default="chunk",
                        choices=["chunk", "pad"],
                        help="validation utterances beyond 2x the largest "
                             "bucket: 'chunk' = bounded-compile centroid "
                             "embedding; 'pad' = exact reference full-length "
                             "semantics (one compile per distinct length)")
    parser.add_argument("--preempt_sync_every", type=int, default=10,
                        help="multi-host: agree on a SIGTERM graceful-stop "
                             "verdict every N steps (one tiny collective); "
                             "single-host checks the flag every step free")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--stall_exit_s", type=float, default=0.0,
                        help="exit(17) after this many seconds without a "
                             "completed step (0=log only); pair with "
                             "--requeue under a restarting scheduler")
    parser.add_argument("--device_prefetch", type=int, default=0,
                        help="batches pushed to the device by a background "
                             "thread; set >0 on backends whose device_put "
                             "blocks (overlaps host->device copy with compute)")
    parser.add_argument("--transfer_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int16"],
                        help="host->device batch payload dtype (bfloat16 for "
                             "features / int16 for wavs halves transfer bytes)")
    parser.add_argument("--tensorboard_dir", type=str, default="",
                        help="write TensorBoard scalar event files (loss, "
                             "accuracy, EER, LR, throughput) to this logdir "
                             "(zero-dependency writer, utils/tensorboard.py); "
                             "empty = off")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler device trace of a window "
                             "of steps to this directory (view in XProf/"
                             "TensorBoard or Perfetto); empty = off")
    parser.add_argument("--profile_start_step", type=int, default=10,
                        help="first optimizer step of the trace window "
                             "(default 10: past compile + warmup)")
    parser.add_argument("--profile_steps", type=int, default=5,
                        help="number of steps to trace")
    parser.add_argument("--assume_full_lengths", action="store_true",
                        help="all training windows are full-length: drop masking "
                             "from the compiled step (~3%% faster)")
    parser.add_argument("--post_step_bench", type=int, default=0,
                        help="after training, chain N jitted steps on a "
                             "device-resident batch and log this session's "
                             "isolated-step ms (step_bench event)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host training: call jax.distributed."
                             "initialize() before building the trainer. "
                             "Coordinator/topology come from the flags below "
                             "or the standard env vars (JAX_COORDINATOR_"
                             "ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; "
                             "auto-populated on Cloud TPU VMs and slurm). "
                             "Implied when JAX_COORDINATOR_ADDRESS is set. "
                             "Requires --checkpoint_backend orbax")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (multi-host)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--shard_validation", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="multi-host: partition the validation utterance "
                             "set across processes (each host embeds only its "
                             "shard; embeddings all-gathered; identical EER "
                             "everywhere). --no-shard_validation = every host "
                             "embeds the full set. Ignored single-host")
    parser.add_argument("--sync_validation", action="store_true",
                        help="run EER validation serially (reference behavior); "
                        "default overlaps it with training in a background "
                        "thread over a params snapshot")
    parser.add_argument("--specaugment", action="store_true",
                        help="SpecAugment time/frequency masking on the feature "
                             "windows inside the jitted step (not in the "
                             "reference; off by default)")
    parser.add_argument("--specaugment_time_masks", type=int, default=2)
    parser.add_argument("--specaugment_time_width", type=int, default=30)
    parser.add_argument("--specaugment_freq_masks", type=int, default=2)
    parser.add_argument("--specaugment_freq_width", type=int, default=10)
    return parser


def main(argv=None) -> int:
    # diagnosability: SIGUSR1 dumps all thread stacks to stderr (pairs with
    # the stall watchdog — a hung run can be inspected without killing it)
    import faulthandler
    import signal

    try:
        faulthandler.enable()
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    except Exception:
        pass

    # persistent compilation cache: repeat runs of the same config skip the
    # multi-minute flagship-step compile (honored where the backend supports
    # it; JAX_COMPILATION_CACHE_DIR overrides the location)
    import jax as _jax

    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    os.path.join(os.path.expanduser("~"), ".cache", "dmha_jax_cache"),
                ),
            )
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    params = make_parser().parse_args(argv)

    # Multi-host: connect the processes BEFORE any device use (the trainer's
    # first device call must already see the global mesh). initialize() is a
    # no-op single-host, so calling it unconditionally when asked is safe.
    host_id, num_hosts = 0, 1
    if params.distributed or params.coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        from ..parallel.distributed import initialize

        info = initialize(
            coordinator_address=params.coordinator_address,
            num_processes=params.num_processes,
            process_id=params.process_id,
            force=params.distributed,
        )
        host_id, num_hosts = info.host_id, info.num_hosts

    cfg = build_config(params)
    os.makedirs(cfg.out_dir, exist_ok=True)
    name = cfg.derived_model_name()
    if host_id == 0:
        with open(os.path.join(cfg.out_dir, f"{name}_config.json"), "w") as f:
            f.write(cfg.to_json())

    # one JSONL/console stream per run: non-zero hosts train the same global
    # program and would duplicate every event
    if host_id == 0:
        logger = MetricLogger(
            jsonl_path=os.path.join(cfg.out_dir, f"{name}_metrics.jsonl"),
            tensorboard_dir=params.tensorboard_dir or None,
        )
    else:
        logger = MetricLogger(stream=open(os.devnull, "w"))
    # Graceful preemption: SIGTERM (TPU-pod preemption notice, slurm
    # timeout) requests a coordinated checkpoint-and-exit instead of dying
    # mid-epoch (trainer.request_stop -> agreed step boundary -> finalized
    # checkpoint -> exit 0; --requeue then continues with ~0 lost steps).
    # Installed BEFORE construction so a signal during the first compile is
    # not lost; SIGINT keeps its default (Ctrl-C = hard stop).
    stop_box: dict = {}

    def _on_sigterm(signum, frame):
        t = stop_box.get("trainer")
        if t is not None:
            t.request_stop("SIGTERM")
        else:
            stop_box["early"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except (ValueError, OSError):
        pass  # non-main thread / restricted environment

    trainer = Trainer(cfg, logger=logger, host_id=host_id, num_hosts=num_hosts)
    stop_box["trainer"] = trainer
    if stop_box.get("early"):
        trainer.request_stop("SIGTERM (during construction)")
    if params.resume_step is not None:
        if not trainer.resume(step=params.resume_step):
            print(f"no checkpoint at step {params.resume_step} in {cfg.out_dir}")
            return 1
    elif params.requeue:
        trainer.resume()
    try:
        trainer.train()
    finally:
        logger.close()  # flush + release the JSONL fh and TB event file
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
