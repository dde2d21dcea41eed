"""Training orchestration (reference ``Trainer``, ``scripts/train.py:19-235``).

Control flow kept from the reference: epoch loop, periodic loss/accuracy
prints, EER validation every ``validate_every`` optimizer steps, best-EER
checkpointing + early stopping, LR halving per ``lr_halving_patience``
stagnant validations at epoch end (Adam/SGD only — RMSprop excluded like
``train.py:90-95``), requeue-style resume.

Redesigned around TPU execution: the whole optimizer step (grad-accum scan
included) is one jitted XLA program; validation embeds unique utterances in
bucketed batches with caching instead of per-trial batch-of-1 forwards.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, Optional

import jax
import numpy as np

from ..config import ExperimentConfig
from ..data.dataset import FeaturePickleSource, TrainLoader, WavSource
from ..data.manifest import load_train_manifest, load_trials
from ..evaluation.embeddings import (
    EmbeddingExtractor,
    FeatureCache,
    pickle_feature_loader,
    validate_eer,
)
from ..models.classifier import get_embedding, init_speaker_classifier
from ..utils.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    load_checkpoint,
    prune_checkpoints,
)
from ..utils.logging import MetricLogger
from .optimizers import get_lr, with_lr
from .step import TrainState, init_train_state, make_train_step


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        logger: Optional[MetricLogger] = None,
        host_id: Optional[int] = None,
        num_hosts: Optional[int] = None,
    ):
        self.cfg = cfg
        self.log = logger or MetricLogger()
        # default to the jax.distributed process topology: after
        # parallel.distributed.initialize() a Trainer is multi-host-aware
        # with no extra arguments (cli/train.py --distributed path)
        self.host_id = jax.process_index() if host_id is None else host_id
        self.num_hosts = jax.process_count() if num_hosts is None else num_hosts
        self.model_name = cfg.derived_model_name()
        if self.num_hosts > 1 and cfg.train.checkpoint_backend != "orbax":
            # npz gathers every leaf to one host — impossible once shards
            # live on other processes' devices
            raise ValueError(
                "multi-host training requires checkpoint_backend='orbax' "
                "(npz checkpoints host-gather; pass --checkpoint_backend orbax)"
            )

        # Stall detection must cover CONSTRUCTION too: on relayed backends a
        # wedged RPC has been observed inside the very first device call
        # (param init / kernel-gate compile), before the train loop's beats
        # begin — a watchdog started in train() never fires for those.
        self._watchdog = self._make_watchdog().start()

        # remember what the USER asked for: the multi-host broadcast below
        # replaces 'auto' with the concrete mode, and the source_mode log /
        # cache-demotion logic must attribute the decision to the probe,
        # not to explicit flags
        self._wav_mode_requested = cfg.data.wav_mode
        if (
            self.num_hosts > 1
            and cfg.data.source == "wav"
            and cfg.data.wav_mode == "auto"
        ):
            # The auto decision changes the STEP INPUT MODALITY (PCM vs
            # features) and therefore the compiled program — hosts with
            # heterogeneous cores/RAM must not diverge. Pin every host to
            # process 0's choice: the MODE and the CACHE BUDGET both (the
            # budget feeds effective_train_cache_mb() and the cache-demotion
            # compare below; per-host RAM probes would hand hosts different
            # budgets and one host could demote while another does not —
            # silently divergent training features).
            import dataclasses as _dc

            from jax.experimental import multihost_utils

            from ..config import auto_wav_mode, pin_auto_wav_mode

            modes = ("pcm", "host_dsp", "cache")
            local_mode, local_mb, _ = auto_wav_mode()
            decision = multihost_utils.broadcast_one_to_all(
                np.asarray(
                    [float(modes.index(local_mode)), local_mb], np.float64
                )
            )
            mode, cache_mb = modes[int(decision[0])], float(decision[1])
            pin_auto_wav_mode(
                mode, cache_mb,
                f"coordinator broadcast: process 0 chose '{mode}' "
                f"({cache_mb:.0f} MB cache budget)",
            )
            cfg = _dc.replace(
                cfg, data=_dc.replace(cfg.data, wav_mode=mode)
            )
            self.cfg = cfg

        params, model_state = init_speaker_classifier(
            jax.random.PRNGKey(cfg.train.seed), cfg.model
        )
        self.state: TrainState = init_train_state(params, model_state, cfg)
        self.train_step = make_train_step(cfg)
        from ..utils.kernel_auto import resolve_model_kernels

        self._embed_jit = jax.jit(
            partial(get_embedding, cfg=resolve_model_kernels(
                cfg.model, cfg.features, need_dsp=False))
        )

        # Mesh placement: with >1 device the batch shards over 'data' and the
        # AM-Softmax W (+ its optimizer moments) over 'model'; the same jitted
        # step runs either way (XLA GSPMD inserts the collectives). On
        # multi-host (jax.distributed) the mesh spans every process's chips;
        # state leaves become global arrays assembled from each host's
        # identical seed-initialized copy.
        self.mesh = None
        self._local_rows = None  # this host's batch-row slice (multi-host)
        n_dev = len(jax.devices())
        if n_dev > 1:
            data_size = n_dev // max(1, cfg.mesh.model_axis)
            if cfg.train.batch_size % max(1, data_size) == 0:
                from ..parallel.mesh import (
                    batch_shardings,
                    global_train_state,
                    host_batch_rows,
                    make_mesh,
                    shard_train_state,
                )

                self.mesh = make_mesh(cfg.mesh)
                if self.num_hosts > 1:
                    self.state = global_train_state(self.state, self.mesh)
                    self._local_rows = host_batch_rows(
                        self.mesh, cfg.train.batch_size
                    )
                else:
                    self.state = shard_train_state(self.state, self.mesh)
                self._batch_shardings = batch_shardings(
                    {"inputs": None, "waves": None, "lengths": None, "labels": None},
                    self.mesh,
                )
            else:
                if self.num_hosts > 1:
                    raise ValueError(
                        f"batch_size {cfg.train.batch_size} not divisible by "
                        f"the mesh data axis ({data_size}) — required for "
                        "multi-host training"
                    )
                self.log.log(
                    "mesh_disabled",
                    reason=f"batch_size {cfg.train.batch_size} not divisible by "
                    f"data axis {data_size}; running single-device",
                )
        elif self.num_hosts > 1:
            raise ValueError("multi-host run but only one global device visible")

        self._load_data()

        self.best_eer = 50.0
        self.stopping = 0
        self.starting_epoch = 0
        self.epoch = 0
        self.best_ckpt_path: Optional[str] = None
        self._print_t0 = time.time()
        self._pause_s = 0.0
        self._valid_loader = None
        self._pending_val = None  # (thread, result_box, snapshot_state, epoch)
        self._checkpointer = AsyncCheckpointer()
        self._orbax_saver_inst = None  # lazy OrbaxAsyncSaver
        self._stop_requested = False  # set by request_stop (signal handler)
        self._stop_reason = ""
        self.preempted = False  # train() exited via a graceful stop
        self._resume_skip_steps = 0  # mid-epoch resume: in-epoch steps done
        if getattr(cfg.train, "requeue", False) or os.environ.get("DMHA_REQUEUE"):
            self.resume()

    # ------------------------------------------------------------------ data
    def _load_data(self) -> None:
        cfg = self.cfg
        manifest = load_train_manifest(cfg.data.train_labels_path)
        window_frames = int(cfg.train.window_size * 100)
        # one source-mode decision, shared with the kernel resolver
        # (utils/kernel_auto.py) so the step input modality can't diverge
        mode = cfg.data.source_mode()
        requested_auto = (
            getattr(self, "_wav_mode_requested", cfg.data.wav_mode) == "auto"
        )
        reason = None
        if (
            mode == "wav_cache"
            and requested_auto
            and cfg.data.train_feature_cache_mb <= 0
            and not cfg.data.train_feature_cache_dir
        ):
            # The probe sized the cache from free RAM without seeing the
            # corpus. If the feature working set clearly exceeds the budget,
            # the LRU would thrash — each miss recomputes a FULL utterance's
            # DSP (~2.3x a window), worse than plain per-window host DSP —
            # so demote. Safe vs the kernel resolver: both modes feed the
            # step FEATURES, so the compiled program is unchanged; and
            # deterministic across hosts (identical manifest, strided
            # file-size sample).
            from ..data.feature_cache import estimate_feature_working_set_mb

            budget_mb = cfg.data.effective_train_cache_mb()
            est_mb = estimate_feature_working_set_mb(
                cfg.data.train_data_dir, [u.path for u in manifest]
            )
            demote = est_mb > 1.2 * budget_mb
            if self.num_hosts > 1:
                # budget is coordinator-pinned and the estimate is a
                # deterministic function of the (identical) manifest, but the
                # strided file-size sample reads each host's local stat() —
                # make the decision unconditionally identical by broadcasting
                # process 0's verdict
                from jax.experimental import multihost_utils

                demote = bool(
                    multihost_utils.broadcast_one_to_all(np.int32(demote))
                )
            if demote:
                mode = "wav_host_dsp"
                reason = (
                    f"auto cache demoted to host DSP: estimated feature "
                    f"working set {est_mb:.0f} MB vs {budget_mb:.0f} MB budget "
                    "(LRU thrash would recompute full utterances per window)"
                )
        # remember the RESOLVED mode (auto decision + demotion applied):
        # validation must extract features with the same DSP implementation
        # training uses (host C++/numpy kernel vs XLA device DSP differ by
        # ~8e-5 per feature — almost certainly immaterial to EER, but the
        # reference-grid EER rounds at 4 dp, so the two streams must not mix)
        self._resolved_source_mode = mode
        if cfg.data.source == "wav":
            from ..config import auto_wav_mode

            if reason is None:
                reason = auto_wav_mode()[2] if requested_auto else "explicit flags"
            self.log.log(
                "source_mode",
                mode=mode,
                wav_mode=cfg.data.wav_mode,
                # only the cache mode runs with a budget; after a demotion
                # the flags still resolve wav_cache, so report the budget of
                # the mode actually RUNNING, not of the one demoted away from
                cache_mb=(
                    cfg.data.effective_train_cache_mb()
                    if mode == "wav_cache" else 0.0
                ),
                reason=reason,
            )
        if mode == "wav_cache":
            # compute-once full-utterance features (host DSP on first touch),
            # re-windowed per epoch — steady state == feature-mode cost
            from ..data.feature_cache import CachedDspWavSource

            source = CachedDspWavSource(
                cfg.data.train_data_dir, cfg.features, window_frames,
                cfg.train.normalization,
                cache_mb=cfg.data.effective_train_cache_mb(),
                cache_dir=cfg.data.train_feature_cache_dir,
            )
            is_wave = False
        elif mode == "wav_host_dsp":
            from ..data.dataset import HostDspWavSource

            source = HostDspWavSource(
                cfg.data.train_data_dir, cfg.features, window_frames,
                cfg.train.normalization,
            )
            is_wave = False  # the step sees a feature batch
        elif mode == "wav_pcm":
            source = WavSource(cfg.data.train_data_dir, cfg.features, window_frames,
                               native_reader=self._native_reader())
            is_wave = True
        else:
            source = FeaturePickleSource(
                cfg.data.train_data_dir, cfg.train.normalization, window_frames
            )
            is_wave = False
        self.loader = TrainLoader(
            manifest, source, cfg.train, cfg.data,
            feature_dim=cfg.model.feature_size, is_wave=is_wave,
            host_id=self.host_id, num_hosts=self.num_hosts,
            local_rows=self._local_rows,
        )

    def _native_reader(self):
        if not self.cfg.data.use_native_loader:
            return None
        try:
            from ..utils.native import native_read_wav

            return native_read_wav if native_read_wav is not None else None
        except Exception:
            return None

    # -------------------------------------------------------------- validate
    def _valid_feature_loader(self):
        """Validation feature loader, cached across validation rounds: the
        params change between rounds (embeddings must be recomputed) but the
        features on disk do not."""
        if self._valid_loader is not None:
            return self._valid_loader
        cfg = self.cfg
        if cfg.data.source == "wav":
            from ..evaluation.embeddings import wav_feature_loader

            # follow the RESOLVED training DSP path, not the explicit flag:
            # a wav-auto run that trains on host-DSP (or cached host-DSP)
            # features must validate with the same extractor implementation
            # (_load_data stores the post-auto/post-demotion mode)
            host_dsp = cfg.data.host_dsp or getattr(
                self, "_resolved_source_mode", ""
            ) in ("wav_host_dsp", "wav_cache")
            loader = wav_feature_loader(
                cfg.data.valid_data_dir, cfg.features, cfg.train.normalization,
                host_dsp=host_dsp,
            )
            self.log.log(
                "valid_loader",
                host_dsp=bool(host_dsp),
                train_mode=getattr(self, "_resolved_source_mode", "features"),
            )
        else:
            loader = pickle_feature_loader(cfg.data.valid_data_dir, cfg.train.normalization)
        if cfg.data.valid_feature_cache_mb > 0:
            loader = FeatureCache(loader, cfg.data.valid_feature_cache_mb)
        self._valid_loader = loader
        return loader

    def validate(self, state: Optional[TrainState] = None) -> Dict[str, float]:
        cfg = self.cfg
        state = self.state if state is None else state
        t0 = time.time()
        loader = self._valid_feature_loader()
        params, model_state, mesh = state.params, state.model_state, self.mesh
        if self.num_hosts > 1:
            # every host runs the identical host-LOCAL validation (same
            # features, same params) and reaches the same EER bit-for-bit,
            # so best/stopping decisions stay in lockstep with no cross-host
            # coordination. Sharded leaves are all-gathered here — a
            # collective, safe because validation is serial on multi-host
            # (_async_validation_enabled) and runs at the same step everywhere.
            from ..parallel.mesh import host_local_tree

            params, model_state = host_local_tree((params, model_state))
            mesh = None
        extractor = EmbeddingExtractor(
            params,
            model_state,
            cfg.model,
            loader,
            embed_fn=self._embed_jit,
            num_workers=max(1, cfg.data.num_workers),
            mesh=mesh,
            long_audio=cfg.train.valid_long_audio,
        )
        clients = load_trials(cfg.data.valid_clients)
        impostors = load_trials(cfg.data.valid_impostors)
        if self.num_hosts > 1 and cfg.train.shard_validation:
            # each host embeds only its utterance shard; the all-gathered
            # cache is bit-identical to unsharded extraction, so the EER
            # below stays in lockstep across hosts (docs/SCALING.md). The
            # gather is a collective — safe here because multi-host
            # validation is serial and runs at the same step on every host.
            from ..evaluation.embeddings import sharded_extract

            utts = [u for pair in (*clients, *impostors) for u in pair]
            n_local = sharded_extract(
                extractor, utts, self.host_id, self.num_hosts
            )
            self.log.log(
                "validate_shard",
                n_total=len(set(utts)),
                n_local=n_local,
                n_embedded=extractor.n_embedded,
            )
        result = validate_eer(extractor, clients, impostors)
        result["elapsed_s"] = time.time() - t0
        return result

    def _apply_validation(
        self, result: Dict[str, float], state: TrainState, epoch: int
    ) -> None:
        """Record a finished validation: improvement bookkeeping + best-EER
        checkpoint of the params AT the validation step (``state``)."""
        eer = result["eer"]
        self.log.log(
            "validate",
            epoch=epoch,
            step=int(state.step),
            eer=eer,
            eer_exact=result["eer_exact"],
            elapsed_s=result["elapsed_s"],
        )
        if eer < self.best_eer:
            self.best_eer = eer
            self.stopping = 0
            self.best_ckpt_path = self._save("best", state=state, epoch=epoch)
            # best checkpoints are rare and load-bearing (requeue target):
            # block until the write lands; periodic saves stay async
            self._checkpointer.wait()
            self.log.log("new_best", eer=eer, path=self.best_ckpt_path)
        else:
            self.stopping += 1
            self.log.log("no_improvement", best_eer=self.best_eer, stopping=self.stopping)

    def _async_validation_enabled(self) -> bool:
        # multi-host: a second thread issuing collectives while the main
        # thread trains can enqueue programs in different orders on
        # different hosts -> distributed deadlock. Keep validation serial.
        return self.cfg.train.async_validation and self.num_hosts == 1

    def _join_validation(self) -> None:
        """Wait for the in-flight background validation (if any) and apply it."""
        if self._pending_val is None:
            return
        th, box, snap, epoch = self._pending_val
        self._pending_val = None
        t_pause = time.time()
        th.join()
        if "error" in box:
            raise box["error"]
        self._apply_validation(box["result"], snap, epoch)
        # blocked-on-join time is excluded from the throughput print window
        # (like sync-mode validation); wall-clock metrics still include it
        self._pause_s += time.time() - t_pause

    def _on_validation(self) -> None:
        if not self._async_validation_enabled():
            t_pause = time.time()
            result = self.validate()
            self._apply_validation(result, self.state, self.epoch)
            # exclude validation time from the throughput print window;
            # resetting _print_t0 here would instead desync it from
            # the metric window (steps before the validation would be divided by
            # post-validation time only)
            self._pause_s += time.time() - t_pause
            return
        # one validation in flight at a time (reference cadence semantics)
        self._join_validation()
        import jax.numpy as jnp

        # explicit device copy: the train step donates its input buffers, so
        # self.state's arrays are invalidated by the NEXT step — the snapshot
        # must own its memory for the background thread to read
        snap = jax.tree.map(jnp.copy, self.state)
        box: Dict = {}

        def run() -> None:
            try:
                box["result"] = self.validate(snap)
            except BaseException as e:  # surface in the training thread
                box["error"] = e

        import threading

        th = threading.Thread(target=run, name="validation", daemon=True)
        self._pending_val = (th, box, snap, self.epoch)
        th.start()

    # ------------------------------------------------------------ checkpoint
    def _meta(self, state: Optional[TrainState] = None, epoch: Optional[int] = None) -> Dict:
        state = self.state if state is None else state
        return {
            "config": self.cfg.to_dict(),
            "model_name": self.model_name,
            "epoch": self.epoch if epoch is None else epoch,
            "step": int(state.step),
            "best_eer": self.best_eer,
            "stopping": self.stopping,
            "lr": get_lr(state.opt_state),
            "best_ckpt_path": self.best_ckpt_path,
            # mid-epoch resume validates against this: the in-epoch offset
            # (step - epoch*spe) is only meaningful if the epoch geometry
            # is unchanged across the resume
            "steps_per_epoch": self.loader.steps_per_epoch(),
        }

    def _save(
        self,
        kind: str = "periodic",
        state: Optional[TrainState] = None,
        epoch: Optional[int] = None,
    ) -> str:
        state = self.state if state is None else state
        os.makedirs(self.cfg.out_dir, exist_ok=True)
        step = int(state.step)
        stem = f"{self.model_name}_best_{step}" if kind == "best" else f"{self.model_name}_{step}"
        keep = self.cfg.train.keep_checkpoints
        meta = self._meta(state, epoch)
        if self.cfg.train.checkpoint_backend == "orbax":
            from ..utils.orbax_ckpt import prune_orbax_checkpoints, save_checkpoint_orbax

            if kind == "best":
                # a best checkpoint's meta must name itself: a resume from it
                # (it can be the newest file, e.g. under async validation)
                # must restore best_ckpt_path so pruning keeps protecting it
                meta["best_ckpt_path"] = os.path.join(self.cfg.out_dir, f"{stem}.orbax")
            # orbax runs its own (finalization-atomic) write path; every host
            # participates and writes only its own shards. Periodic saves go
            # through the async saver (the train loop blocks only for the
            # device->host snapshot; disk IO + meta finalization are
            # deferred); best saves block — they are the requeue target.
            t0 = time.perf_counter()
            if self.cfg.train.checkpoint_async:
                path = self._orbax_saver().save(
                    os.path.join(self.cfg.out_dir, f"{stem}.orbax"),
                    state, meta, block=(kind == "best"),
                )
            else:
                path = save_checkpoint_orbax(
                    os.path.join(self.cfg.out_dir, f"{stem}.orbax"), state, meta
                )
            self.log.log(
                "ckpt_save", kind=kind, backend="orbax", step=step,
                mode="async" if self.cfg.train.checkpoint_async else "sync",
                blocked_s=round(time.perf_counter() - t0, 4),
            )
            if kind != "best" and keep > 0:
                prune_orbax_checkpoints(
                    self.cfg.out_dir, self.model_name, keep,
                    protect=(self.best_ckpt_path,) if self.best_ckpt_path else (),
                )
            return path
        path = os.path.join(self.cfg.out_dir, f"{stem}.npz")
        if kind == "best":
            meta["best_ckpt_path"] = path  # see orbax note above
        self._checkpointer.save(path, state, meta)
        if kind != "best" and keep > 0:
            prune_checkpoints(
                self.cfg.out_dir, self.model_name, keep,
                protect=(self.best_ckpt_path,) if self.best_ckpt_path else (),
            )
        return path

    def _orbax_saver(self):
        if getattr(self, "_orbax_saver_inst", None) is None:
            from ..utils.orbax_ckpt import OrbaxAsyncSaver

            self._orbax_saver_inst = OrbaxAsyncSaver()
        return self._orbax_saver_inst

    # ------------------------------------------------------------ preemption
    def request_stop(self, reason: str = "signal") -> None:
        """Request a graceful stop (SIGTERM handler entry point): the train
        loop checkpoints at the next agreed step boundary and exits cleanly.
        Safe from signal handlers/threads (a bool + str store)."""
        self._stop_reason = reason
        self._stop_requested = True

    def _preempt_verdict(self, step: int) -> bool:
        """Do all hosts agree to stop at this step boundary? Single-host:
        the local flag, checked every step. Multi-host: only one host may
        have received the signal, so the verdict is the OR of every host's
        flag — an agreement collective every ``preempt_sync_every`` steps
        (every host calls it at the same step, keeping collectives in
        lockstep even when a host's own flag is still False)."""
        if self.num_hosts == 1:
            return self._stop_requested
        every = self.cfg.train.preempt_sync_every
        if every <= 0 or step % every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(1 if self._stop_requested else 0)
        )
        return bool(np.max(np.asarray(flags)) > 0)

    def _graceful_stop(self, step: int) -> None:
        """Coordinated preemption checkpoint: join any in-flight validation
        (its bookkeeping, incl. a possible best save, must land first), save
        a checkpoint AT the interrupt step, and block until it is fully
        finalized — the process exits right after, and --requeue must find
        it."""
        self.log.log(
            "preempt_stop", step=step,
            reason=self._stop_reason or "peer-host signal",
        )
        self._join_validation()
        path = self._save("periodic")
        self._checkpointer.wait()
        if getattr(self, "_orbax_saver_inst", None) is not None:
            self._orbax_saver_inst.wait()
        self.preempted = True
        self.log.log("preempt_checkpoint", path=path, step=step)

    def resume(self, step: Optional[int] = None) -> bool:
        """Requeue-style resume (reference ``__load_previous_states``,
        ``train.py:31-49``) — newest checkpoint by default, or the one at an
        explicit optimizer ``step`` (the reference can only take the newest,
        which after its best-only saving means the last *best*)."""
        if self.cfg.train.checkpoint_backend == "orbax":
            from ..utils.orbax_ckpt import latest_orbax_checkpoint, load_checkpoint_orbax

            if step is None:
                path = latest_orbax_checkpoint(self.cfg.out_dir)
            else:
                path = self._find_step_checkpoint(step, ".orbax")
            if path is None:
                return False
            # the template is the live (possibly mesh-sharded) state: orbax
            # restores each leaf directly into that sharding
            state, meta = load_checkpoint_orbax(path, self.state)
        else:
            if step is None:
                path = latest_checkpoint(self.cfg.out_dir)
            else:
                path = self._find_step_checkpoint(step, ".npz")
            if path is None:
                return False
            state, meta = load_checkpoint(path, self.state)
        if self.mesh is not None and self.num_hosts == 1:
            # multi-host: orbax already restored every leaf into the global
            # template's shardings; a device_put would be cross-process
            from ..parallel.mesh import shard_train_state

            state = shard_train_state(state, self.mesh)
        self.state = state
        ckpt_epoch = int(meta.get("epoch", 0))
        self.best_eer = float(meta.get("best_eer", 50.0))
        self.stopping = int(meta.get("stopping", 0))
        self.best_ckpt_path = meta.get("best_ckpt_path") or self.best_ckpt_path
        # Mid-epoch checkpoints (graceful preemption, periodic saves) resume
        # INSIDE their epoch: the loader's step streams are keyed by
        # (seed, epoch, step), so skipping the already-consumed in-epoch
        # steps continues the uninterrupted batch stream exactly. A
        # checkpoint at an epoch boundary starts the next epoch (the
        # pre-r5 — and reference, train.py:47 — semantics). The in-epoch
        # offset is only valid if the epoch geometry is unchanged: when the
        # checkpoint records a DIFFERENT steps_per_epoch (manifest grew,
        # batch/accum changed) — or predates the field — fall back to
        # epoch+1 rather than silently skipping the wrong batches.
        steps_per_epoch = self.loader.steps_per_epoch()
        ckpt_spe = meta.get("steps_per_epoch")
        in_epoch = int(self.state.step) - ckpt_epoch * max(1, steps_per_epoch)
        if ckpt_spe == steps_per_epoch and 0 < in_epoch < steps_per_epoch:
            self.starting_epoch = ckpt_epoch
            self._resume_skip_steps = in_epoch
        else:
            if (ckpt_spe is not None and ckpt_spe != steps_per_epoch
                    and 0 < in_epoch):
                self.log.log(
                    "resume_geometry_changed",
                    ckpt_steps_per_epoch=ckpt_spe,
                    steps_per_epoch=steps_per_epoch,
                    note="mid-epoch offset invalid; restarting at epoch+1",
                )
            self.starting_epoch = ckpt_epoch + 1
            self._resume_skip_steps = 0
        self.log.log(
            "resume", path=path, step=int(self.state.step),
            epoch=self.starting_epoch, in_epoch_skip=self._resume_skip_steps,
        )
        return True

    def _find_step_checkpoint(self, step: int, suffix: str) -> Optional[str]:
        if not os.path.isdir(self.cfg.out_dir):
            return None
        for fname in sorted(os.listdir(self.cfg.out_dir)):
            if fname.endswith(f"_{step}{suffix}") and fname.startswith(self.model_name):
                return os.path.join(self.cfg.out_dir, fname)
        return None

    # ----------------------------------------------------------------- train
    def _halve_lr_if_stagnant(self) -> None:
        """Epoch-end LR halving (``train.py:200-203``): every
        ``lr_halving_patience`` non-improving validations; RMSprop excluded."""
        if (self.stopping + 1) % self.cfg.train.lr_halving_patience == 0:
            if self.cfg.train.optimizer in ("Adam", "SGD"):
                new_lr = get_lr(self.state.opt_state) * 0.5
                self.state = self.state._replace(
                    opt_state=with_lr(self.state.opt_state, new_lr)
                )
                self.log.log("lr_halved", lr=new_lr)

    def _make_watchdog(self):
        from ..utils.watchdog import Watchdog

        cfg = self.cfg
        stall_since = {"step": None, "t0": 0.0}

        def on_stall(age: float, last: int) -> None:
            # the watchdog resets its beat after each report (anti-spam), so
            # accumulate no-progress time per stuck step ourselves
            now = time.monotonic()
            if stall_since["step"] != last:
                stall_since["step"] = last
                stall_since["t0"] = now - age
            total = now - stall_since["t0"]
            self.log.log("stall", age_s=round(total, 1), last_step=last)
            if cfg.train.stall_exit_s > 0 and total >= cfg.train.stall_exit_s:
                import faulthandler
                import sys as _sys

                self.log.log("stall_exit", age_s=round(total, 1), last_step=last)
                try:  # stacks of every thread, for the post-mortem
                    faulthandler.dump_traceback(file=_sys.stderr, all_threads=True)
                except Exception:
                    pass
                os._exit(17)  # a wedged backend call cannot be unwound cleanly

        return Watchdog(
            timeout_s=min(600.0, cfg.train.stall_exit_s) if cfg.train.stall_exit_s > 0 else 600.0,
            on_stall=on_stall,
        )

    def train(self) -> None:
        cfg = self.cfg
        rng0 = jax.random.PRNGKey(cfg.train.seed + 17)
        self._print_t0 = time.time()
        self._pause_s = 0.0
        # normally created at construction (so a wedged first compile is
        # covered too); lazily created for Trainers assembled piecewise
        watchdog = getattr(self, "_watchdog", None)
        if watchdog is None:
            watchdog = self._watchdog = self._make_watchdog().start()
        watchdog.beat(-1)  # construction survived; the loop beats from here

        self.log.log("start_training", model=self.model_name,
                     steps_per_epoch=self.loader.steps_per_epoch())
        import jax.numpy as jnp

        # metrics stay on device between prints: fetching a scalar per step
        # would force a host sync every step (expensive on relayed backends)
        # and serialize dispatch, killing transfer/compute overlap. The
        # window accumulation is a single fused jitted add per step — stacking
        # a Python list of device scalars at print time instead costs one
        # relay RPC per buffered scalar (~100 ms/step measured at
        # print_every=10 on the axon relay).
        metric_accum = jax.jit(
            lambda c, l, a: c + jnp.stack((l, a)).astype(jnp.float32)
        )
        if self.num_hosts > 1:
            # the accumulator must be a GLOBAL (replicated) array: mixing a
            # host-local array with the step's global metrics in one jit is
            # invalid on multi-process meshes
            from jax.sharding import NamedSharding, PartitionSpec as P

            metric_zero = jax.make_array_from_callback(
                (2,), NamedSharding(self.mesh, P()),
                lambda idx: np.zeros((2,), np.float32)[idx],
            )
        else:
            metric_zero = jnp.zeros((2,), jnp.float32)
        metric_sum = metric_zero
        metric_n = 0
        step = int(self.state.step)
        from ..utils.profiling import StepProfiler
        from .device_prefetch import device_prefetch

        profiler = StepProfiler(
            cfg.train.profile_dir, cfg.train.profile_start_step, cfg.train.profile_steps
        )
        last_metrics = None
        last_batch = None
        wait_s = dispatch_s = 0.0  # host-side accounting per print window
        # lazy defaults: Trainers assembled piecewise skip __init__
        self._dispatch_hint_logged = getattr(self, "_dispatch_hint_logged", False)
        self._resume_skip_steps = getattr(self, "_resume_skip_steps", 0)
        self._stop_requested = getattr(self, "_stop_requested", False)
        self._stop_reason = getattr(self, "_stop_reason", "")
        self.preempted = getattr(self, "preempted", False)

        for self.epoch in range(self.starting_epoch, cfg.train.max_epochs):
            # mid-epoch resume (graceful preemption): skip the in-epoch
            # steps the checkpoint already consumed — the remainder of the
            # batch stream is bit-identical to the uninterrupted epoch.
            # start_step only passed when nonzero so duck-typed replay
            # loaders (tests, soak tools) keep their 1-arg epoch()
            skip = (
                self._resume_skip_steps
                if self.epoch == self.starting_epoch else 0
            )
            if skip:
                epoch_batches = self.loader.epoch(self.epoch, start_step=skip)
            else:
                epoch_batches = self.loader.epoch(self.epoch)
            if self.num_hosts > 1:
                # assemble each host's row slice into global arrays; the
                # transfer itself is process-local (no collective), so it is
                # safe inside the prefetch thread too
                from ..parallel.mesh import globalize_batch

                gb = cfg.train.batch_size
                epoch_batches = (
                    globalize_batch(b, self.mesh, gb) for b in epoch_batches
                )
            batches = device_prefetch(
                epoch_batches,
                depth=cfg.train.device_prefetch,
                shardings=(
                    self._batch_shardings
                    if self.mesh is not None and self.num_hosts == 1
                    else None
                ),
            )
            batches_it = iter(batches)
            while True:
                t_w = time.perf_counter()
                batch = next(batches_it, None)
                wait_s += time.perf_counter() - t_w
                if batch is None:
                    break
                last_batch = batch
                evt = profiler.before_step(
                    step, sync=None if last_metrics is None else last_metrics["loss"]
                )
                if evt:
                    self.log.log(f"profile_{evt}", step=step, dir=cfg.train.profile_dir)
                step_rng = jax.random.fold_in(rng0, step)
                t_d = time.perf_counter()
                self.state, metrics = self.train_step(self.state, batch, step_rng)
                dispatch_s += time.perf_counter() - t_d
                last_metrics = metrics
                metric_sum = metric_accum(
                    metric_sum, metrics["loss"], metrics["accuracy"]
                )
                metric_n += 1
                step += 1
                watchdog.beat(step)

                if step % cfg.train.print_every == 0:
                    if self.num_hosts > 1:  # replicated: read the local shard
                        vals = np.asarray(metric_sum.addressable_data(0))
                    else:
                        vals = np.asarray(metric_sum)  # ONE host fetch per window
                    window_loss, window_acc = float(vals[0]), float(vals[1])
                    window_n = metric_n
                    metric_sum, metric_n = metric_zero, 0
                    elapsed = time.time() - self._print_t0 - self._pause_s
                    samples = window_n * cfg.train.batch_size * cfg.train.gradient_accumulation
                    self.log.log(
                        "train",
                        epoch=self.epoch,
                        step=step,
                        xent=window_loss / max(1, window_n),
                        accuracy=100.0 * window_acc / max(1, window_n),
                        audio_s_per_s=samples * cfg.train.window_size / max(1e-9, elapsed),
                        elapsed_min=elapsed / 60,
                        # where the window's host time went: blocked on the
                        # loader vs dispatching the step (transfer+trace)
                        loader_wait_s=round(wait_s, 3),
                        dispatch_s=round(dispatch_s, 3),
                    )
                    # Actionable hint, once: a healthy dispatch (async submit
                    # of an already-compiled step) costs ~1 ms; tens of ms per
                    # step means the backend charges the host->device batch
                    # transfer synchronously (relayed links do, in some
                    # sessions) — a background transfer thread hides it
                    # (measured +10 pts of step ceiling, docs/PERFORMANCE.md).
                    if (
                        not self._dispatch_hint_logged
                        and cfg.train.device_prefetch == 0
                        and window_n >= 5
                        and dispatch_s / window_n > 0.02
                    ):
                        self._dispatch_hint_logged = True
                        self.log.log(
                            "perf_hint",
                            dispatch_ms_per_step=round(1e3 * dispatch_s / window_n, 1),
                            hint="step dispatch is paying the batch transfer "
                            "synchronously; consider --device_prefetch 2",
                        )
                    wait_s = dispatch_s = 0.0
                    self._print_t0 = time.time()
                    self._pause_s = 0.0

                if cfg.train.validate_every and step % cfg.train.validate_every == 0:
                    self._on_validation()

                if cfg.train.checkpoint_every and step % cfg.train.checkpoint_every == 0:
                    self._save("periodic")

                # graceful preemption: called UNCONDITIONALLY — on
                # multi-host the verdict is an agreement collective that
                # every host must enter at the same step, signal or not
                if self._preempt_verdict(step):
                    self._graceful_stop(step)
                    break

            if self.preempted:
                # stop iterating cleanly (the prefetch/loader threads are
                # daemons; close releases them now rather than at GC)
                getattr(batches_it, "close", lambda: None)()
                break
            # epoch-end decisions must see every validation launched this
            # epoch (reference semantics: validation is serial, train.py:158)
            self._join_validation()
            if cfg.train.early_stopping >= 0 and self.stopping > cfg.train.early_stopping:
                self.log.log("early_stop", best_eer=self.best_eer)
                break
            self._halve_lr_if_stagnant()
        self._join_validation()
        profiler.close(sync=None if last_metrics is None else last_metrics["loss"])
        self._checkpointer.wait()
        if getattr(self, "_orbax_saver_inst", None) is not None:
            # finalize the last async orbax save (meta.json + barrier)
            self._orbax_saver_inst.wait()
        if cfg.train.post_step_bench > 0 and last_metrics is not None:
            # still under the watchdog: the bench issues device calls + a
            # host fetch, which can hit the same relay wedge as any step
            self._post_step_bench(last_batch, rng0, cfg.train.post_step_bench,
                                  watchdog)
        watchdog.stop()
        # a second train() on this instance must get a fresh watchdog, not
        # the stopped one
        self._watchdog = None
        self.log.log("finished", best_eer=self.best_eer)

    def _post_step_bench(self, batch, rng, n: int, watchdog=None) -> None:
        """Isolated-step ceiling of THIS session: chain the already-compiled
        train step on a device-resident copy of the last batch (no loader, no
        transfer) and log ms/step, two-point latency-corrected (bench.py's
        method — on relayed backends only a host read synchronizes, and each
        read carries a large constant latency that differencing cancels)."""
        import jax.numpy as jnp

        if self.num_hosts > 1:
            dev_batch = batch  # already a dict of global arrays
        elif self.mesh is not None:
            dev_batch = jax.device_put(
                batch, {k: self._batch_shardings[k] for k in batch}
            )
        else:
            dev_batch = jax.device_put(batch)
        # bench on a throwaway copy: train_step donates arg 0, so chaining on
        # self.state would train the model n+k1+1 extra steps on one repeated
        # batch AFTER the final checkpoint, desyncing trainer.state/step from
        # every saved checkpoint and the logged metrics
        bench_state = jax.tree.map(jnp.copy, self.state)

        def chain(k: int) -> float:
            nonlocal bench_state
            t0 = time.perf_counter()
            m = None
            for _ in range(k):
                bench_state, m = self.train_step(bench_state, dev_batch, rng)
            loss = m["loss"]
            if self.num_hosts > 1:
                loss = loss.addressable_data(0)
            float(loss)  # host fetch -> full sync
            if watchdog is not None:
                watchdog.beat(-2)  # bench progress counts as liveness
            return time.perf_counter() - t0

        n = max(8, n)  # two-point timing needs k1 = n//4 strictly below n
        k1 = max(2, n // 4)
        chain(1)  # warm (already compiled; primes any relay caches)
        t_a = chain(k1)
        t_b = chain(n)
        ms = (t_b - t_a) / (n - k1) * 1e3
        self.log.log("step_bench", ms_per_step=round(ms, 2), steps=n)
