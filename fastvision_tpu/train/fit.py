"""Fit: the epoch-level training harness.

Covers the reference's three runner recipes in one class (SURVEY.md §2.4):
  - utils/fit.py:29 run_epoches (train/val phases, per-epoch checkpoint,
    NMS+mAP during val);
  - demos/yolov3_u/cfg/_fit.py (best-val checkpoint, LR x0.1 plateau decay);
  - demos/yolov3_huaweiShip/cfg/_fit.py (per-iter linear warmup -> cosine
    restarts, final `no_aug` epochs on clean data at min LR, save best +
    every epoch);
  - demos/faster_rcnn/cfg/_fit.py (step decay, grad-norm clip — the clip
    lives in the optimizer chain here).

TPU-native: the hot loop is ONE jitted step; this class only sequences
epochs, schedules the LR host-side (injected hyperparam — no recompiles),
streams prefetched sharded batches, accumulates val metrics on host, and
drives the async checkpoint manager. Unlike the reference, resume restores
the optimizer state too (SURVEY.md §5).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import CheckpointManager
from ..core.mesh import replicate
from ..core.telemetry import MetricLogger
from ..data.pipeline import prefetch_to_device
from .schedulers import PlateauScheduler, Schedule, constant_lr
from .steps import TrainState, make_train_step


def _ckpt_snapshot(tree):
    """Host snapshot of train state for the async checkpoint.

    Fully-addressable leaves (single-host, or replicated dp state) copy to
    numpy — the donation-safe snapshot. Leaves sharded across PROCESSES
    (FSDP over a multi-host data axis) cannot be fetched host-side; they
    pass through as global jax.Arrays, which orbax StandardSave handles
    natively (each host writes its own shards, and the async checkpointer
    copies device data out before returning control, so donation by the
    next step stays safe either way)."""
    if tree is None:
        return None

    def snap(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            return x  # cross-process FSDP shard: only orbax can fetch it
        return np.asarray(x)  # local or replicated: plain host copy

    return jax.tree.map(snap, tree)


class Fit:
    def __init__(
        self,
        apply_fn: Callable,
        loss_fn: Callable,
        tx,
        variables: dict,
        train_loader,
        val_loader=None,
        epochs: int = 100,
        schedule: Schedule | None = None,
        plateau: PlateauScheduler | None = None,
        mesh=None,
        evaluator: Callable | None = None,  # (state, val_loader) -> dict of metrics
        ckpt_dir: str | None = None,
        save_every_epoch: bool = True,
        eval_every: int = 1,
        no_aug_epochs: int = 0,
        no_aug_loader=None,
        no_aug_lr: float | None = None,
        logger: MetricLogger | None = None,
        log_every: int = 50,
        start_epoch: int = 0,
        resume: bool = False,
        metric_mode: str = "min",  # best tracking on 'val_loss' by default
        metric_key: str = "val_loss",
        # prebuilt (state, batch, lr[, rng]) -> (state, metrics); when the
        # callable takes a 4th arg it receives a deterministic per-step key
        # derived from `seed` (dropout models need it — core/rng.step_key)
        step_fn: Callable | None = None,
        seed: int = 0,
        ema_decay: float = 0.0,  # >0 enables EMA weights for eval/checkpoint
        multiscale: Sequence[int] | None = None,  # per-epoch train input sizes
        preempt_signals: Sequence[int] = (),  # e.g. (signal.SIGTERM,)
        fsdp: bool = False,  # shard params/opt-state over 'data' (ZeRO-3)
    ):
        self._seed = seed
        self.step_fn = step_fn or make_train_step(apply_fn, loss_fn, tx)
        self.state = TrainState.create(variables, tx)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.epochs = epochs
        self.schedule = schedule or constant_lr(1e-3)
        self.plateau = plateau
        self.mesh = mesh
        self.evaluator = evaluator
        self.save_every_epoch = save_every_epoch
        self.eval_every = eval_every
        self.no_aug_epochs = no_aug_epochs
        self.no_aug_loader = no_aug_loader
        self.no_aug_lr = no_aug_lr
        self.logger = logger or MetricLogger()
        self.log_every = log_every
        self.start_epoch = start_epoch
        self.metric_mode = metric_mode
        self.metric_key = metric_key
        self.global_step = 0
        # Multi-scale training, redesigned for XLA: sizes change per EPOCH
        # (not per 10 batches like ultralytics) so each size compiles once
        # and the prefetch pipeline never switches shapes mid-stream; a
        # seeded permutation cycles through every size each len(multiscale)
        # epochs. Labels are normalized xywh, so only the loader's
        # letterbox target changes; anchors stay in absolute pixels (the
        # object-rescale IS the augmentation). no_aug epochs and val run
        # at the loader's base size.
        self.multiscale = tuple(int(s) for s in multiscale) if multiscale else None
        self._base_input_size = getattr(train_loader, "input_size", None)
        if self.multiscale:
            bad = [s for s in self.multiscale if s % 32]
            if bad:
                raise ValueError(f"multiscale sizes must be multiples of 32: {bad}")
            if self._base_input_size is None:
                raise ValueError("multiscale needs a train_loader with .input_size")
        # Preemption safety (TPU pods are preemptible in production; the
        # reference's only recovery is a manual --start_epoch flag,
        # SURVEY.md §5). When one of `preempt_signals` arrives (or
        # request_preempt() is called), the harness finishes the in-flight
        # step, writes a checkpoint, and returns with .interrupted=True;
        # `resume=True` then REDOES the interrupted epoch from the saved
        # mid-epoch params (epoch-granular resume keeps the data pipeline
        # deterministic — per-sample RNG is keyed on (seed, epoch, pos)).
        self.preempt_signals = tuple(preempt_signals)
        self._preempt = False
        self.interrupted = False
        self.ema_decay = ema_decay
        self.ema_params = None
        self._ema_update = None
        if ema_decay > 0:
            from .ema import make_ema_update

            # copy=True: the raw params are donated into the first train
            # step; an aliasing astype would leave the EMA tree pointing at
            # deleted buffers
            self.ema_params = jax.tree.map(
                lambda p: jnp.array(p, jnp.float32, copy=True), variables["params"]
            )
            self._ema_update = make_ema_update(ema_decay)

        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        if resume and self.ckpt and self.ckpt.latest_step() is not None:
            like = {"params": self.state.params, "opt_state": self.state.opt_state}
            if self.state.batch_stats:
                like["batch_stats"] = self.state.batch_stats
            if self.ema_params is not None:
                like["ema_params"] = self.ema_params
            restored = self.ckpt.restore(like=like)
            self.state = TrainState(
                restored["state"]["params"],
                restored["state"].get("batch_stats", self.state.batch_stats),
                restored["state"]["opt_state"],
                self.state.step,
            )
            if self.ema_params is not None:
                # restore the EMA shadow tree; fall back to the restored raw
                # params (NOT the fresh init) if an old checkpoint lacks it
                self.ema_params = restored["state"].get(
                    "ema_params",
                    jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True),
                                 self.state.params),
                )
            self.start_epoch = int(restored["meta"].get("epoch", -1)) + 1
            self.global_step = int(restored["meta"].get("global_step", 0))
            print(f"[fit] resumed from epoch {self.start_epoch}")

        if mesh is not None:
            # placement policy: replicate params over the mesh (pure data
            # parallel) unless the mesh has a real 'model' axis — then
            # channel-shard them (parallel/tensor_shard.py) and let GSPMD
            # propagate; or, with fsdp=True on a data-axis mesh, shard
            # every leaf 1/N over 'data' (parallel/fsdp.py, ZeRO-3).
            # Opt-state moments mirror the param shapes so the same rule
            # shards them consistently
            from ..core.mesh import DATA_AXIS, MODEL_AXIS

            if mesh.shape.get(MODEL_AXIS, 1) > 1:
                from ..parallel.tensor_shard import shard_variables as place
            elif fsdp and mesh.shape.get(DATA_AXIS, 1) > 1:
                from ..parallel.fsdp import fsdp_shard_variables as place
            else:
                place = replicate
            self.state = TrainState(
                place(self.state.params, mesh),
                place(self.state.batch_stats, mesh),
                place(self.state.opt_state, mesh),
                self.state.step,
            )
            if self.ema_params is not None:
                self.ema_params = place(self.ema_params, mesh)

    # ------------------------------------------------------------------
    @property
    def step_fn(self):
        """(state, batch, lr[, rng]) -> (state, metrics).

        When the callable accepts a 4th parameter it receives a
        deterministic per-step key derived from ``seed`` (dropout models
        — VGG, ViT — crash in training without one; the (seed,
        global_step) stream keeps runs reproducible and resume-safe).
        Re-assigning ``step_fn`` (e.g. wrapping it for instrumentation)
        re-inspects the new callable's signature. Detection counts only
        positional parameters (a ``*args`` catch-all or a parameter named
        ``rng`` also qualifies) — keyword-only params and ``**kwargs`` do
        NOT make a wrapper rng-taking, so give a forwarding wrapper an
        explicit 4-positional-arg (or ``*args``) signature if the wrapped
        step needs its dropout key."""
        return self._step_fn

    @step_fn.setter
    def step_fn(self, fn):
        import inspect

        self._step_fn = fn
        try:
            params = inspect.signature(fn).parameters.values()
            positional = sum(
                p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in params)
            var_positional = any(p.kind == p.VAR_POSITIONAL for p in params)
            # the key is passed POSITIONALLY, so only a positionally-
            # callable 'rng' qualifies (a keyword-only one would TypeError)
            named_rng = any(
                p.name == "rng"
                and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in params)
            self._step_takes_rng = positional >= 4 or var_positional or named_rng
        except (TypeError, ValueError):
            self._step_takes_rng = False
        self._rng_root = (jax.random.key(self._seed)
                          if self._step_takes_rng else None)

    def request_preempt(self) -> None:
        """Ask the harness to checkpoint and stop after the current step.

        Safe to call from a signal handler or another thread; the train
        loop polls the flag at batch boundaries."""
        self._preempt = True

    def _lr(self) -> float:
        lr = self.schedule(self.global_step)
        if self.plateau is not None:
            lr *= self.plateau.scale
        return lr

    def _train_epoch(self, epoch: int, loader, lr_override: float | None = None) -> float:
        # device-side running sum: unbiased epoch mean over EVERY step
        # without a host sync per step (synced once at epoch end)
        loss_sum = None
        n_steps = 0
        t0 = time.perf_counter()
        n_images = 0
        # per_host: loaders built with host_shard yield host-LOCAL slices
        # of the global batch (each host decodes 1/P of the data);
        # shard_batch assembles the global array. Val loaders stay
        # UNsharded — the evaluators device_get predictions, which needs
        # fully-addressable (per-host-complete) arrays.
        for batch in prefetch_to_device(
            loader.epoch(epoch), mesh=self.mesh,
            per_host=getattr(loader, "host_count", 1) > 1,
        ):
            if self._preempt:
                break
            lr = lr_override if lr_override is not None else self._lr()
            if self._step_takes_rng:
                from ..core.rng import step_key

                self.state, metrics = self.step_fn(
                    self.state, batch, lr,
                    step_key(self._rng_root, self.global_step))
            else:
                self.state, metrics = self.step_fn(self.state, batch, lr)
            if self._ema_update is not None:
                self.ema_params = self._ema_update(
                    self.ema_params, self.state.params, self.state.step
                )
            step_loss = metrics["loss"]
            loss_sum = step_loss if loss_sum is None else loss_sum + step_loss
            n_steps += 1
            self.global_step += 1
            n_images += batch["images"].shape[0]
            if self.global_step % self.log_every == 0:
                dt = time.perf_counter() - t0
                self.logger.log(
                    self.global_step,
                    epoch=epoch,
                    loss=float(step_loss),
                    lr=lr,
                    img_per_sec=n_images / max(dt, 1e-9),
                )
        if n_steps == 0:
            if self._preempt:  # signal landed before the first batch
                return float("nan")
            raise ValueError(
                f"train loader produced zero batches in epoch {epoch} "
                "(dataset smaller than batch_size with drop_last?)"
            )
        return float(loss_sum) / n_steps

    def eval_state(self) -> TrainState:
        """State used for evaluation/serving: EMA weights when enabled."""
        if self.ema_params is None:
            return self.state
        return TrainState(self.ema_params, self.state.batch_stats,
                          self.state.opt_state, self.state.step)

    def _validate(self, epoch: int) -> dict:
        metrics: dict[str, Any] = {}
        if self.evaluator is not None and self.val_loader is not None:
            metrics = dict(self.evaluator(self.eval_state(), self.val_loader))
        return metrics

    def epoch_input_size(self, epoch: int) -> int | None:
        """Train input size for `epoch` under multi-scale (None = base).

        Deterministic AND resume-safe: a permutation seeded by (the train
        loader's seed, the cycle index) covers every size once per cycle, so
        resume lands on the same size while different seeds see different
        size schedules."""
        if not self.multiscale:
            return None
        n = len(self.multiscale)
        seed = getattr(self.train_loader, "seed", 0)
        perm = np.random.default_rng((seed, epoch // n)).permutation(n)
        return self.multiscale[perm[epoch % n]]

    # ------------------------------------------------------------------
    def run(self) -> TrainState:
        import signal as _signal

        installed = []
        for sig in self.preempt_signals:
            try:
                prev = _signal.signal(sig, lambda *_: self.request_preempt())
                installed.append((sig, prev))
            except ValueError:
                # not the main thread: the caller owns signal dispatch and
                # can call request_preempt() directly
                pass
        try:
            return self._run()
        finally:
            for sig, prev in installed:
                _signal.signal(sig, prev)

    def _save_preempt(self, epoch: int, epoch_start_step: int) -> None:
        """Checkpoint an interrupted epoch: saved under the epoch's step
        slot but stamped epoch-1 / the epoch's STARTING global_step, so
        resume redoes the whole epoch (params resume mid-epoch progress;
        the LR schedule replays the epoch's positions)."""
        self.ckpt.save(
            epoch,
            _ckpt_snapshot(self.state.params),
            opt_state=_ckpt_snapshot(self.state.opt_state),
            batch_stats=(_ckpt_snapshot(self.state.batch_stats)
                         if self.state.batch_stats else None),
            ema_params=(_ckpt_snapshot(self.ema_params)
                        if self.ema_params is not None else None),
            extra={"epoch": epoch - 1, "global_step": epoch_start_step,
                   "preempted": True},
        )
        self.ckpt.wait()

    def _run(self) -> TrainState:
        main_epochs = self.epochs - self.no_aug_epochs
        for epoch in range(self.start_epoch, self.epochs):
            no_aug_phase = epoch >= main_epochs
            loader = (
                (self.no_aug_loader or self.train_loader) if no_aug_phase else self.train_loader
            )
            lr_override = self.no_aug_lr if no_aug_phase else None
            if self.multiscale:
                if no_aug_phase or loader is not self.train_loader:
                    self.train_loader.input_size = self._base_input_size
                else:
                    size = self.epoch_input_size(epoch)
                    loader.input_size = size
                    self.logger.log(self.global_step, epoch=epoch, img_size=size)
            epoch_start_step = self.global_step
            train_loss = self._train_epoch(epoch, loader, lr_override)
            if self._preempt:
                self.interrupted = True
                if self.ckpt is not None:
                    self._save_preempt(epoch, epoch_start_step)
                self.logger.log(self.global_step, epoch=epoch, preempted=True)
                print(f"[fit] preempted in epoch {epoch}: checkpoint saved, "
                      "resume will redo this epoch")
                break

            val_metrics = {}
            if (epoch + 1) % self.eval_every == 0 or epoch == self.epochs - 1:
                val_metrics = self._validate(epoch)
            self.logger.log(self.global_step, epoch=epoch, train_loss=train_loss, **val_metrics)

            # Plateau/best tracking must compare like with like: with
            # eval_every > 1, alternating val-metric and train-loss values
            # (different scales) would falsely reset/trip the patience
            # counter. A fresh metric exists on eval epochs (or every epoch
            # when no evaluator is configured, where train_loss IS the
            # metric); in between, hold the last seen value for checkpoint
            # metadata and skip the plateau update.
            expects_val = self.evaluator is not None and self.val_loader is not None
            fresh = bool(val_metrics) or not expects_val
            if fresh:
                metric = val_metrics.get(self.metric_key, train_loss)
                self._last_metric = metric
            else:
                metric = getattr(self, "_last_metric", train_loss)
            if self.plateau is not None and fresh:
                self.plateau.update(metric)
            if self.ckpt is not None and (self.save_every_epoch or epoch == self.epochs - 1):
                self.ckpt.save(
                    epoch,
                    _ckpt_snapshot(self.state.params),
                    opt_state=_ckpt_snapshot(self.state.opt_state),
                    batch_stats=(_ckpt_snapshot(self.state.batch_stats)
                                 if self.state.batch_stats else None),
                    ema_params=(_ckpt_snapshot(self.ema_params)
                                if self.ema_params is not None else None),
                    extra={"epoch": epoch, "global_step": self.global_step,
                           "train_loss": train_loss, **{k: float(v) for k, v in val_metrics.items()}},
                    metric=float(metric),
                    higher_is_better=(self.metric_mode == "max"),
                )
        if self.multiscale:
            self.train_loader.input_size = self._base_input_size
        if self.ckpt is not None:
            self.ckpt.wait()
        return self.state


def replicate_eval_outputs(eval_step: Callable, mesh) -> Callable:
    """Make a jitted eval step's outputs host-fetchable in MULTI-HOST runs.

    The evaluators gather predictions host-side (`jax.device_get`), which
    requires fully-addressable arrays — but over a multi-process mesh a
    jitted step's outputs are sharded across hosts and the fetch raises.
    Re-jitting with replicated `out_shardings` inserts one small
    all-gather per batch and gives every host the full result. With one
    process (or no mesh) the step is returned unchanged, so the
    evaluator builders call this unconditionally."""
    if mesh is None or jax.process_count() == 1:
        return eval_step
    from ..core.mesh import replicated
    from .steps import device_batch

    jitted = jax.jit(eval_step, out_shardings=replicated(mesh))
    # detection batches carry host-only keys (meta: strings/tuples) that
    # jit rejects as input leaves — filter like make_eval_step does
    return lambda state, batch: jitted(state, device_batch(batch))


def detection_evaluator(
    eval_step: Callable,
    num_batches: int | None = None,
    mesh=None,
) -> Callable:
    """Build an evaluator(state, loader) -> {'map50', 'map', 'val_loss'?}.

    eval_step(state, batch) must return ops.nms.Detections in INPUT-size
    coordinates (decode+NMS inside the jit, ref utils/fit.py:95). Boxes are
    unscaled to original image space per the loader's meta and streamed into
    the mAP evaluator (ref utils/fit.py:101-103)."""
    from ..infer.postprocess import scale_coords
    from ..ops.map import MeanAveragePrecision

    eval_step = replicate_eval_outputs(eval_step, mesh)

    def evaluate(state, loader) -> dict:
        m = MeanAveragePrecision()
        for bi, batch in enumerate(prefetch_to_device(loader.epoch(0), mesh=mesh)):
            if num_batches is not None and bi >= num_batches:
                break
            det = eval_step(state, batch)
            det = jax.device_get(det)
            for i in range(batch["num_real"]):
                meta = batch["meta"][i]
                valid = det.valid[i]
                boxes = scale_coords(
                    det.boxes[i][valid], meta["scale"], meta["pad"], meta["orig_hw"]
                )
                gt = meta["gt_pixels"]
                m.update(boxes, det.scores[i][valid], det.classes[i][valid],
                         gt[:, 1:5], gt[:, 0])
        res = m.compute()
        return {"map50": res.map50, "map": res.map}

    return evaluate


def video_multiclip_evaluator(eval_step: Callable, n_clips: int = 4,
                              mesh=None) -> Callable:
    """Kinetics/SlowFast-style test protocol: `n_clips` evenly spaced
    temporal windows per video, per-video LOGITS averaged before argmax.

    Single-clip eval under-samples long videos (one random window judges
    the whole clip); the standard protocol covers the timeline and is the
    number video papers report. The reference has no video eval at all
    (SURVEY.md §2.3 — models + samplers only). The loader must be a
    VideoClipLoader(train=False); all (video, window) pairs stream
    through ONE compiled [bs, T, S, S, 3] program, so the cost is exactly
    n_clips x single-clip eval."""

    eval_step = replicate_eval_outputs(eval_step, mesh)

    def evaluate(state, loader) -> dict:
        ds, T, S = loader.ds, loader.num_frames, loader.size
        bs = loader.batch_size
        n_videos = len(ds)
        jobs = [(v, c) for v in range(n_videos) for c in range(n_clips)]
        logit_sum: dict[int, np.ndarray] = {}
        labels = np.zeros(n_videos, np.int64)

        def windows(total: int) -> list[np.ndarray]:
            if total <= T:
                return [np.clip(np.arange(T), 0, max(total - 1, 0))] * n_clips
            starts = np.round(
                np.linspace(0, total - T, n_clips)).astype(np.int64)
            return [s + np.arange(T) for s in starts]

        win_cache: dict[int, list[np.ndarray]] = {}
        for b0 in range(0, len(jobs), bs):
            chunk = jobs[b0 : b0 + bs]
            clips = []
            for v, c in chunk:
                if v not in win_cache:
                    win_cache[v] = windows(ds.clip_length(v))
                clip, lab = ds.load_clip(v, T, "consecutive", S,
                                         np.random.default_rng(0),
                                         indices=win_cache[v][c])
                labels[v] = lab
                clips.append(clip)
            real = len(clips)
            while len(clips) < bs:  # ragged tail: repeat, ignore below
                clips.append(clips[-1])
            batch = {"images": np.stack(clips)}
            if mesh is not None:
                from ..core.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            logits = np.asarray(jax.device_get(eval_step(state, batch)),
                                np.float32)
            for (v, _c), lg in zip(chunk, logits[:real]):
                logit_sum[v] = logit_sum.get(v, 0.0) + lg
        pred = np.array([np.argmax(logit_sum[v]) for v in range(n_videos)])
        return {"accuracy": float((pred == labels).mean()),
                "n_clips": n_clips}

    return evaluate


def classification_evaluator(eval_step: Callable, mesh=None) -> Callable:
    """evaluator(state, loader) -> {'accuracy'} (ref metrics/accuracy.py:3)."""

    raw_step = eval_step

    def step_with_labels(state, batch):
        # labels ride through the (replicated) fetch too: the loader's
        # labels became a mesh-sharded device array in prefetch, and a
        # bare np.asarray on it would fail multi-host like the logits
        return raw_step(state, batch), batch["labels"]

    fetch = replicate_eval_outputs(step_with_labels, mesh)

    def evaluate(state, loader) -> dict:
        correct = total = 0
        for batch in prefetch_to_device(loader.epoch(0), mesh=mesh):
            logits, labels = jax.device_get(fetch(state, batch))
            n = batch.get("num_real", batch["images"].shape[0])
            pred = np.argmax(logits[:n], axis=-1)
            labels = np.asarray(labels)[:n]
            correct += int((pred == labels).sum())
            total += int(n)
        return {"accuracy": correct / max(total, 1)}

    return evaluate
