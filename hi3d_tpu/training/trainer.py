"""Training orchestration: the TPU-native replacement for the reference's
PyTorch-Lightning + DeepSpeed launcher.

Functional parity targets (reference file:line):
- train_ddp_spawn.py:151-466 — config merge, seeding, logdir/code snapshot,
  LR scaling (lr = world·accum·bs·base_lr, :401-409), resume from
  checkpoints/last, SIGUSR1 → save (:417-434), final checkpoint on exception.
- vtdm/callbacks.py — SetupCallback (logdir+config dump :22-67), ImageLogger
  (periodic log_images → media under image_log/ :70-143), CUDACallback
  (epoch timing + peak memory :146-166), TextProgressBar (:169-277).
- configs/train-v01.yaml lightning subtree — every_n_train_steps
  checkpointing, accumulate_grad_batches, max_epochs.

TPU-native shape: one jitted, mesh-sharded train step (hi3d_tpu.training.step
— DP over "data", ZeRO-sharded optimizer state), orbax CheckpointManager for
sharded async save/resume, host-side prefetch loader, jax.profiler hooks.
"""

from __future__ import annotations

import json
import os
import signal
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel.mesh import get_mesh
from .state import TrainState, build_optimizer
from .step import make_train_step, place_state

ARRAY_BATCH_KEYS_DROP = ("caption",)  # non-array keys stripped before jit


def device_memory_stats() -> Dict[str, float]:
    """Peak/current device memory in GB (CUDACallback parity,
    vtdm/callbacks.py:146-166 — torch.cuda.max_memory_allocated)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "mem_gb": round(stats.get("bytes_in_use", 0) / 2**30, 3),
            "peak_mem_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 3),
        }
    except Exception:
        return {}


class MetricsLogger:
    """Scalar metrics → console + metrics.jsonl + a config-selected backend.

    Backend parity with the reference's logger choice
    (train_ddp_spawn.py:256-280: TestTube/TensorBoard default, wandb
    option): `backend="tensorboard"` writes event files under
    `<logdir>/tb/` readable by TensorBoard; `backend="wandb"` forwards to a
    wandb run when the package + login exist; `backend=None`/"jsonl" keeps
    the round-1 behavior. metrics.jsonl and console output are always on —
    they are the machine-readable source of truth."""

    def __init__(self, logdir: str, log_every: int = 10,
                 backend: Optional[str] = "tensorboard"):
        self.path = os.path.join(logdir, "metrics.jsonl")
        self.log_every = log_every
        self._t0 = time.time()
        self._tb = None
        self._wandb = None
        if backend in ("tensorboard", "testtube"):
            try:
                # host-side event writing only; torch is the env's TB writer
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(logdir, "tb"))
            except Exception as e:  # missing tb/torch → jsonl-only
                print(f"[trainer] tensorboard backend unavailable ({e!r}); "
                      "falling back to metrics.jsonl only")
        elif backend == "wandb":
            try:
                import wandb

                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "hi3d_tpu"),
                    dir=logdir, resume="allow",
                )
            except Exception as e:
                print(f"[trainer] wandb backend unavailable ({e!r}); "
                      "falling back to metrics.jsonl only")

    def __call__(self, step: int, metrics: Dict[str, Any]) -> None:
        if step % self.log_every:
            return
        rec = {"step": step, "wall_s": round(time.time() - self._t0, 2)}
        rec.update(device_memory_stats())
        rec.update({
            k: (float(v) if not isinstance(v, (str, list)) else v)
            for k, v in metrics.items()
        })
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        scalars = {
            k: v for k, v in rec.items()
            if isinstance(v, (int, float)) and k != "step"
        }
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, global_step=step)
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        pretty = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in rec.items() if k != "wall_s"
        )
        print(f"[train] {pretty}", flush=True)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class ImageLogger:
    """Periodic media dumps (reference vtdm/callbacks.py:70-143)."""

    def __init__(self, logdir: str, every_n_steps: int = 200, max_videos: int = 1,
                 fps: int = 8):
        self.dir = os.path.join(logdir, "image_log")
        self.every = every_n_steps
        self.max_videos = max_videos
        self.fps = fps

    def maybe_log(self, engine, batch: Dict, step: int) -> None:
        if step % self.every:
            return
        from ..utils.video import export_to_video, tensor2vid

        try:
            media = engine.log_images(batch, n=self.max_videos)
        except Exception as e:  # logging must never kill training
            print(f"[image_log] skipped at step {step}: {e}")
            return
        try:
            os.makedirs(self.dir, exist_ok=True)
            for key, vid in media.items():
                for i in range(min(len(vid), self.max_videos)):
                    if np.ndim(vid[i]) == 3:  # image entry ('conditioning')
                        import imageio

                        img = ((np.asarray(vid[i]) + 1.0) * 127.5).clip(0, 255)
                        imageio.imwrite(
                            os.path.join(
                                self.dir, f"step{step:08d}_{key}_{i}.png"
                            ),
                            img.astype(np.uint8),
                        )
                        continue
                    frames = tensor2vid(vid[i])
                    export_to_video(
                        frames,
                        os.path.join(self.dir, f"step{step:08d}_{key}_{i}.mp4"),
                        fps=self.fps,
                    )
        except Exception as e:  # logging must never kill training
            print(f"[image_log] export failed at step {step}: {e}")


class Checkpointer:
    """Orbax-backed sharded checkpointing with last/resume parity.

    With `monitor` set, retention keeps the best `max_to_keep` checkpoints by
    that metric (reference ModelCheckpoint top-10 on `model.monitor`,
    train_ddp_spawn.py:284-296); otherwise the most recent ones.
    """

    def __init__(
        self,
        logdir: str,
        every_n_steps: int = 3000,
        max_to_keep: int = 10,
        monitor: Optional[str] = None,
        mode: str = "min",
    ):
        import orbax.checkpoint as ocp

        self.dir = os.path.join(os.path.abspath(logdir), "checkpoints")
        self.every = every_n_steps
        self.monitor = monitor
        self.mode = mode
        opts = dict(max_to_keep=max_to_keep, create=True)
        if monitor is not None:
            opts["best_fn"] = lambda m: float(m.get(monitor, 0.0))
            opts["best_mode"] = mode
        self.manager = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(**opts)
        )

    def save(
        self,
        step: int,
        state: TrainState,
        force: bool = False,
        metrics: Optional[Dict] = None,
    ) -> None:
        """Asynchronous save: device arrays go to orbax directly (it copies
        them to host synchronously, then writes to storage in the
        background), so the train loop resumes immediately — the reference
        blocks training for the whole ModelCheckpoint write. Passing
        jax.Arrays (not np.asarray copies) also keeps multi-host sharded
        state savable: each host hands orbax only its addressable shards.
        `force=True` (final/signal saves) blocks until the write is durable.
        """
        import orbax.checkpoint as ocp

        kw = {}
        if self.monitor is not None:
            m = {k: float(v) for k, v in (metrics or {}).items()
                 if np.isscalar(v) or np.ndim(v) == 0}
            # a save without the metric (e.g. crash before the first step)
            # must rank WORST, not best
            m.setdefault(self.monitor, float("inf") if self.mode == "min"
                         else float("-inf"))
            kw["metrics"] = m
        # one in-flight async save at a time (orbax requirement)
        self.manager.wait_until_finished()
        self.manager.save(step, args=ocp.args.StandardSave(state), **kw)
        if force:
            self.manager.wait_until_finished()

    def maybe_save(
        self, step: int, state: TrainState, metrics: Optional[Dict] = None
    ) -> None:
        if step and step % self.every == 0:
            self.save(step, state, metrics=metrics)

    def latest_step(self) -> Optional[int]:
        self.manager.wait_until_finished()  # surface in-flight saves
        return self.manager.latest_step()

    def close(self) -> None:
        """Block until any in-flight async save is durable."""
        self.manager.wait_until_finished()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        import orbax.checkpoint as ocp

        self.manager.wait_until_finished()
        step = step if step is not None else self.manager.latest_step()
        # shape/dtype template without pulling the live state to host
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                getattr(x, "shape", np.shape(x)),
                getattr(x, "dtype", None) or np.asarray(x).dtype,
            ),
            state,
        )
        return self.manager.restore(step, args=ocp.args.StandardRestore(abstract))


class Trainer:
    """Functional fit() loop over a jitted mesh-sharded train step."""

    def __init__(
        self,
        engine,
        logdir: str = "logs/run",
        base_lr: Optional[float] = None,
        scale_lr: bool = True,
        accumulate_grad_batches: int = 1,
        batch_size: int = 1,
        mesh=None,
        ckpt_every_n_steps: int = 3000,
        log_images_every: int = 200,
        log_every: int = 10,
        max_to_keep: int = 10,
        monitor: Optional[str] = None,  # default: engine.monitor
        monitor_mode: str = "min",
        seed: int = 0,
        grad_clip: Optional[float] = None,
        profile_steps: Optional[Tuple[int, int]] = None,  # (start, stop)
        logger_backend: Optional[str] = "tensorboard",
    ):
        self.engine = engine
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.mesh = mesh if mesh is not None else get_mesh()
        self.accum = int(accumulate_grad_batches)
        self.seed = seed

        base_lr = base_lr if base_lr is not None else (
            engine.base_learning_rate or 1e-5
        )
        world = self.mesh.devices.size  # global (multi-host meshes span hosts)
        self.learning_rate = (
            base_lr * world * self.accum * batch_size if scale_lr else base_lr
        )
        print(
            f"[trainer] lr = {self.learning_rate:.3g} "
            f"(base {base_lr:.3g} × world {world} × accum {self.accum} × bs {batch_size}, "
            f"scale_lr={scale_lr})"
        )

        scheduler = None
        if engine.scheduler_config:
            from ..config import instantiate_from_config

            scheduler = instantiate_from_config(engine.scheduler_config)

        if engine.params is None:
            raise ValueError("engine.init() must run before Trainer()")
        self.tx = build_optimizer(
            self.learning_rate,
            engine.params,
            trained_param_keys=tuple(
                getattr(engine, "trained_param_keys", ("all",))
            ),
            scheduler=scheduler,
            grad_clip=grad_clip,
        )
        state = TrainState.create(engine.params, self.tx, use_ema=engine.use_ema)
        self.state = place_state(state, self.mesh)

        loss_fn = engine.make_loss_fn()
        self._step_factory = make_train_step(
            loss_fn,
            self.tx,
            mesh=self.mesh,
            ema_decay=engine.ema_decay_rate,
            accum_steps=self.accum,
        )
        self._compiled_step = None

        self.profile_steps = profile_steps
        self.metrics = MetricsLogger(
            logdir, log_every=log_every, backend=logger_backend
        )
        self.image_logger = ImageLogger(logdir, every_n_steps=log_images_every)
        self.checkpointer = Checkpointer(
            logdir,
            every_n_steps=ckpt_every_n_steps,
            max_to_keep=max_to_keep,
            monitor=monitor or getattr(engine, "monitor", None),
            mode=monitor_mode,
        )
        self._interrupted = False

    # ----------------------------------------------------------- utilities
    def _device_batch(self, batch: Dict) -> Dict:
        """Host batch → device arrays.

        Multi-host: each process's loader yields its LOCAL rows (per-device
        bs × local devices, seeded per process); they are assembled into one
        logically-global array via make_array_from_process_local_data so the
        mesh-sharded step sees the full global batch. Single-host: plain
        device arrays (the jitted step's in_shardings place them)."""
        from ..parallel.mesh import batch_sharding

        multi = jax.process_count() > 1
        out = {}
        for k, v in batch.items():
            # strings and python-int statics (num_video_frames) stay host-side
            if k in ARRAY_BATCH_KEYS_DROP or isinstance(v, (str, list, int)):
                continue
            if multi and np.ndim(v) >= 1:
                out[k] = jax.make_array_from_process_local_data(
                    batch_sharding(self.mesh, np.ndim(v)), np.asarray(v)
                )
            else:
                out[k] = jnp.asarray(v)
        return out

    def _install_signal_handler(self):
        # SIGUSR1 → checkpoint (reference train_ddp_spawn.py:417-427 "melk")
        def melk(*_):
            print("[trainer] SIGUSR1 — saving checkpoint")
            self._interrupted = True

        try:
            signal.signal(signal.SIGUSR1, melk)
        except ValueError:
            pass  # non-main thread (tests)

    def resume_if_possible(self) -> int:
        step = self.checkpointer.latest_step()
        if step is None:
            return 0
        restored = self.checkpointer.restore(self.state, step)
        self.state = place_state(
            TrainState(
                step=jnp.asarray(restored.step),
                params=restored.params,
                opt_state=restored.opt_state,
                ema_params=restored.ema_params,
            ),
            self.mesh,
        )
        print(f"[trainer] resumed from step {step}")
        return int(step)

    # ----------------------------------------------------------------- fit
    def fit(
        self,
        data: Iterator[Dict],
        max_steps: int,
        resume: bool = True,
    ) -> TrainState:
        engine = self.engine
        self._install_signal_handler()
        start = self.resume_if_possible() if resume else 0
        rng = jax.random.PRNGKey(self.seed)

        step = start
        try:
            for batch in data:
                if step >= max_steps or self._interrupted:
                    break
                host_rng = jax.random.fold_in(rng, 2 * step)
                batch = engine.add_custom_cond(batch, infer=False, rng=host_rng)
                dev_batch = self._device_batch(batch)
                if self._compiled_step is None:
                    t0 = time.time()
                    self._compiled_step = self._step_factory(self.state, dev_batch)
                    print(f"[trainer] step compiled in {time.time() - t0:.1f}s")
                # jax.profiler window (the reference only has Lightning's
                # exit-time summary; this gives a real XLA trace)
                if self.profile_steps and step == self.profile_steps[0]:
                    jax.profiler.start_trace(
                        os.path.join(self.logdir, "profile")
                    )
                t0 = time.time()
                self.state, metrics = self._compiled_step(
                    self.state, dev_batch, jax.random.fold_in(rng, 2 * step + 1)
                )
                step += 1
                if self.profile_steps and step == self.profile_steps[1]:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                metrics = dict(metrics)
                metrics["sec_per_step"] = time.time() - t0
                self._last_metrics = metrics
                self.metrics(step, metrics)
                self.image_logger.maybe_log(
                    self._engine_with_state(), batch, step
                )
                self.checkpointer.maybe_save(step, self.state, metrics)
        except KeyboardInterrupt:
            print("[trainer] interrupted — saving last checkpoint")
        finally:
            self.checkpointer.save(
                step, self.state, force=True,
                metrics=getattr(self, "_last_metrics", None),
            )
            self.checkpointer.close()
            self.metrics.close()
        return self.state

    def _engine_with_state(self):
        """Engine view with current (EMA) params for log_images."""
        self.engine.params = self.state.params
        self.engine.ema_params = self.state.ema_params
        return self.engine
