"""Hook-driven trainer.

Parity surface: `pointcept/engines/train.py` — the ``TRAINERS`` registry, the
``before_train -> (before_epoch -> (before_step -> run_step -> after_step)* ->
after_epoch)* -> after_train`` hook lifecycle (`train.py:68-89,156-182`),
per-iteration LR scheduling, gradient accumulation and AMP.

TPU re-design of ``run_step`` (`train.py:184-245`): the whole optimizer step is
one pjit-compiled function over the device mesh — forward (optionally bf16),
backward, global-norm clip, optax update, BN-stat update.  Data parallelism is
mesh sharding of the padded batch (no DDP wrapper, no GradScaler: bf16 on TPU
needs no loss scaling).  Gradient accumulation splits the batch into
micro-batches averaged inside a ``lax.scan`` (``make_train_step`` below;
tested by tests/test_grad_accum.py).
"""

from __future__ import annotations

import functools
import os
import time
import weakref
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..datasets import Dataloader, build_dataset
from ..models import PointBatch, build_model
from ..parallel.mesh import create_mesh, shard_batch
from ..utils.env import set_seed
from ..utils.events import EventStorage, ExceptionWriter
from ..utils.logger import get_root_logger
from ..utils.optimizer import build_optimizer, label_params
from ..utils.registry import Registry
from ..utils.scheduler import build_scheduler
from .common import build_point_batch
from .hooks.builder import HOOKS, build_hooks

TRAINERS = Registry("trainers")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


class TrainerBase:
    def __init__(self):
        self.hooks = []
        self.epoch = 0
        self.start_epoch = 0
        self.max_epoch = 0
        self.comm_info: Dict[str, Any] = {}
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks_cfg):
        self.hooks = build_hooks(hooks_cfg)
        for h in self.hooks:
            h.trainer = weakref.proxy(self)

    def before_train(self):
        for h in self.hooks:
            h.before_train()

    def before_epoch(self):
        for h in self.hooks:
            h.before_epoch()

    def before_step(self):
        for h in self.hooks:
            h.before_step()

    def run_step(self):
        raise NotImplementedError

    def after_step(self):
        for h in self.hooks:
            h.after_step()

    def after_epoch(self):
        for h in self.hooks:
            h.after_epoch()
        self.storage.reset_histories()

    def after_train(self):
        self.storage.put_scalar("train_done", 1)
        for h in self.hooks:
            h.after_train()

    def train(self):
        with EventStorage() as self.storage, ExceptionWriter():
            self.before_train()
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                for self.comm_info["iter"], self.comm_info["input_dict"] in enumerate(self.train_loader):
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.after_epoch()
            self.after_train()


@TRAINERS.register_module("DefaultTrainer")
class Trainer(TrainerBase):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.max_epoch = cfg.eval_epoch  # data 'loop' folds real epochs like the reference
        self.best_metric_value = -float("inf")
        os.makedirs(cfg.save_path, exist_ok=True)
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "train.log"),
            file_mode="a" if cfg.get("resume", False) else "w",
        )
        self.logger.info("=> Loading config ...")
        self.logger.info(f"Save path: {cfg.save_path}")
        self.root_rng = set_seed(cfg.get("seed"))
        self.mesh = create_mesh(model=cfg.get("model_parallel", 1))
        self.logger.info(f"Mesh: {self.mesh}")

        self.logger.info("=> Building model ...")
        self.model = build_model(dict(cfg.model))
        self.logger.info("=> Building train dataset & loader ...")
        self.train_loader = self.build_train_loader()
        self.val_loader = self.build_val_loader()

        self.logger.info("=> Building optimizer & scheduler ...")
        total_steps = len(self.train_loader) * self.max_epoch
        base_lr = cfg.optimizer.get("lr", 1e-3)
        self.lr_schedule = build_scheduler(dict(cfg.scheduler), total_steps, base_lr)

        self.logger.info("=> Initializing parameters ...")
        self.state = self.init_state()
        self.register_hooks(cfg.get("hooks", _default_hooks()))
        self._train_step = self.make_train_step()
        self._eval_step = None  # built by evaluator hooks on demand

    # -- builders --------------------------------------------------------
    def build_train_loader(self):
        cfg = self.cfg
        dataset = build_dataset(dict(cfg.data.train))
        num_shards = jax.process_count()
        return Dataloader(
            dataset,
            batch_size=cfg.batch_size // num_shards,
            slot_size=cfg.slot_size,
            shuffle=True,
            drop_last=True,
            mix_prob=cfg.get("mix_prob", 0.0),
            seed=cfg.get("seed", 0) or 0,
            num_shards=num_shards,
            shard_id=jax.process_index(),
            num_workers=cfg.get("num_worker", 0),
        )

    def build_val_loader(self):
        cfg = self.cfg
        if not cfg.get("evaluate", True) or "val" not in cfg.data:
            return None
        dataset = build_dataset(dict(cfg.data.val))
        return Dataloader(
            dataset,
            batch_size=(cfg.get("batch_size_val") or cfg.batch_size) // jax.process_count(),
            slot_size=cfg.get("slot_size_val") or cfg.slot_size,
            shuffle=False,
            drop_last=False,
            mix_prob=0.0,
            num_shards=jax.process_count(),
            shard_id=jax.process_index(),
            num_workers=cfg.get("num_worker", 0),
        )

    def init_state(self) -> TrainState:
        sample = next(iter(self.train_loader))
        batch = shard_batch(sample, self.mesh)
        point = build_point_batch(batch)
        rng = self.root_rng
        init_rng, self.step_rng = jax.random.split(rng)
        init_fn = jax.jit(functools.partial(self.model.init, train=True))
        variables = init_fn(
            {"params": init_rng, "dropout": init_rng, "shuffle": init_rng, "mask": init_rng},
            point,
            batch,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        self.logger.info(f"Num params: {n_params}")

        opt_cfg = dict(self.cfg.optimizer)
        param_dicts = opt_cfg.get("param_dicts")
        labels = label_params(params, param_dicts) if param_dicts else None
        if opt_cfg.get("freeze_all_except"):
            from ..utils.optimizer import label_params_freeze

            labels = label_params_freeze(params, opt_cfg["freeze_all_except"])
        self.tx = build_optimizer(
            opt_cfg, self.lr_schedule, param_labels=labels, grad_clip=self.cfg.get("clip_grad")
        )
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=self.step_rng,
        )

    def make_train_step(self):
        model = self.model
        tx = self.tx
        amp_dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16}.get(self.cfg.get("amp", None))
        accum = int(self.cfg.get("gradient_accumulation_steps", 1) or 1)
        remat = bool(self.cfg.get("remat", False))

        def forward_loss(params, batch_stats, batch, num_samples, drop_rng, shuffle_rng):
            point = build_point_batch(batch, num_samples)
            if amp_dtype is not None:
                point = point.replace(feat=point.feat.astype(amp_dtype))
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                point,
                batch,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng, "shuffle": shuffle_rng, "mask": jax.random.fold_in(drop_rng, 7)},
            )
            return out["loss"].astype(jnp.float32), (mutated.get("batch_stats", {}), out)

        if remat:
            forward_loss = jax.checkpoint(forward_loss, static_argnums=(3,))

        def compute_grads(params, batch_stats, batch, num_samples: int, rng):
            """(loss, grads, new_batch_stats, scalar_metrics) over `batch`.

            Used directly under GSPMD jit, or per-shard inside the shard_map
            train step (where `batch`/`num_samples` are the local shard)."""
            if accum <= 1:
                drop_rng, shuffle_rng = jax.random.split(rng)
                (loss, (new_bs, out)), grads = jax.value_and_grad(forward_loss, has_aux=True)(
                    params, batch_stats, batch, num_samples, drop_rng, shuffle_rng
                )
            else:
                # micro-batch the sample slots (parity: loss/accum + deferred
                # optimizer step, `engines/train.py:196-241`)
                assert num_samples % accum == 0, (num_samples, accum)
                micro_b = num_samples // accum

                def to_micro(arr):
                    if arr.ndim == 0:
                        return jnp.broadcast_to(arr, (accum,))
                    return arr.reshape((accum, arr.shape[0] // accum) + arr.shape[1:])

                micro_batches = {k: to_micro(v) for k, v in batch.items()}

                def micro_step(carry, inputs):
                    grads_acc, loss_acc, bs = carry
                    mb, key = inputs
                    drop_rng, shuffle_rng = jax.random.split(key)
                    (loss, (new_bs, _)), grads = jax.value_and_grad(forward_loss, has_aux=True)(
                        params, bs, mb, micro_b, drop_rng, shuffle_rng
                    )
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    return (grads_acc, loss_acc + loss, new_bs), None

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
                keys = jax.random.split(rng, accum)
                (grads, loss, new_bs), _ = jax.lax.scan(
                    micro_step, (zero_grads, jnp.zeros(()), batch_stats), (micro_batches, keys)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss / accum
                out = {}
            metrics = {
                k: v
                for k, v in out.items()
                if k != "loss" and isinstance(v, jnp.ndarray) and v.ndim == 0
            }
            return loss, grads, new_bs, metrics

        # shard_map over the data axis: the model body runs PER SHARD, making
        # the serialization sorts manifestly sample-local — under plain GSPMD
        # XLA cannot prove batch-prefixed sort keys don't cross samples and
        # inserts per-sort all-gathers (~3.2 MB/step at dryrun scale, ~100 MB
        # at production scale; MULTICHIP_r04/PERF.md r4).  Gradients/loss are
        # pmean'd (DDP semantics, `engines/defaults.py:22-43`); batch-stat
        # sites psum their statistics internally (models/norm.py), so
        # batch_stats leave the shard_map replicated.
        use_shard_map = bool(self.cfg.get("shard_map_model", True))
        # gradient-compression analogue (reference: the optional fp16 DDP
        # comm hook, `engines/defaults.py:39-42`): cast gradients to a
        # half-width dtype for the cross-device mean, decompress after —
        # halves the all-reduce wire volume.  bf16 is the TPU-sane choice
        # (same exponent range as f32: no scaling needed, unlike fp16).
        # Only meaningful on the shard_map path, where the reduction is
        # explicit; the GSPMD fallback reduces at the compute dtype.
        grad_compress = self.cfg.get("grad_compress")  # None | "bf16" | "fp16"
        compress_dtype = {"bf16": jnp.bfloat16, "fp16": jnp.float16}.get(grad_compress)
        mesh = self.mesh
        n_data = int(mesh.shape["data"])
        P = jax.sharding.PartitionSpec

        def sharded_compute_grads(params, batch_stats, batch, num_samples: int, rng):
            local_ns = num_samples // n_data

            def shard_fn(params, batch_stats, batch, rng):
                # distinct per-shard dropout/shuffle streams
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                loss, grads, new_bs, metrics = compute_grads(
                    params, batch_stats, batch, local_ns, rng
                )
                loss = jax.lax.pmean(loss, "data")
                if compress_dtype is not None:
                    grads = jax.tree_util.tree_map(
                        lambda g: jax.lax.pmean(
                            g.astype(compress_dtype), "data"
                        ).astype(g.dtype),
                        grads,
                    )
                else:
                    grads = jax.lax.pmean(grads, "data")
                metrics = {k: jax.lax.pmean(v, "data") for k, v in metrics.items()}
                return loss, grads, new_bs, metrics

            # replicate small per-sample arrays the same way shard_batch does
            batch_specs = {
                k: P("data") if v.ndim > 0 and v.shape[0] % n_data == 0 else P()
                for k, v in batch.items()
            }
            return jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), batch_specs, P()),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            )(params, batch_stats, batch, rng)

        def train_step(state: TrainState, batch, num_samples: int):
            rng = jax.random.fold_in(state.rng, state.step)

            shardable = (
                use_shard_map
                and n_data > 1
                and num_samples % n_data == 0
                and (accum <= 1 or (num_samples // n_data) % accum == 0)
            )
            grad_fn = sharded_compute_grads if shardable else compute_grads
            loss, grads, new_bs, out = grad_fn(
                state.params, state.batch_stats, batch, num_samples, rng
            )

            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            ema_cfg = self.cfg.get("ema")
            if ema_cfg:
                # teacher EMA for self-distillation SSL (Sonata): copy
                # src subtree -> dst subtree with momentum after each step.
                # momentum may be a cosine schedule dict (reference
                # `sonata_v1m1_base.py:222-227`: base -> final over training)
                m_cfg = ema_cfg.get("momentum", 0.996)
                if isinstance(m_cfg, dict):
                    base = float(m_cfg.get("base", 0.996))
                    final = float(m_cfg.get("final", 1.0))
                    total = float(m_cfg.get("total_steps") or self.total_steps)
                    frac = jnp.minimum(state.step.astype(jnp.float32) / total, 1.0)
                    m = final - (final - base) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
                else:
                    m = float(m_cfg)
                for src, dst in ema_cfg.get("pairs", []):
                    if src in new_params and dst in new_params:
                        new_params = dict(new_params)
                        new_params[dst] = jax.tree_util.tree_map(
                            lambda t, s: m * t + (1 - m) * s, new_params[dst], new_params[src]
                        )
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
            )
            metrics = {"loss": loss, **out}
            return new_state, metrics

        return jax.jit(train_step, static_argnums=(2,), donate_argnums=(0,))

    # -- loop ------------------------------------------------------------
    def run_step(self):
        batch_np = self.comm_info["input_dict"]
        batch = shard_batch(batch_np, self.mesh)
        num_samples = batch.pop("num_samples", batch_np["num_samples"])
        self.state, metrics = self._train_step(self.state, batch, num_samples)
        self.comm_info["metrics"] = metrics
        self.comm_info["lr"] = float(self.lr_schedule(int(self.state.step) - 1))

    def before_epoch(self):
        self.train_loader.set_epoch(self.epoch)
        super().before_epoch()

    def train(self):
        self.logger.info(">>>>>>>>>>>>>>>> Start Training >>>>>>>>>>>>>>>>")
        super().train()
        self.logger.info("==>Training done!")


@TRAINERS.register_module("MultiDatasetTrainer")
class MultiDatasetTrainer(Trainer):
    """PPT multi-dataset training (parity: `engines/train.py:358` +
    `datasets/dataloader.py:23`): one sub-loader per dataset, round-robin,
    per-dataset ``loop`` as the mix ratio; each batch carries its dataset's
    ``condition`` index."""

    def build_train_loader(self):
        from ..datasets import MultiDatasetLoader

        cfg = self.cfg
        num_shards = jax.process_count()
        loaders = []
        for i, ds_cfg in enumerate(cfg.data.train.datasets):
            ds_cfg = dict(ds_cfg)
            condition = ds_cfg.pop("condition", i)
            dataset = _ConditionedDataset(build_dataset(ds_cfg), condition)
            loaders.append(
                Dataloader(
                    dataset,
                    batch_size=cfg.batch_size // num_shards,
                    slot_size=cfg.slot_size,
                    shuffle=True,
                    drop_last=True,
                    mix_prob=cfg.get("mix_prob", 0.0),
                    seed=(cfg.get("seed", 0) or 0) + i,
                    num_shards=num_shards,
                    shard_id=jax.process_index(),
                )
            )
        return MultiDatasetLoader(loaders)

    def before_epoch(self):
        self.train_loader.set_epoch(self.epoch)
        TrainerBase.before_epoch(self)


class _ConditionedDataset:
    """Wrap a dataset to stamp a per-sample integer ``condition``."""

    def __init__(self, dataset, condition: int):
        self.dataset = dataset
        self.condition = condition

    def __getitem__(self, idx):
        data = self.dataset[idx]
        data["condition"] = np.asarray(self.condition, np.int32)
        return data

    def __len__(self):
        return len(self.dataset)


def _default_hooks():
    return [
        dict(type="IterationTimer", warmup_iter=2),
        dict(type="InformationWriter"),
        dict(type="CheckpointSaver"),
    ]
