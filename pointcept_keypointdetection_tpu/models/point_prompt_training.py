"""Point Prompt Training (PPT) — multi-dataset joint training.

Parity surface: `pointcept/models/point_prompt_training/` —
* ``PDNorm`` (`prompt_driven_normalization.py:7-47`): per-dataset-condition
  decoupled normalization + optional adaptive scale/shift from a context
  embedding.  TPU design: ONE stat computation with per-condition
  scale/bias/running-stat tables gathered by the sample's condition index
  (instead of N separate module branches) — same math, no branching.
* ``PPT-v1m2`` decoupled wrapper (`point_prompt_training_v1m2_decoupled.py:
  18-60`): condition -> embedding-table context injected into the stem
  features + per-dataset segmentation heads selected by condition.

The condition index rides the batch dict as ``condition`` (int32 per sample);
`MultiDatasetLoader` batches are single-dataset, so the index is uniform per
batch but the implementation supports mixed batches.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.mesh import psum_if_bound
from .builder import MODELS, MODULES, build_model
from .losses import build_criteria
from .structure import PointBatch


@MODULES.register_module()
class PDNorm(nn.Module):
    """Prompt-driven BatchNorm with per-condition parameter/stat tables."""

    features: int
    num_conditions: int
    eps: float = 1e-3
    momentum: float = 0.01
    adaptive: bool = False
    context_channels: int = 256

    @nn.compact
    def __call__(self, x, valid, condition, context=None, use_running_average: bool = True):
        """x [N, C]; condition int32[N] (per point); context [N, ctx] optional."""
        C, M = self.features, self.num_conditions
        scale = self.param("scale", nn.initializers.ones, (M, C), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (M, C), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((M, C), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((M, C), jnp.float32))

        cond = jnp.clip(condition, 0, M - 1)
        w = valid.astype(jnp.float32)[:, None]
        if use_running_average:
            mean = jnp.take(ra_mean.value, cond, axis=0)
            var = jnp.take(ra_var.value, cond, axis=0)
        else:
            # per-condition masked statistics in one pass; psum_if_bound keeps
            # them global under the shard_map train step (no-op in plain jit)
            onehot = jax.nn.one_hot(cond, M) * w  # [N, M]
            cnt_m = psum_if_bound(jnp.sum(onehot, axis=0))  # [M]
            count = jnp.maximum(cnt_m, 1.0)[:, None]  # [M, 1]
            xf = x.astype(jnp.float32)
            mean_m = psum_if_bound(onehot.T @ xf) / count  # [M, C]
            var_m = psum_if_bound(onehot.T @ jnp.square(xf)) / count - jnp.square(mean_m)
            if not self.is_initializing():
                seen = (cnt_m > 0)[:, None]
                mom = self.momentum * seen
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean_m
                ra_var.value = (1 - mom) * ra_var.value + mom * jnp.maximum(var_m, 0.0)
            mean = jnp.take(mean_m, cond, axis=0)
            var = jnp.take(jnp.maximum(var_m, 0.0), cond, axis=0)

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * jnp.take(scale, cond, axis=0) + jnp.take(bias, cond, axis=0)
        if self.adaptive and context is not None:
            mod = nn.Dense(2 * C, use_bias=False, name="modulation")(nn.silu(context))
            g, b = jnp.split(mod, 2, axis=-1)
            y = y * (1 + g) + b
        return y.astype(x.dtype)


@MODELS.register_module("PPT-v1m2")
class PointPromptTraining(nn.Module):
    """Decoupled-head multi-dataset segmentor.

    backbone is any registered backbone returning per-point features; the
    condition embedding is concatenated to the input features (prompting the
    stem), and each dataset gets its own linear head.
    """

    backbone: Dict[str, Any]
    criteria: Sequence[Dict[str, Any]] = ()
    conditions: Sequence[str] = ("ScanNet", "S3DIS", "Structured3D")
    num_classes: Sequence[int] = (20, 13, 25)
    context_channels: int = 32
    backbone_out_channels: int = 64

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        M = len(self.conditions)
        cond_per_sample = batch.get(
            "condition", jnp.zeros((point.num_samples,), jnp.int32)
        ).reshape(-1).astype(jnp.int32)
        cond = jnp.repeat(cond_per_sample, point.slot_size)  # [N]

        embed = self.param(
            "condition_embedding", nn.initializers.normal(0.02), (M, self.context_channels), jnp.float32
        )
        context = jnp.take(embed, jnp.clip(cond, 0, M - 1), axis=0)
        point = point.replace(feat=jnp.concatenate([point.feat, context.astype(point.feat.dtype)], axis=-1))

        bb_cfg = dict(self.backbone)
        bb = build_model(bb_cfg)
        if bb_cfg.get("pdnorm_conditions"):
            # backbone-internal PDNorm (SpUNet-v1m3 wiring): the per-sample
            # dataset index conditions every norm site in the backbone
            feat = bb(point, train=train, condition=cond_per_sample)
        else:
            feat = bb(point, train=train)

        # decoupled per-dataset heads, padded to the max class count
        max_k = max(self.num_classes)
        logits_all = []
        for i, k in enumerate(self.num_classes):
            logit = nn.Dense(k, name=f"seg_head_{self.conditions[i]}")(feat)
            pad = jnp.full((feat.shape[0], max_k - k), -1e9, logit.dtype)
            logits_all.append(jnp.concatenate([logit, pad], axis=-1))
        logits = jnp.stack(logits_all, axis=1)  # [N, M, max_k]
        logits = jnp.take_along_axis(
            logits, jnp.clip(cond, 0, M - 1)[:, None, None].repeat(max_k, axis=2), axis=1
        )[:, 0]

        out = {"seg_logits": logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["segment"], valid=point.valid)
        return out


@MODELS.register_module("PPT-v1m1")
# v1m3 ("neo", `point_prompt_training_v1m3_neo.py`) is the same language-
# guided alignment with per-dataset class-name lists instead of a shared
# vocabulary — covered here by omitting ``valid_index`` (each condition then
# owns a contiguous slice of the embedding table sized by ``num_classes``).
@MODELS.register_module("PPT-v1m3")
class LanguageGuidedPPT(nn.Module):
    """Language-driven categorical alignment multi-dataset segmentor.

    Parity surface: `point_prompt_training_v1m1_language_guided.py:18-120` —
    a shared class vocabulary is embedded in a text space; per-point features
    are projected into that space and classified by scaled cosine similarity
    against the embeddings of the classes valid for the sample's dataset
    (``valid_index``).  The reference obtains the embeddings from a frozen
    CLIP text encoder at init; CLIP is not part of this image, so the table is
    either loaded from ``class_embedding_path`` (a [num_names, embed_dim] .npy
    exported offline from any text encoder) and kept frozen, or — when no path
    is given — learned end-to-end (language-free fallback with identical
    alignment machinery).
    """

    backbone: Dict[str, Any]
    criteria: Sequence[Dict[str, Any]] = ()
    conditions: Sequence[str] = ("Structured3D", "ScanNet", "S3DIS")
    # unified vocabulary; only the length matters when embeddings are learned
    class_name: Sequence[str] = ()
    # per-condition indices into class_name; None -> contiguous slices sized
    # by num_classes (v1m3 semantics)
    valid_index: Any = None
    # prompt template for the offline CLIP export (reference `template="[x]"`,
    # `point_prompt_training_v1m1_language_guided.py:67`); unused at runtime —
    # tools/export_clip_class_embeddings.py reads it from the config
    template: str = "[x]"
    num_classes: Sequence[int] = (25, 20, 13)
    context_channels: int = 256
    backbone_out_channels: int = 96
    embed_dim: int = 512
    class_embedding_path: Any = None
    backbone_mode: bool = False

    def _valid_index(self):
        if self.valid_index is not None:
            return [tuple(v) for v in self.valid_index]
        out, start = [], 0
        for k in self.num_classes:
            out.append(tuple(range(start, start + k)))
            start += k
        return out

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        M = len(self.conditions)
        valid_index = self._valid_index()
        num_names = len(self.class_name) if len(self.class_name) else (
            max(max(v) for v in valid_index) + 1
        )

        cond_per_sample = batch.get(
            "condition", jnp.zeros((point.num_samples,), jnp.int32)
        ).reshape(-1).astype(jnp.int32)
        cond = jnp.repeat(cond_per_sample, point.slot_size)  # [N]

        bb_cfg = dict(self.backbone)
        bb = build_model(bb_cfg)
        if bb_cfg.get("pdnorm_conditions"):
            # PDNorm-conditioned backbone: conditioning flows through the
            # per-condition norm tables only (the reference's context-adaptive
            # PDNorm modulation delta is documented in docs/migration.md) —
            # no stem injection, no unused embedding parameters
            feat = bb(point, train=train, condition=cond_per_sample)
        else:
            # data-driven context: condition embedding prompts the stem
            embed = self.param(
                "condition_embedding",
                nn.initializers.normal(0.02),
                (M, self.context_channels),
                jnp.float32,
            )
            context = jnp.take(embed, jnp.clip(cond, 0, M - 1), axis=0)
            stem_ctx = nn.Dense(point.feat.shape[-1], name="context_proj")(context)
            point = point.replace(feat=point.feat + stem_ctx.astype(point.feat.dtype))
            feat = bb(point, train=train)

        if self.backbone_mode:
            return feat

        # class embedding table (frozen text embeddings or learned)
        if self.class_embedding_path is not None:
            import numpy as _np

            table = jnp.asarray(_np.load(self.class_embedding_path), jnp.float32)
            assert table.shape[0] == num_names, (table.shape, num_names)
        else:
            table = self.param(
                "class_embedding",
                nn.initializers.normal(0.02),
                (num_names, self.embed_dim),
                jnp.float32,
            )
        table = table / jnp.maximum(jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-6)

        proj = nn.Dense(table.shape[1], name="proj_head")(feat)
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-6)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1.0 / 0.07)), (), jnp.float32
        )
        sim = proj @ table.T  # [N, num_names]

        # per-condition class selection, padded to the widest dataset
        max_k = max(len(v) for v in valid_index)
        sel_rows = []
        for v in valid_index:
            idx = list(v) + [0] * (max_k - len(v))
            gathered = sim[:, jnp.asarray(idx, jnp.int32)]
            pad_mask = jnp.arange(max_k) < len(v)
            sel_rows.append(jnp.where(pad_mask[None, :], gathered, -1e9))
        logits = jnp.stack(sel_rows, axis=1)  # [N, M, max_k]
        logits = jnp.take_along_axis(
            logits, jnp.clip(cond, 0, M - 1)[:, None, None].repeat(max_k, axis=2), axis=1
        )[:, 0]
        logits = jnp.exp(logit_scale) * logits

        out = {"seg_logits": logits}
        if "segment" in batch and len(self.criteria) > 0:
            crit = build_criteria([dict(c) for c in self.criteria])
            out["loss"] = crit(logits, batch["segment"], valid=point.valid)
        return out
