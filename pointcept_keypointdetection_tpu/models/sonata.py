"""Sonata — self-distillation SSL pretraining, TPU-native.

Capability parity with `pointcept/models/sonata/sonata_v1m1_base.py`:
student/teacher self-distillation — the student sees a masked view, the
teacher (an EMA copy of the student) sees the clean view; per-point features
are projected and assigned to learned prototypes (``OnlineCluster``) with a
Sinkhorn-normalized teacher distribution; the loss is cross-entropy between
student predictions and teacher assignments over masked points, plus an
optional cross-view term through exact origin matching.

TPU re-design of the teacher: instead of the reference's model-as-hook EMA
(`HookBase` model methods), the teacher backbone is a sibling submodule whose
outputs are ``stop_gradient``-ed; the trainer EMA-copies
``student_backbone -> teacher_backbone`` parameters inside the jitted train
step (``cfg.ema = dict(src="student_backbone", dst="teacher_backbone",
momentum=0.996)``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS, build_model
from .masked_scene_contrast import match_views
from .structure import PointBatch


def sinkhorn(logits: jnp.ndarray, iters: int = 3, eps: float = 1.0) -> jnp.ndarray:
    """Sinkhorn-Knopp normalization of (already temperature-scaled) assignment
    logits [N, P] -> soft targets. Max-subtracted for numerical stability."""
    q = jnp.exp((logits - jnp.max(logits)) / eps)
    q = q / jnp.maximum(jnp.sum(q), 1e-8)
    for _ in range(iters):
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), 1e-8)  # columns: prototypes
        q = q / q.shape[1]
        q = q / jnp.maximum(jnp.sum(q, axis=1, keepdims=True), 1e-8)  # rows: points
        q = q / q.shape[0]
    return q * q.shape[0]


class ProjectionHead(nn.Module):
    hidden: int = 256
    out: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.out)(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


@MODELS.register_module("Sonata-v1m1")
# v1m2 (`sonata_v1m2_uni_teacher_head.py`): the teacher shares the student's
# projection head instead of owning an EMA copy — set ``uni_head=True``.
@MODELS.register_module("Sonata-v1m2")
# v1m3 (`sonata_v1m3_distill.py`): distillation from a FROZEN pretrained
# teacher — same module; drop ``cfg.ema`` so the trainer never EMA-copies, and
# load teacher weights via CheckpointLoader keyword rewrite
# (keywords="backbone.", replacement="teacher_backbone.").
@MODELS.register_module("Sonata-v1m3")
class Sonata(nn.Module):
    backbone: Dict[str, Any]
    backbone_in_channels: int = 6
    num_prototypes: int = 1024
    proj_dim: int = 128
    student_temp: float = 0.1
    teacher_temp: float = 0.05
    mask_rate: float = 0.5
    mask_grid: int = 8
    num_matches: int = 2048
    uni_head: bool = False  # v1m2: teacher reuses the student's head

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        def view(i):
            return PointBatch(
                coord=batch[f"view{i}_coord"],
                feat=batch[f"view{i}_feat"],
                grid_coord=batch[f"view{i}_grid_coord"].astype(jnp.int32),
                valid=batch[f"view{i}_valid"],
                num_samples=point.num_samples,
            )

        v1 = view(1)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (self.backbone_in_channels,), jnp.float32
        )
        if train:
            rng = self.make_rng("mask")
            sv = v1.grid_coord >> (self.mask_grid - 1).bit_length()
            h = (
                sv[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
                ^ sv[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
                ^ sv[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
            )
            salt = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
            masked = ((h ^ salt) * jnp.uint32(2654435761)) < jnp.uint32(int(self.mask_rate * 0xFFFFFFFF))
        else:
            masked = jnp.zeros(v1.num_points, bool)

        # stable submodule names let the trainer EMA-copy student -> teacher
        student_bb = build_model(dict(self.backbone, name="student_backbone"))
        teacher_bb = build_model(dict(self.backbone, name="teacher_backbone"))
        s_in = v1.replace(feat=jnp.where(masked[:, None], mask_token.astype(v1.feat.dtype), v1.feat))
        s_feat = student_bb(s_in, train=train)
        t_feat = jax.lax.stop_gradient(teacher_bb(v1, train=False))

        student_head = ProjectionHead(out=self.proj_dim, name="student_head")
        teacher_head = (
            student_head if self.uni_head
            else ProjectionHead(out=self.proj_dim, name="teacher_head")
        )
        s_proj = student_head(s_feat)
        t_proj = jax.lax.stop_gradient(teacher_head(t_feat))
        prototypes = self.param(
            "prototypes", nn.initializers.normal(0.02), (self.num_prototypes, self.proj_dim), jnp.float32
        )
        proto = prototypes / jnp.maximum(jnp.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-6)

        s_logits = s_proj @ proto.T / self.student_temp  # [N, P]
        t_logits = t_proj @ proto.T
        w = (masked & v1.valid).astype(jnp.float32)
        t_assign = jax.lax.stop_gradient(sinkhorn(t_logits / self.teacher_temp))
        logp = jax.nn.log_softmax(s_logits, axis=-1)
        ce = -jnp.sum(t_assign * logp, axis=-1)
        loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        out = {"loss": loss, "distill_loss": loss}
        # cross-view consistency on matched points (view2 optional)
        if "view2_coord" in batch:
            v2 = view(2)
            t2_feat = jax.lax.stop_gradient(teacher_bb(v2, train=False))
            t2_proj = jax.lax.stop_gradient(teacher_head(t2_feat))
            idx1, idx2, mvalid = match_views(
                batch["view1_origin"].reshape(-1), v1.valid,
                batch["view2_origin"].reshape(-1), v2.valid,
                v1.batch, self.num_matches, v1.slot_size,
            )
            s_m = jnp.take(s_logits, idx1, axis=0)
            t_m = jax.lax.stop_gradient(
                sinkhorn(jnp.take(t2_proj @ proto.T, idx2, axis=0) / self.teacher_temp)
            )
            ce2 = -jnp.sum(t_m * jax.nn.log_softmax(s_m, axis=-1), axis=-1)
            wm = mvalid.astype(jnp.float32)
            cross = jnp.sum(ce2 * wm) / jnp.maximum(jnp.sum(wm), 1.0)
            out["cross_loss"] = cross
            out["loss"] = loss + cross
        return out
