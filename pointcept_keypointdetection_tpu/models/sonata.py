"""Sonata — self-distillation SSL pretraining, TPU-native.

Capability parity with `pointcept/models/sonata/sonata_v1m1_base.py`:
student/teacher self-distillation over multi-crop views with THREE losses
(`:360-540`):

* ``mask_loss`` (w 2/8)  — student on the MASKED principal global view vs the
  teacher's mask-head targets on the clean view (same rows — the mask only
  perturbs inputs);
* ``roll_mask_loss`` (w 2/8) — the same masked-student predictions vs the
  teacher's targets on the OTHER global view, matched through origin indices
  (the reference rolls [pc1, pc1'] -> [pc1', pc1] and 1-nn matches
  origin_coord within ``match_max_r``; exact-origin matching is our
  static-shape equivalent);
* ``unmask_loss`` (w 4/8) — student on small LOCAL crops vs the teacher on
  the principal global view, matched through origins.

Masking groups points into patches of a SCHEDULED metric size and drops a
SCHEDULED ratio of patches (`generate_mask`, `:294-310`), with optional
coordinate jitter on masked points (`:389-397`); teacher temperature and EMA
momentum follow cosine schedules (`:222-247`).  Heads are ``OnlineCluster``
projections (MLP -> L2-normalize -> normalized-prototype logits, `:27-68`)
with SEPARATE mask/unmask heads on both student and teacher.

TPU re-design: the teacher is a sibling submodule whose outputs are
``stop_gradient``-ed; the trainer EMA-copies student->teacher subtrees inside
the jitted step (``cfg.ema.pairs``, momentum schedulable).  Scheduled scalars
(mask_size/mask_ratio/teacher_temp) ride the batch dict as replicated device
scalars injected per step by the ``SonataScheduler`` hook — values change
every step without recompilation.  Patch selection uses a salted hash
threshold (ratio in expectation) instead of host ``randperm``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_mean
from .builder import MODELS, build_model
from .masked_scene_contrast import match_views
from .structure import PointBatch


def sinkhorn(logits: jnp.ndarray, iters: int = 3, eps: float = 1.0) -> jnp.ndarray:
    """Sinkhorn-Knopp normalization of (already temperature-scaled) assignment
    logits [N, P] -> soft targets. Max-subtracted for numerical stability.
    Under pjit the reductions are global, matching the reference's
    all-reduced sinkhorn (`sonata_v1m1_base.py:265-292`)."""
    q = jnp.exp((logits - jnp.max(logits)) / eps)
    q = q / jnp.maximum(jnp.sum(q), 1e-8)
    for _ in range(iters):
        q = q / jnp.maximum(jnp.sum(q, axis=0, keepdims=True), 1e-8)  # columns: prototypes
        q = q / q.shape[1]
        q = q / jnp.maximum(jnp.sum(q, axis=1, keepdims=True), 1e-8)  # rows: points
        q = q / q.shape[0]
    return q * q.shape[0]


class OnlineCluster(nn.Module):
    """Projection + prototype assignment head (`sonata_v1m1_base.py:27-68`):
    Linear -> GELU -> Linear -> L2-normalize -> logits against unit-norm
    prototypes (weight-norm with fixed g=1 == row-normalized matmul)."""

    hidden: int = 256
    embed: int = 128
    num_prototypes: int = 1024

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.embed, name="fc2")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)
        proto = self.param(
            "prototypes", nn.initializers.normal(0.02), (self.num_prototypes, self.embed), jnp.float32
        )
        proto = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-6)
        return x @ proto.T.astype(x.dtype)


@MODELS.register_module("Sonata-v1m1")
# v1m2 (`sonata_v1m2_uni_teacher_head.py`): the teacher shares the student's
# projection heads instead of owning EMA copies — set ``uni_head=True``.
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
    head_hidden: int = 256
    student_temp: float = 0.1
    teacher_temp: float = 0.05  # default; scheduled value rides batch["teacher_temp"]
    mask_rate: float = 0.5  # default mask ratio; scheduled via batch["mask_ratio"]
    mask_size: float = 0.4  # default patch size (m); scheduled via batch["mask_size"]
    mask_jitter: float = 0.0  # >0: jitter masked coords (`:389-397`)
    num_matches: int = 2048
    num_local_view: int = 0  # local crops present in the batch (unmask loss)
    mask_loss_weight: float = 2 / 8
    roll_mask_loss_weight: float = 2 / 8
    unmask_loss_weight: float = 4 / 8
    uni_head: bool = False  # v1m2: teacher reuses the student's heads

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        def view(prefix):
            return PointBatch(
                coord=batch[f"{prefix}_coord"],
                feat=batch[f"{prefix}_feat"],
                grid_coord=batch[f"{prefix}_grid_coord"].astype(jnp.int32),
                valid=batch[f"{prefix}_valid"],
                num_samples=point.num_samples,
            )

        # view naming: MultiViewGenerator emits global1/global2 + local{i};
        # ContrastiveViewsGenerator emits view1/view2
        g1 = "global1" if "global1_coord" in batch else "view1"
        g2 = "global2" if "global2_coord" in batch else "view2"
        v1 = view(g1)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (self.backbone_in_channels,), jnp.float32
        )
        mask_ratio = batch.get("mask_ratio", jnp.float32(self.mask_rate))
        mask_size = batch.get("mask_size", jnp.float32(self.mask_size))
        teacher_temp = batch.get("teacher_temp", jnp.float32(self.teacher_temp))
        if train:
            rng = self.make_rng("mask")
            # metric-size patches (scheduled): floor(coord / mask_size) per
            # sample, salted-hash-thresholded at the scheduled ratio
            pv = jnp.floor(v1.coord / jnp.maximum(mask_size, 1e-6)).astype(jnp.int32)
            h = (
                pv[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
                ^ pv[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
                ^ pv[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
                ^ v1.batch.astype(jnp.uint32) * jnp.uint32(10242269)
            )
            salt = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
            hv = (h ^ salt) * jnp.uint32(2654435761)
            masked = (hv.astype(jnp.float32) / jnp.float32(2**32)) < mask_ratio
        else:
            masked = jnp.zeros(v1.num_points, bool)

        # stable submodule names let the trainer EMA-copy student -> teacher
        student_bb = build_model(dict(self.backbone, name="student_backbone"))
        teacher_bb = build_model(dict(self.backbone, name="teacher_backbone"))
        s_coord = v1.coord
        if train and self.mask_jitter > 0:
            jit_rng = self.make_rng("mask_jitter") if self.has_rng("mask_jitter") else self.make_rng("mask")
            jitter = jnp.clip(
                jax.random.normal(jit_rng, s_coord.shape) * self.mask_jitter,
                -2 * self.mask_jitter,
                2 * self.mask_jitter,
            )
            s_coord = jnp.where(masked[:, None], s_coord + jitter, s_coord)
        s_in = v1.replace(
            coord=s_coord,
            feat=jnp.where(masked[:, None], mask_token.astype(v1.feat.dtype), v1.feat),
        )
        s_feat = student_bb(s_in, train=train)
        t_feat = jax.lax.stop_gradient(teacher_bb(v1, train=False))

        def make_head(name):
            return OnlineCluster(
                self.head_hidden, self.proj_dim, self.num_prototypes, name=name
            )

        s_mask_head = make_head("student_mask_head")
        t_mask_head = s_mask_head if self.uni_head else make_head("teacher_mask_head")
        s_unmask_head = make_head("student_unmask_head")
        t_unmask_head = s_unmask_head if self.uni_head else make_head("teacher_unmask_head")

        def per_sample_mean(ce, w, b):
            # reference reduction: per-batch segment mean, then mean (`:452-458`)
            num = segment_mean((ce * w)[:, None], b, point.num_samples).reshape(-1)
            den = segment_mean(w[:, None], b, point.num_samples).reshape(-1)
            per = num / jnp.maximum(den, 1e-8)
            have = (den > 0).astype(jnp.float32)
            return jnp.sum(per * have) / jnp.maximum(jnp.sum(have), 1.0)

        out: Dict[str, jnp.ndarray] = {}
        loss = jnp.zeros((), jnp.float32)

        s_mask_logits = s_mask_head(s_feat) / self.student_temp
        if self.mask_loss_weight > 0:
            # same rows: the masked view is the clean view with perturbed input
            t_logits = jax.lax.stop_gradient(t_mask_head(t_feat))
            t_assign = jax.lax.stop_gradient(sinkhorn(t_logits / teacher_temp))
            ce = -jnp.sum(t_assign * jax.nn.log_softmax(s_mask_logits, axis=-1), axis=-1)
            w = (masked & v1.valid).astype(jnp.float32)
            mask_loss = per_sample_mean(ce, w, v1.batch)
            out["mask_loss"] = mask_loss
            loss = loss + self.mask_loss_weight * mask_loss

        if self.roll_mask_loss_weight > 0 and f"{g2}_coord" in batch:
            v2 = view(g2)
            t2_feat = jax.lax.stop_gradient(teacher_bb(v2, train=False))
            t2_logits = jax.lax.stop_gradient(t_mask_head(t2_feat))
            idx1, idx2, mvalid = match_views(
                batch[f"{g1}_origin"].reshape(-1), v1.valid,
                batch[f"{g2}_origin"].reshape(-1), v2.valid,
                v1.batch, self.num_matches, v1.slot_size,
            )
            t_m = jax.lax.stop_gradient(
                sinkhorn(jnp.take(t2_logits, idx2, axis=0) / teacher_temp)
            )
            s_m = jnp.take(s_mask_logits, idx1, axis=0)
            ce2 = -jnp.sum(t_m * jax.nn.log_softmax(s_m, axis=-1), axis=-1)
            wm = (mvalid & jnp.take(masked, idx1, axis=0)).astype(jnp.float32)
            roll_loss = per_sample_mean(ce2, wm, jnp.take(v1.batch, idx1, axis=0))
            out["roll_mask_loss"] = roll_loss
            loss = loss + self.roll_mask_loss_weight * roll_loss

        if self.unmask_loss_weight > 0 and self.num_local_view > 0:
            t_un_logits = jax.lax.stop_gradient(t_unmask_head(t_feat))
            un_losses = []
            for i in range(1, self.num_local_view + 1):
                lv = view(f"local{i}")
                l_feat = student_bb(lv, train=train)
                l_logits = s_unmask_head(l_feat) / self.student_temp
                idx_l, idx_g, mvalid = match_views(
                    batch[f"local{i}_origin"].reshape(-1), lv.valid,
                    batch[f"{g1}_origin"].reshape(-1), v1.valid,
                    lv.batch, self.num_matches, lv.slot_size,
                    batch2=v1.batch,
                )
                t_l = jax.lax.stop_gradient(
                    sinkhorn(jnp.take(t_un_logits, idx_g, axis=0) / teacher_temp)
                )
                ce3 = -jnp.sum(
                    t_l * jax.nn.log_softmax(jnp.take(l_logits, idx_l, axis=0), axis=-1), axis=-1
                )
                wl = mvalid.astype(jnp.float32)
                un_losses.append(per_sample_mean(ce3, wl, jnp.take(lv.batch, idx_l, axis=0)))
            unmask_loss = jnp.mean(jnp.stack(un_losses))
            out["unmask_loss"] = unmask_loss
            loss = loss + self.unmask_loss_weight * unmask_loss

        out["loss"] = loss
        return out
