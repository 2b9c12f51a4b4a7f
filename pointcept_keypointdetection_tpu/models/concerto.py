"""Concerto — joint 2D-3D self-distillation SSL, TPU-native.

Capability parity with `pointcept/models/concerto/concerto_v1m1_base.py`:
a student point backbone sees masked global crops and local crops; a teacher
(EMA or frozen-pretrained copy) sees clean global crops; per-point features
are projected by ``OnlineCluster`` heads onto weight-normalized prototypes and
the student is trained with Sinkhorn-normalized cross-entropy against the
teacher (mask / roll-mask / unmask terms, `concerto_v1m1_base.py:643-740`).
A fourth term distills a frozen 2D image encoder: student point features are
average-pooled into image-patch bins via point->patch correspondences and
regressed onto the 2D patch features with a (mean-shifted) cosine loss
(`concerto_v1m1_base.py:741-840`).

TPU re-design decisions:
- Views arrive as fixed-slot padded groups (``global{i}_*`` / ``local{j}_*``
  from ``MultiViewGenerator``) and all G global views run through the backbone
  in ONE call as extra batch samples — no ragged offsets, one compilation.
- Distillation runs at FULL view resolution (backbone ``enc_mode`` +
  ``upcast_level = num_stages-1``), so cross-view correspondences are exact
  ``origin``-index matches — the reference's radius-knn ``match_neighbour``
  (`concerto_v1m1_base.py:478-494`) and pooled-correspondence averaging
  (`pool_corr`, `:530-573`) are replaced by a searchsorted join and a direct
  scatter-mean into patch bins, both static-shaped.
- The 2D encoder is a self-contained flax ViT (the reference loads DINOv2 /
  RADIO / SigLIPv2 via HuggingFace, `:283-302`); its params live under
  ``enc2d`` and its outputs are ``stop_gradient``-ed (freeze via
  ``optimizer.param_dicts`` in real runs).
- Teacher updates ride the trainer's jitted EMA
  (``cfg.ema.pairs = [("student_backbone","teacher_backbone"), ...]``);
  the reference's per-step ``torch._foreach_`` hook (`:397-429`) is the
  same update outside jit.  The enc2d prototype copy (`:416-429`) becomes a
  single shared parameter (student and teacher enc2d prototypes are kept
  byte-equal by the reference's copy — sharing is the fixed point).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS, build_model
from .sonata import sinkhorn
from .structure import PointBatch


def match_views_b(origin1, valid1, batch1, origin2, valid2, batch2, num_matches: int):
    """Exact-origin join between two view groups with independent layouts.

    Rows (i, j) with ``origin1[i] == origin2[j]`` and ``batch1[i] ==
    batch2[j]`` (same underlying sample), compacted into ``num_matches``
    static slots.  Generalizes ``masked_scene_contrast.match_views`` to views
    of different lengths/slotting (locals vs globals).
    """
    key1 = (batch1.astype(jnp.uint32) << 20) | (origin1.astype(jnp.uint32) & 0xFFFFF)
    key2 = (batch2.astype(jnp.uint32) << 20) | (origin2.astype(jnp.uint32) & 0xFFFFF)
    key1 = jnp.where(valid1 & (origin1 >= 0), key1, jnp.uint32(0xFFFFFFFF))
    key2 = jnp.where(valid2 & (origin2 >= 0), key2, jnp.uint32(0xFFFFFFFF))
    order2 = jnp.argsort(key2)
    sorted2 = jnp.take(key2, order2, axis=0)
    pos = jnp.minimum(jnp.searchsorted(sorted2, key1), key2.shape[0] - 1)
    hit = (jnp.take(sorted2, pos, axis=0) == key1) & (key1 != jnp.uint32(0xFFFFFFFF))
    j = jnp.take(order2, pos, axis=0)

    rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
    tgt = jnp.where(hit & (rank < num_matches), rank, num_matches)
    n1, n2 = key1.shape[0], key2.shape[0]
    idx1 = jnp.full((num_matches,), n1, jnp.int32).at[tgt].set(
        jnp.arange(n1, dtype=jnp.int32), mode="drop"
    )
    idx2 = jnp.full((num_matches,), n2, jnp.int32).at[tgt].set(j.astype(jnp.int32), mode="drop")
    mvalid = idx1 < n1
    return jnp.minimum(idx1, n1 - 1), jnp.minimum(idx2, n2 - 1), mvalid


class OnlineCluster(nn.Module):
    """MLP projection + L2-normalize + unit-norm prototype logits
    (`concerto_v1m1_base.py:34-78`; weight-norm with frozen g=1 makes the
    prototype rows unit vectors — here they are normalized explicitly)."""

    hidden_channels: int = 4096
    embed_channels: int = 512
    num_prototypes: int = 4096
    enable_mlp: bool = True

    @nn.compact
    def __call__(self, feat):
        if self.enable_mlp:
            feat = nn.Dense(self.hidden_channels, name="mlp0")(feat)
            feat = nn.gelu(feat)
            feat = nn.Dense(self.embed_channels, name="mlp1")(feat)
        # rsqrt(+eps) normalization: gradient-safe at exactly-zero (padded) rows
        feat = feat * jax.lax.rsqrt(jnp.sum(feat * feat, axis=-1, keepdims=True) + 1e-12)
        proto = self.param(
            "prototypes",
            nn.initializers.truncated_normal(0.02),
            (self.num_prototypes, feat.shape[-1]),
            jnp.float32,
        )
        proto = proto / jnp.maximum(jnp.linalg.norm(proto, axis=-1, keepdims=True), 1e-6)
        return feat @ proto.T


class ViTEnc2D(nn.Module):
    """Minimal frozen 2D patch encoder (DINOv2-shaped: patch conv + pre-norm
    transformer blocks).  Stands in for the reference's HuggingFace encoders
    (`concerto_v1m1_base.py:283-302`) — same contract: [V, 3, H, W] ->
    [V, patch_h*patch_w, embed]."""

    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 4
    num_heads: int = 6

    @nn.compact
    def __call__(self, images):
        v = images.shape[0]
        x = jnp.transpose(images, (0, 2, 3, 1))  # VCHW -> VHWC
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        p = x.shape[1] * x.shape[2]
        x = x.reshape(v, p, self.embed_dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, p, self.embed_dim))
        x = x + pos
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"norm1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name=f"attn_{i}")(h, h)
            x = x + h
            h = nn.LayerNorm(name=f"norm2_{i}")(x)
            h = nn.Dense(self.embed_dim * 4, name=f"mlp0_{i}")(h)
            h = nn.Dense(self.embed_dim, name=f"mlp1_{i}")(nn.gelu(h))
            x = x + h
        return nn.LayerNorm(name="norm")(x)


@MODELS.register_module("Concerto-v1m1")
class Concerto(nn.Module):
    backbone: Dict[str, Any]
    backbone_in_channels: int = 6
    backbone_out_channels: int = 992  # sum of enc channels after full up-cast
    num_global_view: int = 2
    num_local_view: int = 4
    head_hidden_channels: int = 512
    head_embed_channels: int = 256
    head_num_prototypes: int = 1024
    enc2d_embed_channels: int = 384
    enc2d_depth: int = 4
    enc2d_num_heads: int = 6
    patch_size: int = 14
    patch_h: int = 16
    patch_w: int = 16
    mask_size: float = 0.4
    mask_ratio: float = 0.5
    # Partial up-cast (reference `pretrain-concerto-v1m1-0-base.py:89-90`):
    # distillation features live `up_cast_level` pooling levels above the
    # bottleneck (NOT full resolution); cross-view matches are then radius-
    # gated 1-nn in coordinate space (`match_neighbour`,
    # concerto_v1m1_base.py:478-494) and image correspondences are pooled
    # down to that level (`pool_corr`, :530-573).  None -> full resolution
    # with exact origin-join matching (the round-2 TPU shortcut).
    up_cast_level: Any = None
    match_max_r: float = 0.32
    student_temp: float = 0.1
    teacher_temp: float = 0.06
    mask_loss_weight: float = 0.2
    roll_mask_loss_weight: float = 0.2
    unmask_loss_weight: float = 0.4
    enc2d_loss_weight: float = 0.2
    enc2d_cos_shift: bool = True
    num_matches: int = 2048

    def _view_batch(self, batch, prefix, count, in_ch, num_samples):
        """Concat `count` fixed-slot view groups into one PointBatch whose
        samples are (view, original-sample) pairs."""
        coord = jnp.concatenate([batch[f"{prefix}{i + 1}_coord"] for i in range(count)], 0)
        feat = jnp.concatenate([batch[f"{prefix}{i + 1}_feat"] for i in range(count)], 0)
        grid = jnp.concatenate(
            [batch[f"{prefix}{i + 1}_grid_coord"] for i in range(count)], 0
        ).astype(jnp.int32)
        valid = jnp.concatenate([batch[f"{prefix}{i + 1}_valid"] for i in range(count)], 0)
        origin = jnp.concatenate([batch[f"{prefix}{i + 1}_origin"] for i in range(count)], 0)
        pb = PointBatch(
            coord=coord,
            feat=feat[..., : in_ch],
            grid_coord=grid,
            valid=valid,
            num_samples=count * num_samples,
        )
        # original-sample id of every row (views of one sample share it)
        slot = coord.shape[0] // (count * num_samples)
        sample = (jnp.arange(coord.shape[0]) // slot) % num_samples
        return pb, origin.reshape(-1), sample

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        nb = point.num_samples
        g, l = self.num_global_view, self.num_local_view
        gp, g_origin, g_sample = self._view_batch(
            batch, "global", g, self.backbone_in_channels, nb
        )

        # --- grid-patch masking (`generate_mask`, :430-447): group points by
        # a coarse coordinate grid, drop mask_ratio of the cells via salted
        # hashing (ratio holds in expectation; cells are i.i.d. Bernoulli)
        if train:
            # scheduled mask_size / mask_ratio ride the batch when the
            # SSLSchedule hook is registered (reference warms both up,
            # concerto_v1m1_base.py:141-151); defaults otherwise
            mask_size = batch.get("mask_size", jnp.float32(self.mask_size))
            mask_ratio = batch.get("mask_ratio", jnp.float32(self.mask_ratio))
            cell = jnp.floor(gp.coord / mask_size).astype(jnp.int32)
            h = (
                cell[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
                ^ cell[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
                ^ cell[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
                ^ gp.batch.astype(jnp.uint32) * jnp.uint32(2654435761)
            )
            salt = jax.random.randint(
                self.make_rng("mask"), (), 0, 2**31 - 1, jnp.int32
            ).astype(jnp.uint32)
            u = ((h ^ salt) * jnp.uint32(2654435761)).astype(jnp.float32) / jnp.float32(2**32)
            masked = u < mask_ratio
        else:
            masked = jnp.zeros(gp.num_points, bool)

        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (self.backbone_in_channels,), jnp.float32
        )

        bb_conf = dict(self.backbone)
        pooled = self.up_cast_level is not None
        if pooled:
            # reference regime: features `up_cast_level` levels above the
            # bottleneck, returned as a PointBatch with the full-res -> level
            # row map for correspondence pooling
            bb_conf.update(
                enc_mode=True,
                upcast_level=int(self.up_cast_level),
                enc_return_point=True,
            )
        student_bb = build_model(dict(bb_conf, name="student_backbone"))
        teacher_bb = build_model(dict(bb_conf, name="teacher_backbone"))
        head_cfg = dict(
            hidden_channels=self.head_hidden_channels,
            embed_channels=self.head_embed_channels,
            num_prototypes=self.head_num_prototypes,
        )

        out: Dict[str, jnp.ndarray] = {}
        losses = []
        use_mask_head = self.mask_loss_weight > 0 or self.roll_mask_loss_weight > 0

        # --- teacher on clean globals (stop-grad)
        t_out = teacher_bb(gp, train=False)
        if pooled:
            t_out = jax.tree_util.tree_map(jax.lax.stop_gradient, t_out)
            t_feat, lvl_valid = t_out.feat, t_out.valid
        else:
            t_feat = jax.lax.stop_gradient(t_out)
            lvl_valid = gp.valid
        teacher_temp = batch.get("teacher_temp", jnp.float32(self.teacher_temp))
        t_head = OnlineCluster(
            **head_cfg, name="teacher_mask_head" if use_mask_head else "teacher_unmask_head"
        )
        t_logits = jax.lax.stop_gradient(t_head(t_feat))
        t_assign = jax.lax.stop_gradient(
            sinkhorn(jnp.where(lvl_valid[:, None], t_logits / teacher_temp, -1e9))
        )

        # --- student on masked globals (mask applied at INPUT resolution;
        # the pooling partition depends only on grid coords, so student and
        # teacher level rows stay aligned)
        s_in = gp.replace(
            feat=jnp.where(masked[:, None], mask_token.astype(gp.feat.dtype), gp.feat)
        )
        s_out = student_bb(s_in, train=train)
        if pooled:
            s_point = s_out
            s_feat = s_point.feat
            lvl_coord = s_point.coord
            lvl_batch = s_point.batch
        else:
            s_feat = s_out

        def view_ce(s_logits, t_assign_rows, w):
            logp = jax.nn.log_softmax(s_logits / self.student_temp, axis=-1)
            ce = -jnp.sum(t_assign_rows * logp, axis=-1)
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        if use_mask_head:
            s_mask_logits = OnlineCluster(**head_cfg, name="student_mask_head")(s_feat)
            if self.mask_loss_weight > 0:
                # same rows student<->teacher (level partitions align exactly)
                w = lvl_valid.astype(jnp.float32)
                mask_loss = view_ce(s_mask_logits, t_assign, w)
                out["mask_loss"] = mask_loss
                losses.append(mask_loss * self.mask_loss_weight)
            if self.roll_mask_loss_weight > 0 and g == 2:
                # student view i vs teacher view (1-i) (`roll_point`, :496-511)
                half = s_feat.shape[0] // 2
                rolled_assign = jnp.concatenate([t_assign[half:], t_assign[:half]], 0)
                if pooled:
                    # radius-gated 1-nn in coordinate space — the reference's
                    # `match_neighbour` (:478-494); rolling swaps view blocks,
                    # so matching within the same slot-batch id pairs view i
                    # rows with teacher view (1-i) rows of the same sample
                    from ..ops.knn import knn

                    r_coord = jnp.concatenate([lvl_coord[half:], lvl_coord[:half]], 0)
                    r_valid = jnp.concatenate([lvl_valid[half:], lvl_valid[:half]], 0)
                    idx, sqd = knn(
                        lvl_coord, r_coord, 1,
                        query_batch=lvl_batch, base_batch=lvl_batch, base_valid=r_valid,
                    )
                    ok = (sqd[:, 0] <= self.match_max_r**2) & lvl_valid
                    roll_loss = view_ce(
                        s_mask_logits,
                        jnp.take(rolled_assign, idx[:, 0], axis=0),
                        ok.astype(jnp.float32),
                    )
                else:
                    r_origin = jnp.concatenate([g_origin[half:], g_origin[:half]], 0)
                    r_valid = jnp.concatenate([gp.valid[half:], gp.valid[:half]], 0)
                    i1, i2, mv = match_views_b(
                        g_origin, gp.valid, g_sample, r_origin, r_valid,
                        jnp.concatenate([g_sample[half:], g_sample[:half]], 0),
                        self.num_matches,
                    )
                    roll_loss = view_ce(
                        jnp.take(s_mask_logits, i1, axis=0),
                        jnp.take(rolled_assign, i2, axis=0),
                        mv.astype(jnp.float32),
                    )
                out["roll_mask_loss"] = roll_loss
                losses.append(roll_loss * self.roll_mask_loss_weight)

        if self.unmask_loss_weight > 0:
            lp, l_origin, l_sample = self._view_batch(
                batch, "local", l, self.backbone_in_channels, nb
            )
            l_out = student_bb(lp, train=train)
            if pooled:
                l_feat = l_out.feat
                s_unmask_logits = OnlineCluster(**head_cfg, name="student_unmask_head")(l_feat)
                # locals vs the principal global view, radius 1-nn at level
                from ..ops.knn import knn

                principal = jnp.arange(s_feat.shape[0]) < s_feat.shape[0] // g
                l_lvl_sample = l_out.batch % nb
                g_lvl_sample = lvl_batch % nb
                idx, sqd = knn(
                    l_out.coord, lvl_coord, 1,
                    query_batch=l_lvl_sample, base_batch=g_lvl_sample,
                    base_valid=lvl_valid & principal,
                )
                ok = (sqd[:, 0] <= self.match_max_r**2) & l_out.valid
                unmask_loss = view_ce(
                    s_unmask_logits,
                    jnp.take(t_assign, idx[:, 0], axis=0),
                    ok.astype(jnp.float32),
                )
            else:
                l_feat = l_out
                s_unmask_logits = OnlineCluster(**head_cfg, name="student_unmask_head")(l_feat)
                # match locals against the principal (first) global view only
                # (`concerto_v1m1_base.py:713-725`); teacher head priority
                # mask > unmask mirrors the reference (`:633-641`)
                principal = jnp.arange(gp.num_points) < gp.num_points // g
                i1, i2, mv = match_views_b(
                    l_origin, lp.valid, l_sample,
                    g_origin, gp.valid & principal, g_sample,
                    self.num_matches,
                )
                unmask_loss = view_ce(
                    jnp.take(s_unmask_logits, i1, axis=0),
                    jnp.take(t_assign, i2, axis=0),
                    mv.astype(jnp.float32),
                )
            out["unmask_loss"] = unmask_loss
            losses.append(unmask_loss * self.unmask_loss_weight)

        if self.enc2d_loss_weight > 0 and "images" in batch:
            if pooled:
                enc2d_loss = self._enc2d_loss_pooled(batch, s_point, gp, nb)
            else:
                enc2d_loss = self._enc2d_loss(batch, s_feat, gp, nb)
            out["enc2d_loss"] = enc2d_loss
            losses.append(enc2d_loss * self.enc2d_loss_weight)

        out["loss"] = sum(losses) if losses else jnp.zeros(())
        return out

    def _enc2d_loss(self, batch, s_feat, gp, nb):
        """Patch-bin distillation at full resolution (up_cast_level=None)."""
        ng = gp.num_points // self.num_global_view
        corr = batch["global1_correspondence"].astype(jnp.int32)  # [ng, V, 2]
        py, px = corr[..., 0], corr[..., 1]
        major_feat = nn.Dense(self.enc2d_embed_channels, name="patch_proj")(s_feat[:ng])
        major_valid = gp.valid[:ng]
        sample = jnp.arange(ng) // (ng // nb)
        return self._enc2d_core(batch, py, px, major_feat, major_valid, sample, nb)

    def _enc2d_loss_pooled(self, batch, s_point, gp, nb):
        """Patch-bin distillation at the up-cast level: correspondences are
        POOLED down to the feature level first — per (level point, image),
        the mean patch coordinate over children with a valid pair, invalid
        when no child has one (the reference's ``pool_corr``,
        `concerto_v1m1_base.py:530-573`, as one scatter-mean)."""
        g = self.num_global_view
        v = batch["images"].shape[1]
        ng0 = gp.num_points // g  # full-res view-1 rows
        n_lvl = s_point.num_points
        n_lvl1 = n_lvl // g
        f2l = s_point.context["full_to_level"][:ng0]  # full row -> level row
        f2lv = s_point.context["full_to_level_valid"][:ng0]
        corr = batch["global1_correspondence"].astype(jnp.int32)  # [ng0, V, 2]
        py0, px0 = corr[..., 0], corr[..., 1]
        pair_ok = (
            (py0 >= 0) & (py0 < self.patch_h) & (px0 >= 0) & (px0 < self.patch_w)
            & f2lv[:, None]
        )  # [ng0, V]
        tgt = jnp.where(pair_ok, f2l[:, None] * v + jnp.arange(v)[None, :], n_lvl1 * v)
        vals = jnp.stack([py0, px0], -1).astype(jnp.float32)  # [ng0, V, 2]
        sums = jnp.zeros((n_lvl1 * v, 2), jnp.float32).at[tgt.reshape(-1)].add(
            jnp.where(pair_ok.reshape(-1, 1), vals.reshape(-1, 2), 0.0), mode="drop"
        )
        cnts = jnp.zeros((n_lvl1 * v,), jnp.float32).at[tgt.reshape(-1)].add(
            pair_ok.reshape(-1).astype(jnp.float32), mode="drop"
        )
        mean_pp = jnp.round(sums / jnp.maximum(cnts, 1.0)[:, None]).astype(jnp.int32)
        py = jnp.where(cnts > 0, mean_pp[:, 0], -1).reshape(n_lvl1, v)
        px = jnp.where(cnts > 0, mean_pp[:, 1], -1).reshape(n_lvl1, v)
        major_feat = nn.Dense(self.enc2d_embed_channels, name="patch_proj")(
            s_point.feat[:n_lvl1]
        )
        major_valid = s_point.valid[:n_lvl1]
        sample = jnp.arange(n_lvl1) // (n_lvl1 // nb)
        return self._enc2d_core(batch, py, px, major_feat, major_valid, sample, nb)

    def _enc2d_core(self, batch, py, px, major_feat, major_valid, sample, nb):
        """Shared tail (`concerto_v1m1_base.py:741-840`): pool point features
        into (sample, view, patch) bins, cosine-regress onto the frozen 2D
        encoder's patch features over the touched bins."""
        images = batch["images"]  # [B, V, 3, H, W]
        img_valid = batch.get(
            "img_valid", jnp.ones(images.shape[:2], bool)
        )  # [B, V]
        b, v = images.shape[:2]
        p = self.patch_h * self.patch_w

        enc2d = ViTEnc2D(
            patch_size=self.patch_size,
            embed_dim=self.enc2d_embed_channels,
            depth=self.enc2d_depth,
            num_heads=self.enc2d_num_heads,
            name="enc2d",
        )
        feat2d = jax.lax.stop_gradient(
            enc2d(images.reshape(b * v, *images.shape[2:]))
        ).reshape(b * v * p, self.enc2d_embed_channels)

        pair_ok = (
            (py >= 0) & (py < self.patch_h) & (px >= 0) & (px < self.patch_w)
            & major_valid[:, None]
            & jnp.take(img_valid.reshape(-1), sample[:, None] * v + jnp.arange(v)[None, :], axis=0)
        )  # [ng, V]
        bin_idx = (
            (sample[:, None] * v + jnp.arange(v)[None, :]) * p
            + jnp.clip(py, 0, self.patch_h - 1) * self.patch_w
            + jnp.clip(px, 0, self.patch_w - 1)
        )  # [ng, V]
        bin_idx = jnp.where(pair_ok, bin_idx, b * v * p)  # drop row

        flat_idx = bin_idx.reshape(-1)
        flat_feat = jnp.repeat(major_feat[:, None, :], v, axis=1).reshape(
            -1, self.enc2d_embed_channels
        )
        nbins = b * v * p
        sums = jnp.zeros((nbins, self.enc2d_embed_channels), major_feat.dtype).at[flat_idx].add(
            jnp.where(pair_ok.reshape(-1, 1), flat_feat, 0.0), mode="drop"
        )
        counts = jnp.zeros((nbins,), jnp.float32).at[flat_idx].add(
            pair_ok.reshape(-1).astype(jnp.float32), mode="drop"
        )
        touched = counts > 0
        pooled = sums / jnp.maximum(counts, 1.0)[:, None]

        f2, f3 = feat2d, pooled
        if self.enc2d_cos_shift:
            f2 = f2 - jnp.mean(f2, axis=-1, keepdims=True)
            f3 = f3 - jnp.mean(f3, axis=-1, keepdims=True)
        cos = jnp.sum(f2 * f3, axis=-1) * jax.lax.rsqrt(
            (jnp.sum(f2 * f2, axis=-1) + 1e-8) * (jnp.sum(f3 * f3, axis=-1) + 1e-8)
        )
        w = touched.astype(jnp.float32)
        return jnp.sum((1.0 - cos) * w) / jnp.maximum(jnp.sum(w), 1.0) * 10.0
