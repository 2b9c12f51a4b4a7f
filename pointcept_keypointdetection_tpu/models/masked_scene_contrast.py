"""MaskedSceneContrast (MSC) — self-supervised pretraining.

Capability parity with `pointcept/models/masked_scene_contrast/
masked_scene_contrast_v1m1_base.py`: two augmented views of a scene, a shared
backbone, (1) cross-view matched-point InfoNCE contrastive loss and (2) a
masked-reconstruction loss (mask patches of view1, reconstruct the masked
points' color/normal from backbone features).

TPU re-design: the CUDA knn-based correspondence search becomes an exact
origin-index match via one uint32 ``searchsorted`` (each view keeps the
origin row index of every point, both views are subsets of the same cloud);
matched pairs are compacted to a fixed ``num_matches`` capacity with masking.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import MODELS, build_model
from .structure import PointBatch


def match_views(origin1, valid1, origin2, valid2, batch, num_matches: int, slot: int, batch2=None):
    """Find rows (i, j) with origin1[i] == origin2[j] within the same sample.

    Returns (idx1 [M], idx2 [M], match_valid [M]) with M = num_matches.
    ``batch2`` defaults to ``batch`` (same-slot views); pass it when the two
    views use different slot sizes (Sonata local vs global crops).
    """
    if batch2 is None:
        batch2 = batch
    key1 = (batch.astype(jnp.uint32) << 24) | origin1.astype(jnp.uint32)
    key2 = (batch2.astype(jnp.uint32) << 24) | origin2.astype(jnp.uint32)
    key1 = jnp.where(valid1, key1, jnp.uint32(0xFFFFFFFF))
    key2 = jnp.where(valid2, key2, jnp.uint32(0xFFFFFFFF))
    order2 = jnp.argsort(key2)
    sorted2 = jnp.take(key2, order2, axis=0)
    pos = jnp.searchsorted(sorted2, key1)
    pos = jnp.minimum(pos, key2.shape[0] - 1)
    hit = (jnp.take(sorted2, pos, axis=0) == key1) & valid1 & (key1 != jnp.uint32(0xFFFFFFFF))
    j = jnp.take(order2, pos, axis=0)

    # compact the hits into num_matches slots
    rank = jnp.cumsum(hit.astype(jnp.int32)) - 1
    tgt = jnp.where(hit & (rank < num_matches), rank, num_matches)
    n1 = key1.shape[0]
    n2 = key2.shape[0]
    idx1 = jnp.full((num_matches,), n1, jnp.int32).at[tgt].set(
        jnp.arange(n1, dtype=jnp.int32), mode="drop"
    )
    idx2 = jnp.full((num_matches,), n2, jnp.int32).at[tgt].set(j.astype(jnp.int32), mode="drop")
    match_valid = idx1 < n1
    return jnp.minimum(idx1, n1 - 1), jnp.minimum(idx2, n2 - 1), match_valid


@MODELS.register_module("MSC-v1m1")
# v1m2 = CSC (Contrastive Scene Contexts, `masked_scene_contrast_v1m2_csc.py`):
# negatives are partitioned into spatial bins around each anchor (z up/down x
# inner/outer radius) and the InfoNCE is averaged per partition — set
# ``partitions=4`` to enable.
@MODELS.register_module("MSC-v1m2")
class MaskedSceneContrast(nn.Module):
    backbone: Dict[str, Any]
    backbone_in_channels: int = 6
    backbone_out_channels: int = 96
    nce_t: float = 0.4
    contrast_weight: float = 1.0
    reconstruct_weight: float = 1.0
    reconstruct_color: bool = True
    reconstruct_normal: bool = False
    mask_grid_size: float = 0.1  # origin-frame patch size (m), cross-mask path
    mask_rate: float = 0.4
    num_matches: int = 4096
    mask_grid: int = 8  # voxel super-cube size for patch masking
    # CSC (v1m2): number of scene-context partitions (0 = plain InfoNCE);
    # 4 = z up/down x within/beyond ``partition_radius`` of the anchor
    # (`masked_scene_contrast_v1m2_csc.py:182-200,241-252`)
    partitions: int = 0
    partition_radius: float = 2.0

    @nn.compact
    def __call__(self, point: PointBatch, batch: Dict[str, jnp.ndarray], train: bool = False):
        # views ride the batch dict: view{1,2}_{coord,feat,grid_coord,valid,origin}
        def view(i):
            return PointBatch(
                coord=batch[f"view{i}_coord"],
                feat=batch[f"view{i}_feat"],
                grid_coord=batch[f"view{i}_grid_coord"].astype(jnp.int32),
                valid=batch[f"view{i}_valid"],
                num_samples=point.num_samples,
            )

        v1, v2 = view(1), view(2)

        # CROSS masks (`masked_scene_contrast_v1m1_base.py:70-141`): patches
        # live in the ORIGINAL scene frame and are split into two DISJOINT
        # sets — set 1 masks view1, set 2 masks view2 — so the contrastive
        # pairs always include (masked, visible) combinations.  Patch
        # selection: salted hash of the origin-frame patch cell, u < rate ->
        # set 1, rate <= u < 2*rate -> set 2 (randperm fraction in
        # expectation).  Falls back to view1-only grid masking when the
        # pipeline provides no origin coords.
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (self.backbone_in_channels,), jnp.float32
        )
        masked = jnp.zeros(v1.num_points, bool)
        masked2 = jnp.zeros(v2.num_points, bool)
        if train:
            rng = self.make_rng("mask")
            salt = jax.random.randint(rng, (), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)

            def patch_u(cells, batch_idx):
                h = (
                    cells[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
                    ^ cells[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
                    ^ cells[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)
                    ^ batch_idx.astype(jnp.uint32) * jnp.uint32(10242269)
                )
                return ((h ^ salt) * jnp.uint32(2654435761)).astype(jnp.float32) / jnp.float32(2**32)

            if "view1_origin_coord" in batch:
                assert self.mask_rate <= 0.5
                for i, v in ((1, v1), (2, v2)):
                    oc = batch[f"view{i}_origin_coord"]
                    cells = jnp.floor(oc / self.mask_grid_size).astype(jnp.int32)
                    u = patch_u(cells, v.batch)
                    if i == 1:
                        masked = u < self.mask_rate
                    else:
                        masked2 = (u >= self.mask_rate) & (u < 2 * self.mask_rate)
            else:
                super_vox = v1.grid_coord >> (self.mask_grid - 1).bit_length()
                masked = patch_u(super_vox, jnp.zeros_like(v1.batch)) < self.mask_rate
        v1_in = v1.replace(
            feat=jnp.where(masked[:, None], mask_token.astype(v1.feat.dtype), v1.feat)
        )
        v2_in = v2.replace(
            feat=jnp.where(masked2[:, None], mask_token.astype(v2.feat.dtype), v2.feat)
        )

        bb = build_model(dict(self.backbone))
        f1 = bb(v1_in, train=train)
        f2 = bb(v2_in, train=train)

        idx1, idx2, mvalid = match_views(
            batch["view1_origin"].reshape(-1),
            v1.valid,
            batch["view2_origin"].reshape(-1),
            v2.valid,
            v1.batch,
            self.num_matches,
            v1.slot_size,
        )
        q = jnp.take(f1, idx1, axis=0)
        k = jnp.take(f2, idx2, axis=0)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        logits = jnp.einsum("mc,nc->mn", q, k, preferred_element_type=jnp.float32) / self.nce_t
        logits = jnp.where(mvalid[None, :], logits, -1e9)
        labels = jnp.arange(self.num_matches)
        w = mvalid.astype(jnp.float32)
        if self.partitions > 0:
            # CSC: negatives binned by scene context relative to the anchor —
            # z above/below x inside/outside partition_radius; the positive
            # (diagonal) joins every partition's softmax, losses averaged.
            # Both ends of a match are the SAME world point, so key j's
            # position is taken on the view1 side (c1[j]) — one consistent
            # frame.  (The reference bins view1-vs-view2 coords across two
            # independently augmented frames,
            # `masked_scene_contrast_v1m2_csc.py:241`, which scrambles the
            # bins; same machinery, consistent geometry here.)
            c1 = jnp.take(v1.coord, idx1, axis=0)  # anchors [M, 3], view1 frame
            rel = c1[None, :, :] - c1[:, None, :]
            up = rel[..., 2] >= 0
            inner = jnp.sum(jnp.square(rel), axis=-1) <= self.partition_radius**2
            part = jnp.where(inner, 0, 2) + jnp.where(up, 0, 1)  # [M, M] in 0..3
            diag = jnp.eye(self.num_matches, dtype=bool)
            contrast_loss = jnp.zeros((), jnp.float32)
            for p in range(self.partitions):
                lp = jnp.where((part == p) | diag, logits, -1e9)
                logp = jax.nn.log_softmax(lp, axis=-1)
                nce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                contrast_loss = contrast_loss + jnp.sum(nce * w) / jnp.maximum(jnp.sum(w), 1.0)
            contrast_loss = contrast_loss / self.partitions
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)
            nce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            contrast_loss = jnp.sum(nce * w) / jnp.maximum(jnp.sum(w), 1.0)

        out = {"contrast_loss": contrast_loss}
        loss = self.contrast_weight * contrast_loss

        if self.reconstruct_color and "view1_color_target" in batch:
            pred = nn.Dense(3, name="color_head")(f1)
            # the target is reconstructed AS the pipeline provides it — the
            # reference applies NormalizeColor inside the view transforms and
            # regresses those [0, 1] values raw
            # (`masked_scene_contrast_v1m1_base.py:274-286`); rescaling here
            # would squash already-normalized colors to a constant
            target = batch["view1_color_target"]
            rw = (masked & v1.valid).astype(jnp.float32)[:, None]
            rec = jnp.sum(jnp.square(pred - target) * rw) / jnp.maximum(jnp.sum(rw) * 3, 1.0)
            out["reconstruct_loss"] = rec
            loss = loss + self.reconstruct_weight * rec

        if self.reconstruct_normal and "view1_normal_target" in batch:
            # reference reconstructs normals of masked points the same way
            # (`masked_scene_contrast_v1m1_base.py:288-300`)
            npred = nn.Dense(3, name="normal_head")(f1)
            ntarget = batch["view1_normal_target"]
            rw = (masked & v1.valid).astype(jnp.float32)[:, None]
            nrec = jnp.sum(jnp.square(npred - ntarget) * rw) / jnp.maximum(jnp.sum(rw) * 3, 1.0)
            out["normal_loss"] = nrec
            loss = loss + self.reconstruct_weight * nrec

        out["loss"] = loss
        return out
