"""Keypoint inference: preprocessing, prediction, aggregation, de-normalization.

Parity surface:
* `tools/infer_offset.py:499-648` — offset-model inference with per-keypoint
  aggregation ``argmax`` (best-confidence point + its offset) or ``weighted``
  (confidence-weighted mean of candidates over mask>threshold), and
  de-normalization via scale/centroid (`:566`).
* `tools/inference.py` / `temp/batch_predict_keypoints.py` — global-regression
  inference incl. the o3d-free normals+curvature featurization fallback and
  the normalize pipeline.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engines.common import build_point_batch
from ..models import build_model


def aggregate_keypoints(
    coord: np.ndarray,  # [N, 3] normalized coords (valid points only)
    offset_pred: np.ndarray,  # [N, K, 3]
    mask_prob: np.ndarray,  # [N, K]
    method: str = "argmax",
    threshold: float = 0.5,
) -> np.ndarray:
    """Per-keypoint candidate aggregation (`infer_offset.py:573-597`).

    argmax: the single best-confidence point's candidate.
    weighted: confidence-weighted mean over candidates with prob > threshold
    (falls back to argmax when no candidate passes).
    """
    n, k, _ = offset_pred.shape
    candidates = coord[:, None, :] + offset_pred  # [N, K, 3]
    out = np.zeros((k, 3), np.float32)
    for ki in range(k):
        conf = mask_prob[:, ki]
        if method == "argmax":
            out[ki] = candidates[int(conf.argmax()), ki]
        elif method == "weighted":
            sel = conf > threshold
            if not sel.any():
                out[ki] = candidates[int(conf.argmax()), ki]
            else:
                w = conf[sel]
                out[ki] = (candidates[sel, ki] * w[:, None]).sum(0) / w.sum()
        else:
            raise ValueError(method)
    return out


def estimate_normals_curvature(coord: np.ndarray, k: int = 16) -> np.ndarray:
    """PCA normals + curvature featurization without open3d
    (`temp/batch_predict_keypoints.py:38-58` uses o3d; same math)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(coord)
    _, idx = tree.query(coord, k=min(k, len(coord)))
    nbrs = coord[idx]  # [N, k, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / idx.shape[1]
    eigvals, eigvecs = np.linalg.eigh(cov)
    normals = eigvecs[:, :, 0]
    curvature = eigvals[:, 0] / np.maximum(eigvals.sum(axis=1), 1e-12)
    return np.concatenate([normals, curvature[:, None]], axis=1).astype(np.float32)


def normalize_cloud(coord: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    centroid = coord.mean(axis=0)
    coord = coord - centroid
    scale = float(np.sqrt((coord**2).sum(axis=1)).max())
    scale = scale if scale > 1e-6 else 1.0
    return (coord / scale).astype(np.float32), centroid.astype(np.float32), scale


class _PredictorBase:
    def __init__(self, model_cfg: Dict, checkpoint: Optional[str] = None, slot_size: int = 8192):
        self._model_cfg = dict(model_cfg)
        self.model = build_model(dict(model_cfg))
        self.slot_size = slot_size
        self._variables = None
        self._checkpoint = checkpoint
        self._forward = None

    def _prepare(self, coord: np.ndarray, feat: np.ndarray, grid_size: float):
        ncoord, centroid, scale = normalize_cloud(coord)
        grid = np.floor(ncoord / grid_size).astype(np.int64)
        grid -= grid.min(0)
        # one point per voxel (GridSample train-mode semantics)
        from ..ops.serialization import z_order_encode_np

        key = z_order_encode_np(grid, depth=16)
        _, first = np.unique(key, return_index=True)
        sel = np.sort(first)
        f = feat[sel].astype(np.float32)
        if self._expects_coord_feat(f.shape[1]):
            # training pipelines with feat_keys=("coord", "feat") — the pig
            # convention (N x 7: xyz + normal + curvature) — feed NORMALIZED
            # coords as the leading feature channels
            f = np.concatenate([ncoord[sel].astype(np.float32), f], axis=1)
        data = dict(
            coord=ncoord[sel],
            feat=f,
            grid_coord=grid[sel].astype(np.int32),
        )
        return data, centroid, scale, sel

    def _expects_coord_feat(self, feat_width: int) -> bool:
        cfg = self._model_cfg or {}
        bb = cfg.get("backbone_conf") or cfg.get("backbone") or {}
        cin = bb.get("in_channels")
        return cin is not None and cin == feat_width + 3

    def _ensure_built(self, batch):
        if self._variables is None:
            point = build_point_batch(batch, 1)
            self._variables = jax.jit(functools.partial(self.model.init, train=False))(
                {"params": jax.random.PRNGKey(0)}, point, batch
            )
            if self._checkpoint:
                from ..utils.checkpoint import load_checkpoint, restore_into

                loaded = load_checkpoint(self._checkpoint)
                self._variables = {
                    "params": restore_into(jax.device_get(self._variables["params"]), loaded["params"]),
                    "batch_stats": restore_into(
                        jax.device_get(self._variables.get("batch_stats", {})),
                        loaded.get("batch_stats", {}),
                    ),
                }
            model = self.model

            def forward(variables, batch):
                point = build_point_batch(batch, 1)
                return model.apply(variables, point, batch, train=False)

            self._forward = jax.jit(forward)


class OffsetKeypointPredictor(_PredictorBase):
    """End-to-end offset-keypoint prediction on a raw cloud (mm or m units)."""

    def predict(
        self,
        coord: np.ndarray,
        feat: Optional[np.ndarray] = None,
        grid_size: float = 0.02,
        method: str = "argmax",
        threshold: float = 0.5,
    ) -> np.ndarray:
        if feat is None:
            feat = estimate_normals_curvature(coord)
        data, centroid, scale, sel = self._prepare(coord, feat, grid_size)
        from ..datasets.collate import collate, pad_sample

        n = data["coord"].shape[0]
        if n > self.slot_size:
            # subsample HERE (deterministically) so the rows of data["coord"]
            # stay aligned with the model's per-row outputs — pad_sample's own
            # random subsample would decouple them
            keep = np.sort(np.random.default_rng(0).choice(n, self.slot_size, replace=False))
            data = {k: v[keep] for k, v in data.items()}
            n = self.slot_size
        batch = collate([pad_sample(data, self.slot_size)], self.slot_size)
        from ..engines.test import sample_to_device

        dev_batch = sample_to_device(batch)
        self._ensure_built(dev_batch)
        out = self._forward(self._variables, dev_batch)
        offset_pred = np.asarray(out["offset_pred"])[:n]
        mask_prob = np.asarray(jax.nn.sigmoid(out["mask_logits"]))[:n]
        kp_norm = aggregate_keypoints(data["coord"][:n], offset_pred, mask_prob, method, threshold)
        return kp_norm * scale + centroid  # de-normalize


class KeypointPredictor(_PredictorBase):
    """Global-regression keypoint prediction on a raw cloud."""

    def predict(self, coord: np.ndarray, feat: Optional[np.ndarray] = None, grid_size: float = 0.02):
        if feat is None:
            feat = estimate_normals_curvature(coord)
        data, centroid, scale, _ = self._prepare(coord, feat, grid_size)
        from ..datasets.collate import collate, pad_sample

        batch = collate([pad_sample(data, self.slot_size)], self.slot_size)
        from ..engines.test import sample_to_device

        dev_batch = sample_to_device(batch)
        self._ensure_built(dev_batch)
        out = self._forward(self._variables, dev_batch)
        kp_norm = np.asarray(out["keypoint_pred"])[0]
        return kp_norm * scale + centroid
