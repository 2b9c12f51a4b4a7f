"""Padded-slot collation: sample dicts -> fixed-shape batch arrays.

The TPU re-design of the reference's ragged ``collate_fn`` /
``point_collate_fn`` (`pointcept/datasets/utils.py:16-138`): instead of
offset-chained concatenation, every sample is padded (or truncated with a
random subsample) to exactly ``slot_size`` points, producing ``[B*S, ...]``
arrays plus a validity mask — the shapes XLA compiles once.

Mix3D-style batch mixing (``mix_prob``) is preserved: two adjacent samples are
fused into one double-width slot (both clouds valid in one slot), the other
slot left empty, matching the reference's drop-every-other-offset semantics.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

PER_POINT_KEYS = (
    "coord",
    "origin_coord",  # unaugmented world-frame coords (DINO knn lifting)
    "grid_coord",
    "feat",
    "segment",
    "instance",
    "displacement",
    "keypoint_offset",
    "keypoint_mask",
    "instance_centroid",
    "inverse",
    "index",
)
PER_SAMPLE_KEYS = ("keypoint", "category", "scale", "centroid", "condition", "weight_label")

_PAD_VALUES = {"segment": -1, "instance": -1, "correspondence": -1}

# multi-view SSL groups: view{i}_ (ContrastiveViewsGenerator), global{i}_ /
# local{i}_ (MultiViewGenerator — Concerto/Sonata multi-crop); dino_ is the
# side point cloud carrying 2D DINO features (DINOEnhancedSegmentor)
_VIEW_PREFIX = re.compile(r"^(view|global|local)\d+_|^dino_")


def _view_prefix(key: str) -> Optional[str]:
    m = _VIEW_PREFIX.match(key)
    return m.group(0) if m else None


def _is_per_point(key: str) -> bool:
    return key in PER_POINT_KEYS or _view_prefix(key) is not None or key == "correspondence"


def pad_sample(sample: Dict[str, np.ndarray], slot_size: int) -> Dict[str, np.ndarray]:
    """Pad/subsample every per-point array in a sample dict to slot_size rows.

    Multi-view SSL samples (view1_*/view2_* keys) pad each view group by its
    own length and emit per-view validity masks.
    """
    out = dict(sample)
    groups = {""} | {p for k in sample if (p := _view_prefix(k)) is not None}
    for prefix in sorted(groups):
        if (prefix + "valid") in out:
            continue  # group already emitted at a fixed slot size (MultiViewGenerator)
        ref_key = (prefix + "coord") if (prefix + "coord") in out else "coord"
        if ref_key not in out:
            continue
        n = out[ref_key].shape[0]
        keys = [
            k for k in out
            if (prefix and k.startswith(prefix))
            or (not prefix and _is_per_point(k) and _view_prefix(k) is None)
        ]
        if n > slot_size:
            idx = np.random.choice(n, slot_size, replace=False)
            for key in keys:
                out[key] = out[key][idx]
            n = slot_size
        valid = np.zeros(slot_size, bool)
        valid[:n] = True
        for key in keys:
            arr = out[key]
            pad_width = [(0, slot_size - n)] + [(0, 0)] * (arr.ndim - 1)
            out[key] = np.pad(arr, pad_width, constant_values=_PAD_VALUES.get(key, 0))
        out[(prefix + "valid") if prefix else "valid"] = valid
    return out


def collate(
    samples: List[Dict[str, np.ndarray]],
    slot_size: int,
    mix_prob: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Collate sample dicts into a batch dict of [B*S, ...] arrays.

    With probability ``mix_prob``, adjacent sample pairs are fused Mix3D-style
    (`datasets/utils.py:72-138`): pair (2i, 2i+1) shares slot 2i (each half the
    slot), and slot 2i+1 is empty.
    """
    b = len(samples)
    mixed = mix_prob > 0 and np.random.rand() < mix_prob and b % 2 == 0
    if mixed:
        half = slot_size // 2
        padded = [pad_sample(s, half) for s in samples]
        fused = []
        for i in range(0, b, 2):
            merged = {}
            for key in padded[i]:
                # per-point arrays concatenate; so do dino_* side clouds (the
                # fused scene is the union of both scenes' points, so its
                # DINO cloud must be the union too — otherwise half the slot
                # knn-matches a different scene's features)
                fuse = (
                    key == "valid" or key in PER_POINT_KEYS or key.startswith("dino_")
                )
                if fuse and key in padded[i + 1]:
                    merged[key] = np.concatenate([padded[i][key], padded[i + 1][key]], axis=0)
                else:
                    merged[key] = padded[i][key]
            fused.append(merged)
            empty = {k: np.zeros_like(v) for k, v in merged.items()}
            empty["valid"] = np.zeros(slot_size, bool)
            if "segment" in empty:
                empty["segment"] = np.full_like(merged["segment"], -1)
            fused.append(empty)
        padded = fused
    else:
        padded = [pad_sample(s, slot_size) for s in samples]

    batch: Dict[str, np.ndarray] = {}
    keys = padded[0].keys()
    for key in keys:
        arrs = [p[key] for p in padded]
        if isinstance(arrs[0], str):
            batch[key] = arrs
        elif key.endswith("valid") or _is_per_point(key):
            batch[key] = np.concatenate(arrs, axis=0)
        else:
            batch[key] = np.stack(arrs, axis=0)
    # canonical dtypes for the device side
    for key, dtype in (("grid_coord", np.int32), ("segment", np.int32), ("instance", np.int32),
                       ("coord", np.float32), ("feat", np.float32)):
        if key in batch and not isinstance(batch[key], list):
            batch[key] = batch[key].astype(dtype)
    batch["num_samples"] = b
    return batch
