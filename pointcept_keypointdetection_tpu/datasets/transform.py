"""Host-side (numpy) data transform pipeline.

Parity surface: `pointcept/datasets/transform.py` — the registered transform
ops used by the supported configs: Collect/Copy/Update/NormalizeColor/
NormalizeCoord/CenterShift/RandomShift/PointClip/RandomDropout/RandomRotate/
RandomRotateTargetAngle/RandomScale/RandomFlip/RandomJitter/
ChromaticAutoContrast/ChromaticTranslation/ChromaticJitter/ElasticDistortion/
GridSample/SphereCrop/ShufflePoint/CropBoundary.  Semantics follow the
reference (cited per class); implementation is fresh numpy.

Transforms run on the host before padding/collation; ``ToTensor`` is identity
(device transfer happens at collation).
"""

from __future__ import annotations

import copy
import numbers
from collections.abc import Mapping, Sequence

import numpy as np
import scipy.ndimage
import scipy.interpolate

from ..utils.registry import Registry

TRANSFORMS = Registry("transforms")

# keys indexed per-point by index-based ops (reference `index_valid_keys`,
# transform.py:24-45)
VALID_INDEX_KEYS = (
    "coord",
    "origin_coord",
    "color",
    "feat",  # raw per-point features (keypoint datasets ship N x 7 assets)
    "normal",
    "strength",
    "segment",
    "instance",
    "displacement",
    "grid_coord",
    "keypoint_offset",
    "keypoint_mask",
    "correspondence",
)


def index_operator(data_dict, index, duplicate=False):
    if not duplicate:
        for key in data_dict.get("index_valid_keys", VALID_INDEX_KEYS):
            if key in data_dict:
                data_dict[key] = data_dict[key][index]
        return data_dict
    out = dict(data_dict)
    for key in data_dict.get("index_valid_keys", VALID_INDEX_KEYS):
        if key in out:
            out[key] = out[key][index]
    return out


class Compose:
    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        self.transforms = [TRANSFORMS.build(t) for t in self.cfg]

    def __call__(self, data_dict):
        for t in self.transforms:
            data_dict = t(data_dict)
        return data_dict


@TRANSFORMS.register_module()
class Collect:
    """Select keys; concat ``feat_keys`` into 'feat'. (`transform.py:47-86`)"""

    def __init__(self, keys, feat_keys=("coord",), **kwargs):
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.feat_keys = [feat_keys] if isinstance(feat_keys, str) else list(feat_keys)

    def __call__(self, data_dict):
        out = {}
        for key in self.keys:
            out[key] = data_dict[key]
        feats = [data_dict[k] for k in self.feat_keys]
        feats = [f.reshape(f.shape[0], -1) if f.ndim > 1 else f.reshape(-1, 1) for f in feats]
        out["feat"] = np.concatenate(feats, axis=1).astype(np.float32)
        return out


@TRANSFORMS.register_module()
class Copy:
    def __init__(self, keys_dict=None):
        self.keys_dict = keys_dict or dict(coord="origin_coord", segment="origin_segment")

    def __call__(self, data_dict):
        for src, dst in self.keys_dict.items():
            if src in data_dict:
                data_dict[dst] = copy.deepcopy(data_dict[src])
        return data_dict


@TRANSFORMS.register_module()
class Update:
    def __init__(self, keys_dict=None):
        self.keys_dict = keys_dict or {}

    def __call__(self, data_dict):
        data_dict.update(self.keys_dict)
        return data_dict


@TRANSFORMS.register_module()
class ToTensor:
    """Identity on host; retained for config compatibility."""

    def __call__(self, data_dict):
        return data_dict


@TRANSFORMS.register_module()
class NormalizeColor:
    """color/255 -> [0, 1] (`transform.py:141-145`; this fork's convention —
    older upstream Pointcept used color/127.5 - 1)."""

    def __call__(self, data_dict):
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"] / 255
        return data_dict


@TRANSFORMS.register_module()
class NormalizeCoord:
    """center + unit-sphere scale (`transform.py:279-290`)"""

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        centroid = np.mean(coord, axis=0)
        coord = coord - centroid
        m = np.max(np.sqrt(np.sum(coord**2, axis=1)))
        data_dict["coord"] = coord / m
        return data_dict


@TRANSFORMS.register_module()
class PositiveShift:
    """shift coords to be non-negative (`transform.py:293-300`)"""

    def __call__(self, data_dict):
        data_dict["coord"] = data_dict["coord"] - np.min(data_dict["coord"], axis=0)
        return data_dict


@TRANSFORMS.register_module()
class CenterShift:
    """center xy (and optionally z-min) (`transform.py:303-315`)"""

    def __init__(self, apply_z=True):
        self.apply_z = apply_z

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        x_min, y_min, z_min = coord.min(axis=0)
        x_max, y_max, _ = coord.max(axis=0)
        if self.apply_z:
            shift = [(x_min + x_max) / 2, (y_min + y_max) / 2, z_min]
        else:
            shift = [(x_min + x_max) / 2, (y_min + y_max) / 2, 0]
        data_dict["coord"] = coord - shift
        return data_dict


@TRANSFORMS.register_module()
class RandomShift:
    def __init__(self, shift=((-0.2, 0.2), (-0.2, 0.2), (0, 0))):
        self.shift = shift

    def __call__(self, data_dict):
        s = [np.random.uniform(lo, hi) for lo, hi in self.shift]
        data_dict["coord"] = data_dict["coord"] + s
        return data_dict


@TRANSFORMS.register_module()
class PointClip:
    def __init__(self, point_cloud_range=(-80, -80, -3, 80, 80, 1)):
        self.range = point_cloud_range

    def __call__(self, data_dict):
        data_dict["coord"] = np.clip(
            data_dict["coord"], self.range[:3], self.range[3:]
        )
        return data_dict


@TRANSFORMS.register_module()
class RandomDropout:
    def __init__(self, dropout_ratio=0.2, dropout_application_ratio=0.5):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio

    def __call__(self, data_dict):
        if np.random.random() < self.dropout_application_ratio:
            n = len(data_dict["coord"])
            idx = np.random.choice(n, int(n * (1 - self.dropout_ratio)), replace=False)
            data_dict = index_operator(data_dict, idx)
        return data_dict


def _rotation_matrix(axis: str, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


@TRANSFORMS.register_module()
class RandomRotate:
    """rotate around axis about cloud center (`transform.py:410-450`)"""

    def __init__(self, angle=None, center=None, axis="z", always_apply=False, p=0.5, keypoint_keys=()):
        self.angle = [-1, 1] if angle is None else angle
        self.axis = axis
        self.always_apply = always_apply
        self.p = p if not always_apply else 1.0
        self.center = center
        self.keypoint_keys = keypoint_keys

    def __call__(self, data_dict):
        if np.random.random() > self.p:
            return data_dict
        angle = np.random.uniform(self.angle[0], self.angle[1]) * np.pi
        rot = _rotation_matrix(self.axis, angle)
        coord = data_dict["coord"]
        if self.center is None:
            lo, hi = coord.min(0), coord.max(0)
            center = (lo + hi) / 2
        else:
            center = self.center
        data_dict["coord"] = (coord - center) @ rot.T + center
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"] @ rot.T
        for key in self.keypoint_keys:
            if key in data_dict:
                data_dict[key] = (data_dict[key] - center) @ rot.T + center
        return data_dict


@TRANSFORMS.register_module()
class RandomRotateTargetAngle(RandomRotate):
    def __init__(self, angle=(1 / 2, 1, 3 / 2), center=None, axis="z", always_apply=False, p=0.75):
        super().__init__(angle=angle, center=center, axis=axis, always_apply=always_apply, p=p)

    def __call__(self, data_dict):
        if np.random.random() > self.p:
            return data_dict
        angle = np.random.choice(self.angle) * np.pi
        rot = _rotation_matrix(self.axis, angle)
        coord = data_dict["coord"]
        if self.center is None:
            lo, hi = coord.min(0), coord.max(0)
            center = (lo + hi) / 2
        else:
            center = self.center
        data_dict["coord"] = (coord - center) @ rot.T + center
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"] @ rot.T
        return data_dict


@TRANSFORMS.register_module()
class RandomScale:
    def __init__(self, scale=None, anisotropic=False):
        self.scale = scale if scale is not None else [0.95, 1.05]
        self.anisotropic = anisotropic

    def __call__(self, data_dict):
        s = np.random.uniform(self.scale[0], self.scale[1], 3 if self.anisotropic else 1)
        data_dict["coord"] = data_dict["coord"] * s
        return data_dict


@TRANSFORMS.register_module()
class RandomFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, data_dict):
        for axis in (0, 1):
            if np.random.random() < self.p:
                data_dict["coord"][:, axis] = -data_dict["coord"][:, axis]
                if "normal" in data_dict:
                    data_dict["normal"][:, axis] = -data_dict["normal"][:, axis]
        return data_dict


@TRANSFORMS.register_module()
class RandomJitter:
    def __init__(self, sigma=0.01, clip=0.05):
        self.sigma = sigma
        self.clip = clip

    def __call__(self, data_dict):
        jitter = np.clip(
            self.sigma * np.random.randn(*data_dict["coord"].shape), -self.clip, self.clip
        )
        data_dict["coord"] = data_dict["coord"] + jitter
        return data_dict


@TRANSFORMS.register_module()
class ChromaticAutoContrast:
    def __init__(self, p=0.2, blend_factor=None):
        self.p = p
        self.blend_factor = blend_factor

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.random() < self.p:
            color = data_dict["color"]
            lo = np.min(color, axis=0, keepdims=True)
            hi = np.max(color, axis=0, keepdims=True)
            scale = 255 / np.maximum(hi - lo, 1e-6)
            contrast = (color - lo) * scale
            blend = self.blend_factor if self.blend_factor is not None else np.random.random()
            data_dict["color"] = (1 - blend) * color + blend * contrast
        return data_dict


@TRANSFORMS.register_module()
class ChromaticTranslation:
    def __init__(self, p=0.95, ratio=0.05):
        self.p = p
        self.ratio = ratio

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.random() < self.p:
            tr = (np.random.random((1, 3)) - 0.5) * 255 * 2 * self.ratio
            data_dict["color"] = np.clip(data_dict["color"] + tr, 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class ChromaticJitter:
    def __init__(self, p=0.95, std=0.005):
        self.p = p
        self.std = std

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.random() < self.p:
            noise = np.random.randn(data_dict["color"].shape[0], 3) * self.std * 255
            data_dict["color"] = np.clip(data_dict["color"] + noise, 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class ElasticDistortion:
    """granularity/magnitude blurred-noise displacement (`transform.py:765-823`)"""

    def __init__(self, distortion_params=None):
        self.params = [[0.2, 0.4], [0.8, 1.6]] if distortion_params is None else distortion_params

    @staticmethod
    def _distort(coords, granularity, magnitude):
        blurs = [np.ones((3, 1, 1, 1)) / 3, np.ones((1, 3, 1, 1)) / 3, np.ones((1, 1, 3, 1)) / 3]
        coords_min = coords.min(0)
        dims = ((coords - coords_min).max(0) // granularity).astype(int) + 3
        noise = np.random.randn(*dims, 3).astype(np.float32)
        for _ in range(2):
            for blur in blurs:
                noise = scipy.ndimage.convolve(noise, blur, mode="constant", cval=0)
        ax = [np.linspace(d_min, d_max, d) for d_min, d_max, d in zip(coords_min - granularity, coords_min + granularity * (dims - 2), dims)]
        interp = scipy.interpolate.RegularGridInterpolator(ax, noise, bounds_error=False, fill_value=0)
        return coords + interp(coords) * magnitude

    def __call__(self, data_dict):
        if "coord" in data_dict and self.params is not None:
            for granularity, magnitude in self.params:
                data_dict["coord"] = self._distort(data_dict["coord"], granularity, magnitude)
        return data_dict


def _voxel_runs(grid_coord: np.ndarray):
    """Group rows by voxel: sort rows by their 48-bit Morton key and describe
    each voxel as a contiguous run of the sorted order.

    Returns (by_voxel, run_start, run_len, voxel_of_row):
    ``by_voxel`` sorts rows voxel-by-voxel; voxel v owns sorted positions
    ``run_start[v] : run_start[v] + run_len[v]``; ``voxel_of_row[r]`` is the
    voxel id of ORIGINAL row r.  The Morton key is exact (collision-free,
    unlike the reference's FNV hash) and doubles as the downstream
    serialization key, so this sort is shared with the model plane.
    """
    from ..ops.serialization import z_order_encode_np

    assert grid_coord.max() < 2**16, "scene exceeds 16-bit voxel extent"
    key = z_order_encode_np(grid_coord, depth=16)
    by_voxel = np.argsort(key, kind="stable")
    _, voxel_of_sorted, run_len = np.unique(
        key[by_voxel], return_inverse=True, return_counts=True
    )
    run_start = np.concatenate([[0], np.cumsum(run_len[:-1])])
    voxel_of_row = np.empty_like(voxel_of_sorted)
    voxel_of_row[by_voxel] = voxel_of_sorted
    return by_voxel, run_start, run_len, voxel_of_row


@TRANSFORMS.register_module()
class GridSample:
    """Voxel down-sampling over exact Morton-keyed runs (`transform.py:826-963`).

    train mode: keep one uniformly-random row per voxel; test mode: exhaustive
    per-voxel splits — part i keeps each voxel's (i mod run_len)-th row, so
    every row appears in at least one part.  Always computes ``grid_coord``
    (the TPU model plane requires it); ``inverse`` maps original rows to their
    voxel id for full-resolution projection.
    """

    def __init__(
        self,
        grid_size=0.05,
        hash_type="fnv",  # accepted for config parity; keys are exact Morton
        mode="train",
        return_inverse=False,
        return_grid_coord=True,
        return_min_coord=False,
        return_displacement=False,
        project_displacement=False,
    ):
        self.grid_size = grid_size
        self.mode = mode
        self.return_inverse = return_inverse
        self.return_grid_coord = return_grid_coord
        self.return_min_coord = return_min_coord
        self.return_displacement = return_displacement
        self.project_displacement = project_displacement

    def __call__(self, data_dict):
        scaled = data_dict["coord"] / self.grid_size
        grid_coord = np.floor(scaled).astype(np.int64)
        origin = grid_coord.min(0)
        grid_coord = grid_coord - origin
        scaled = scaled - origin
        min_coord = origin * self.grid_size

        by_voxel, run_start, run_len, voxel_of_row = _voxel_runs(grid_coord)

        if self.mode == "train":
            # reference RNG contract (`transform.py:860-866`): one randint
            # vector modulo the run lengths
            offsets = np.random.randint(0, run_len.max(), run_len.size) % run_len
            keep = by_voxel[run_start + offsets]
            if "sampled_index" in data_dict:
                # data-efficient benchmarks: always keep the annotated rows
                keep = np.unique(np.append(keep, data_dict["sampled_index"]))
                mask = np.zeros(len(data_dict["segment"]), bool)
                mask[data_dict["sampled_index"]] = True
                data_dict["sampled_index"] = np.where(mask[keep])[0]
            if self.return_inverse:
                data_dict["inverse"] = voxel_of_row
            if self.return_displacement:
                displacement = scaled - grid_coord - 0.5  # sub-voxel offset
                if self.project_displacement:
                    displacement = np.sum(
                        displacement * data_dict["normal"], axis=-1, keepdims=True
                    )
                data_dict["displacement"] = displacement
            data_dict["grid_coord"] = grid_coord
            data_dict = index_operator(data_dict, keep)
            if self.return_min_coord:
                data_dict["min_coord"] = min_coord.reshape(1, 3)
            if not self.return_grid_coord:
                data_dict.pop("grid_coord")
            return data_dict

        if self.mode == "test":
            parts = []
            for i in range(run_len.max()):
                keep = by_voxel[run_start + i % run_len]
                data_dict["grid_coord"] = grid_coord
                part = index_operator(data_dict, keep, duplicate=True)
                part["index"] = keep
                if self.return_inverse:
                    part["inverse"] = voxel_of_row
                if self.return_min_coord:
                    part["min_coord"] = min_coord.reshape(1, 3)
                parts.append(part)
            return parts
        raise NotImplementedError(self.mode)


@TRANSFORMS.register_module()
class SphereCrop:
    """cap point count by nearest-to-center crop (`transform.py:966-1009`)"""

    def __init__(self, point_max=80000, sample_rate=None, mode="random"):
        self.point_max = point_max
        self.sample_rate = sample_rate
        assert mode in ("random", "center", "all")
        self.mode = mode

    def __call__(self, data_dict):
        point_max = (
            int(self.sample_rate * data_dict["coord"].shape[0])
            if self.sample_rate is not None
            else self.point_max
        )
        coord = data_dict["coord"]
        if coord.shape[0] > point_max:
            if self.mode == "random":
                center = coord[np.random.randint(coord.shape[0])]
            else:
                center = coord[coord.shape[0] // 2]
            idx = np.argsort(np.sum((coord - center) ** 2, axis=1))[:point_max]
            data_dict = index_operator(data_dict, idx)
        return data_dict


@TRANSFORMS.register_module()
class ShufflePoint:
    def __call__(self, data_dict):
        idx = np.random.permutation(data_dict["coord"].shape[0])
        return index_operator(data_dict, idx)


@TRANSFORMS.register_module()
class ContrastiveViewsGenerator:
    """Generate two augmented views of a cloud for MSC-style SSL.

    Parity surface: `transform.py:1033-1056` — applies ``view_trans`` twice to
    copies of the sample; every view point carries its ``origin`` row index so
    the model can recover exact cross-view correspondences after independent
    GridSample/crops.  Emits ``view{1,2}_{coord,feat,grid_coord,origin}`` (+
    ``view1_color_target`` when color present).
    """

    def __init__(self, view_keys=("coord", "color", "normal"), view_trans_cfg=None):
        self.view_keys = view_keys
        self.view_trans = Compose(view_trans_cfg)

    def __call__(self, data_dict):
        n = data_dict["coord"].shape[0]
        out = {}
        for i in (1, 2):
            view = {k: data_dict[k].copy() for k in self.view_keys if k in data_dict}
            view["origin"] = np.arange(n)
            # pre-augmentation coords ride along (the reference's cross-mask
            # patches live in the ORIGINAL scene frame, `masked_scene_contrast
            # _v1m1_base.py:70-141`); only row-indexing ops touch them
            view["origin_coord"] = data_dict["coord"].copy()
            view["index_valid_keys"] = [k for k in self.view_keys if k in view] + [
                "origin", "origin_coord", "grid_coord"
            ]
            view = self.view_trans(view)
            feats = [view[k].reshape(len(view["coord"]), -1) for k in self.view_keys if k != "coord" and k in view]
            out[f"view{i}_coord"] = view["coord"].astype(np.float32)
            out[f"view{i}_feat"] = (
                np.concatenate(feats, axis=1).astype(np.float32) if feats else view["coord"].astype(np.float32)
            )
            out[f"view{i}_grid_coord"] = view.get("grid_coord", np.zeros_like(view["coord"], dtype=np.int64)).astype(np.int64)
            out[f"view{i}_origin"] = view["origin"].astype(np.int64)
            out[f"view{i}_origin_coord"] = view["origin_coord"].astype(np.float32)
            if i == 1 and "color" in view:
                out["view1_color_target"] = view["color"].astype(np.float32)
            if i == 1 and "normal" in view:
                out["view1_normal_target"] = view["normal"].astype(np.float32)
        # keep a primary cloud for PointBatch plumbing (view1)
        out["coord"] = out["view1_coord"]
        out["feat"] = out["view1_feat"]
        out["grid_coord"] = out["view1_grid_coord"]
        return out


@TRANSFORMS.register_module()
class InstanceParser:
    """Prepare instance targets: remap ids, per-point instance centroid.

    Parity surface: `transform.py:1239-1283` — instances whose semantic class
    is ignored get the instance ignore index; emits ``instance_centroid``
    (N, 3) used by PointGroup's shift-vector loss.
    """

    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1):
        self.segment_ignore_index = segment_ignore_index
        self.instance_ignore_index = instance_ignore_index

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        segment = data_dict["segment"]
        instance = data_dict["instance"].copy()
        mask = ~np.isin(segment, self.segment_ignore_index)
        instance[~mask] = self.instance_ignore_index
        # compact ids
        uniq = np.unique(instance[instance != self.instance_ignore_index])
        remap = {old: new for new, old in enumerate(uniq)}
        out = np.full_like(instance, self.instance_ignore_index)
        for old, new in remap.items():
            out[instance == old] = new
        centroid = coord.copy()
        for new in range(len(uniq)):
            sel = out == new
            centroid[sel] = coord[sel].mean(0)
        data_dict["instance"] = out
        data_dict["instance_centroid"] = centroid.astype(np.float32)
        if "instance_centroid" not in data_dict.get("index_valid_keys", ()):
            data_dict.setdefault("index_valid_keys", list(VALID_INDEX_KEYS)).append("instance_centroid")
        return data_dict


@TRANSFORMS.register_module()
class CropBoundary:
    def __call__(self, data_dict):
        segment = data_dict["segment"].flatten()
        mask = (segment != 0) * (segment != 1)
        return index_operator(data_dict, np.where(mask)[0])


@TRANSFORMS.register_module()
class RandomColorGrayScale:
    """Randomly convert color to grayscale (`transform.py` parity)."""

    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.random() < self.p:
            gray = data_dict["color"] @ np.array([0.299, 0.587, 0.114])
            data_dict["color"] = np.tile(gray[:, None], (1, 3))
        return data_dict


@TRANSFORMS.register_module()
class RandomColorJitter:
    """Brightness/contrast/saturation jitter over 0..255 colors."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.2, p=0.95):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.p = p

    def __call__(self, data_dict):
        if "color" not in data_dict or np.random.random() > self.p:
            return data_dict
        color = data_dict["color"].astype(np.float32)
        if self.brightness:
            color = color * np.random.uniform(1 - self.brightness, 1 + self.brightness)
        if self.contrast:
            mean = color.mean()
            color = (color - mean) * np.random.uniform(1 - self.contrast, 1 + self.contrast) + mean
        if self.saturation:
            gray = color @ np.array([0.299, 0.587, 0.114])
            f = np.random.uniform(1 - self.saturation, 1 + self.saturation)
            color = gray[:, None] + (color - gray[:, None]) * f
        data_dict["color"] = np.clip(color, 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class HueSaturationTranslation:
    """HSV-space jitter (`transform.py` parity)."""

    def __init__(self, hue_max=0.5, saturation_max=0.2):
        self.hue_max = hue_max
        self.saturation_max = saturation_max

    def __call__(self, data_dict):
        if "color" not in data_dict:
            return data_dict
        rgb = np.clip(data_dict["color"], 0, 255).astype(np.float32) / 255.0
        maxc = rgb.max(-1)
        minc = rgb.min(-1)
        v = maxc
        delta = maxc - minc
        s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-8), 0)
        # approximate hue shift via channel roll blend (cheap, matches intent)
        hue_shift = (np.random.random() - 0.5) * 2 * self.hue_max
        sat_shift = (np.random.random() - 0.5) * 2 * self.saturation_max
        s = np.clip(s + sat_shift, 0, 1)
        rolled = np.roll(rgb, 1, axis=-1)
        rgb = np.clip(rgb * (1 - abs(hue_shift)) + rolled * abs(hue_shift), 0, 1)
        mean = rgb.mean(-1, keepdims=True)
        rgb = mean + (rgb - mean) * (s / np.maximum(s.mean() + 1e-8, 1e-8))[:, None]
        data_dict["color"] = np.clip(rgb * 255.0, 0, 255)
        return data_dict


def _pad_view(view, prefix, view_keys, slot, extra_keys=()):
    """Assemble one crop view into fixed-slot arrays `{prefix}{coord,feat,
    grid_coord,origin,valid,...}` — the padded-slot analogue of the reference's
    ragged per-view concatenation (`transform.py:1208-1237`)."""
    n = len(view["coord"])
    if n > slot:
        idx = np.random.choice(n, slot, replace=False)
        for key in list(view.keys()):
            if isinstance(view.get(key), np.ndarray) and view[key].shape[:1] == (n,):
                view[key] = view[key][idx]
        n = slot
    feats = [
        view[k].reshape(n, -1).astype(np.float32)
        for k in view_keys
        if k != "coord" and k in view and isinstance(view[k], np.ndarray)
    ]
    feat = np.concatenate(feats, axis=1) if feats else view["coord"].astype(np.float32)
    out = {
        prefix + "coord": view["coord"].astype(np.float32),
        prefix + "feat": feat,
        prefix + "grid_coord": view.get(
            "grid_coord", np.zeros((n, 3), dtype=np.int64)
        ).astype(np.int64),
        prefix + "origin": view["origin"].astype(np.int64),
    }
    for k in extra_keys:
        if k in view:
            out[prefix + k] = view[k]
    valid = np.zeros(slot, bool)
    valid[:n] = True
    for key, arr in list(out.items()):
        pad = [(0, slot - n)] + [(0, 0)] * (arr.ndim - 1)
        fill = -1 if key.endswith(("origin", "correspondence")) else 0
        out[key] = np.pad(arr, pad, constant_values=fill)
    out[prefix + "valid"] = valid
    return out


@TRANSFORMS.register_module()
class MultiViewGenerator:
    """Multi-crop view generator for Concerto/Sonata-style SSL.

    Parity surface: `transform.py:1058-1237` — a *major* global crop centered
    at a random point (within ``center_height_scale`` of the z-range, or at
    the centroid of image-corresponded points when ``correspondence`` is
    present), further global crops centered inside the major crop, and
    ``local_view_num`` small crops covering the major crop; each crop is the
    ``size`` nearest points to its center with ``size ~ U(scale)·N``.

    TPU re-design: each view is emitted as fixed-slot padded arrays
    ``global{i}_*`` / ``local{j}_*`` (with validity masks) instead of
    offset-chained concatenation, and every view point carries its ``origin``
    row index so the model recovers exact cross-view correspondences without
    a knn (`concerto_v1m1_base.py:478-494` match_neighbour equivalent).
    The major view keeps its point→image-patch ``correspondence`` rows for
    the 2D-distillation branch.
    """

    def __init__(
        self,
        global_view_num=2,
        global_view_scale=(0.4, 1.0),
        local_view_num=4,
        local_view_scale=(0.1, 0.4),
        global_shared_transform=None,
        global_transform=None,
        local_transform=None,
        max_size=65536,
        center_height_scale=(0.0, 1.0),
        shared_global_view=False,
        view_keys=("coord", "color", "normal"),
        global_slot=4096,
        local_slot=1024,
    ):
        self.global_view_num = global_view_num
        self.global_view_scale = global_view_scale
        self.local_view_num = local_view_num
        self.local_view_scale = local_view_scale
        self.global_shared_transform = Compose(global_shared_transform)
        self.global_transform = Compose(global_transform)
        self.local_transform = Compose(local_transform)
        self.max_size = max_size
        self.center_height_scale = center_height_scale
        self.shared_global_view = shared_global_view
        self.view_keys = view_keys
        self.global_slot = global_slot
        self.local_slot = local_slot

    def _get_view(self, point, center, scale, keep_correspondence=False):
        coord = point["coord"]
        max_size = min(self.max_size, coord.shape[0])
        size = max(int(np.random.uniform(*scale) * max_size), 10)
        index = np.argsort(np.sum(np.square(coord - center), axis=-1))[:size]
        view = {k: point[k][index] for k in self.view_keys if k in point}
        view["origin"] = point["origin"][index]
        if keep_correspondence and "correspondence" in point:
            view["correspondence"] = point["correspondence"][index]
        view["index_valid_keys"] = [k for k in view if k != "index_valid_keys"] + ["grid_coord"]
        return view, index

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        n = coord.shape[0]
        data_dict["origin"] = np.arange(n)
        point = self.global_shared_transform(copy.deepcopy(data_dict))

        # major-view center: image-corresponded centroid if available, else a
        # random point within the configured z-band (`transform.py:1136-1161`)
        major_center = None
        if "correspondence" in data_dict:
            given = np.any(
                data_dict["correspondence"].reshape(n, -1) != -1, axis=1
            )
            if given.any():
                major_center = coord[given].mean(axis=0)
        if major_center is None:
            z_min, z_max = coord[:, 2].min(), coord[:, 2].max()
            lo = z_min + (z_max - z_min) * self.center_height_scale[0]
            hi = z_min + (z_max - z_min) * self.center_height_scale[1]
            band = np.logical_and(coord[:, 2] >= lo, coord[:, 2] <= hi)
            if not band.any():
                band[:] = True
            major_center = coord[np.random.choice(np.where(band)[0])]

        major_view, major_index = self._get_view(
            point, major_center, self.global_view_scale, keep_correspondence=True
        )
        major_coord = major_view["coord"]

        global_views = [major_view]
        for _ in range(self.global_view_num - 1):
            if self.shared_global_view:
                global_views.append({k: (v.copy() if isinstance(v, np.ndarray) else list(v)) for k, v in major_view.items()})
            else:
                center = major_coord[np.random.randint(major_coord.shape[0])]
                global_views.append(self._get_view(point, center, self.global_view_scale)[0])

        cover = np.zeros(len(major_index), bool)
        local_views = []
        for _ in range(self.local_view_num):
            if (~cover).sum() == 0:
                cover[:] = False
            center = major_coord[np.random.choice(np.where(~cover)[0])]
            view, index = self._get_view(data_dict, center, self.local_view_scale)
            local_views.append(view)
            cover[np.isin(major_index, index)] = True

        out = {k: v for k, v in data_dict.items() if k not in ("origin",)}
        for i, view in enumerate(global_views):
            view = self.global_transform(view)
            out.update(
                _pad_view(
                    view, f"global{i + 1}_", self.view_keys, self.global_slot,
                    extra_keys=("correspondence",) if i == 0 else (),
                )
            )
        for j, view in enumerate(local_views):
            view = self.local_transform(view)
            out.update(_pad_view(view, f"local{j + 1}_", self.view_keys, self.local_slot))
        # primary cloud for PointBatch plumbing = major global view
        out["coord"] = out["global1_coord"]
        out["feat"] = out["global1_feat"]
        out["grid_coord"] = out["global1_grid_coord"]
        out["valid"] = out["global1_valid"]
        out.pop("correspondence", None)
        return out


# ---------------------------------------------------------------------------
# Image transforms (Concerto 2D branch) — numpy equivalents of the
# torchvision-based ops at `transform.py:1298-1400`; images are [V, 3, H, W]
# float arrays in [0, 1].
# ---------------------------------------------------------------------------

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


@TRANSFORMS.register_module()
class ImgNormalize:
    """Channel-wise standardization (`transform.py:1364-1375` Imgnormalize)."""

    def __init__(self, mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD, key="images"):
        self.mean = np.asarray(mean, np.float32).reshape(1, 3, 1, 1)
        self.std = np.asarray(std, np.float32).reshape(1, 3, 1, 1)
        self.key = key

    def __call__(self, data_dict):
        if self.key in data_dict and len(data_dict[self.key]):
            data_dict[self.key] = (data_dict[self.key] - self.mean) / self.std
        return data_dict


@TRANSFORMS.register_module()
class ImgGaussianBlur:
    """Random gaussian blur (`transform.py:1308-1327`)."""

    def __init__(self, p=0.5, radius_min=0.1, radius_max=2.0, key="images"):
        self.p = p
        self.radius_min = radius_min
        self.radius_max = radius_max
        self.key = key

    def __call__(self, data_dict):
        imgs = data_dict.get(self.key)
        if imgs is None or not len(imgs):
            return data_dict
        if np.random.rand() < self.p:
            sigma = np.random.uniform(self.radius_min, self.radius_max)
            data_dict[self.key] = scipy.ndimage.gaussian_filter(
                imgs, sigma=(0, 0, sigma, sigma)
            ).astype(imgs.dtype)
        return data_dict


@TRANSFORMS.register_module()
class ImgChromaticJitter:
    """Per-channel additive noise (`transform.py:1330-1342`)."""

    def __init__(self, p=0.95, std=0.005, key="images"):
        self.p = p
        self.std = std
        self.key = key

    def __call__(self, data_dict):
        imgs = data_dict.get(self.key)
        if imgs is None or not len(imgs):
            return data_dict
        if np.random.rand() < self.p:
            noise = (np.random.rand(3).astype(np.float32) * self.std).reshape(1, 3, 1, 1)
            data_dict[self.key] = np.clip(imgs + noise, 0, 1)
        return data_dict


@TRANSFORMS.register_module()
class ImgPixelContrast:
    """Invert a random subset of pixels (`transform.py:1345-1360`)."""

    def __init__(self, threshold=0.01, p=0.2, key="images"):
        self.threshold = threshold
        self.p = p
        self.key = key

    def __call__(self, data_dict):
        imgs = data_dict.get(self.key)
        if imgs is None or not len(imgs):
            return data_dict
        if np.random.rand() < self.p:
            v, _, h, w = imgs.shape
            num = int(self.threshold * v * h * w)
            flat = imgs.transpose(0, 2, 3, 1).reshape(-1, 3)
            idx = np.random.randint(0, flat.shape[0], num)
            flat[idx] = 1.0 - flat[idx]
            data_dict[self.key] = flat.reshape(v, h, w, 3).transpose(0, 3, 1, 2)
        return data_dict
