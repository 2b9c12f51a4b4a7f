"""nuScenes preprocessing: devkit tables -> per-frame info pkls + lidarseg npy.

Parity surface: `pointcept/datasets/preprocessing/nuscenes/
preprocess_nuscenes_info.py` — walk the official splits via the nuscenes
devkit, collect per-sample lidar paths, poses, sweeps, and lidarseg label
paths into ``nuscenes_infos_{train,val,test}.pkl``, which
``NuScenesDataset`` consumes.  Requires ``pip install nuscenes-devkit``
(absent from this image — like the reference, preprocessing runs in its own
environment; the script import-gates cleanly).
"""

from __future__ import annotations

import argparse
import os
import pickle
from pathlib import Path

import numpy as np

try:
    from nuscenes import NuScenes
    from nuscenes.utils import splits as nuscenes_splits
except ImportError:  # pragma: no cover - optional heavy dependency
    NuScenes = None


def get_available_scenes(nusc):
    """Scenes whose lidar files actually exist on disk
    (`preprocess_nuscenes_info.py:163-183`)."""
    available = []
    for scene in nusc.scene:
        token = scene["token"]
        sample = nusc.get("sample", scene["first_sample_token"])
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        lidar_path, _, _ = nusc.get_sample_data(sd["token"])
        if Path(lidar_path).exists():
            available.append(scene)
    return available


def fill_infos(nusc, scenes, test=False, max_sweeps=10):
    infos = []
    for sample in nusc.sample:
        scene_token = sample["scene_token"]
        if scene_token not in scenes:
            continue
        ref_sd_token = sample["data"]["LIDAR_TOP"]
        ref_sd = nusc.get("sample_data", ref_sd_token)
        lidar_path, _, _ = nusc.get_sample_data(ref_sd_token)
        info = {
            "token": sample["token"],
            "lidar_path": str(lidar_path),
            "timestamp": sample["timestamp"],
            "sweeps": [],
        }
        # previous sweeps for multi-sweep accumulation (NuScenesDataset sweeps=)
        sd = ref_sd
        while len(info["sweeps"]) < max_sweeps and sd["prev"]:
            sd = nusc.get("sample_data", sd["prev"])
            sweep_path, _, _ = nusc.get_sample_data(sd["token"])
            info["sweeps"].append({"lidar_path": str(sweep_path), "timestamp": sd["timestamp"]})
        if not test:
            info["gt_segment_path"] = os.path.join(
                nusc.dataroot, nusc.get("lidarseg", ref_sd_token)["filename"]
            )
        infos.append(info)
    return infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--version", default="v1.0-trainval", choices=["v1.0-trainval", "v1.0-test", "v1.0-mini"])
    ap.add_argument("--max_sweeps", type=int, default=10)
    args = ap.parse_args()

    if NuScenes is None:
        raise SystemExit(
            "nuscenes-devkit is not installed in this environment. Create a "
            "separate venv (`pip install nuscenes-devkit`) and re-run."
        )

    nusc = NuScenes(version=args.version, dataroot=args.dataset_root, verbose=True)
    available = get_available_scenes(nusc)
    name2token = {s["name"]: s["token"] for s in available}

    os.makedirs(args.output_root, exist_ok=True)
    if args.version == "v1.0-test":
        test_tokens = {name2token[n] for n in nuscenes_splits.test if n in name2token}
        infos = fill_infos(nusc, test_tokens, test=True, max_sweeps=args.max_sweeps)
        with open(os.path.join(args.output_root, "nuscenes_infos_test.pkl"), "wb") as f:
            pickle.dump(infos, f)
        print(f"test: {len(infos)} frames")
        return

    splits = {
        "train": nuscenes_splits.train if args.version == "v1.0-trainval" else nuscenes_splits.mini_train,
        "val": nuscenes_splits.val if args.version == "v1.0-trainval" else nuscenes_splits.mini_val,
    }
    for split, names in splits.items():
        tokens = {name2token[n] for n in names if n in name2token}
        infos = fill_infos(nusc, tokens, test=False, max_sweeps=args.max_sweeps)
        with open(os.path.join(args.output_root, f"nuscenes_infos_{split}.pkl"), "wb") as f:
            pickle.dump(infos, f)
        print(f"{split}: {len(infos)} frames")


if __name__ == "__main__":
    main()
