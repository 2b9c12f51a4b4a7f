"""Run the semantic SLAM frontend on a KITTI odometry sequence.

BASELINE config #4 driver: loads scans (SemanticKITTI layout), optionally
runs the semseg model per scan to drop dynamic classes
(the reference's `SemanticFAST-LIO2-prediction/infer.py` +
`fusion_clean_bag.py` stage, internalized), estimates the trajectory with the
scan-to-map ICP odometry, and reports ATE/RPE against the KITTI ground truth
when available.
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from pointcept_keypointdetection_tpu.utils.config import DictAction

    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="configs/slam/kitti_odometry.py")
    parser.add_argument("--sequence", default=None)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--options", nargs="+", action=DictAction, help="config overrides key=value")
    args = parser.parse_args()

    from pointcept_keypointdetection_tpu.datasets.semantic_kitti import read_scan
    from pointcept_keypointdetection_tpu.slam.evaluate import (
        absolute_trajectory_error,
        load_kitti_poses,
        relative_pose_error,
    )
    from pointcept_keypointdetection_tpu.slam.pipeline import LidarOdometry, OdometryConfig
    from pointcept_keypointdetection_tpu.utils.config import Config

    cfg = Config.fromfile(args.config_file)
    if args.options:
        cfg.merge_from_dict(args.options)
    seq = args.sequence or cfg.sequence
    seq_dir = os.path.join(cfg.data_root, "dataset", "sequences", seq)
    scans = sorted(glob.glob(os.path.join(seq_dir, "velodyne", "*.bin")))
    max_frames = args.max_frames or cfg.get("max_frames")
    if max_frames:
        scans = scans[:max_frames]
    if not scans:
        raise FileNotFoundError(f"no scans under {seq_dir}")

    label_fn = None
    dynamic = ()
    if cfg.semantic.get("enabled"):
        dynamic = tuple(cfg.semantic.get("dynamic_classes", ()))
        if cfg.semantic.get("labels_from") == "files":
            # GT labels from <seq>/labels/*.label — the reference's
            # upper-bound experiment (`fusion_gt_clean_bag.py`)
            from pointcept_keypointdetection_tpu.datasets.semantic_kitti import read_label

            def label_fn(path, scan):
                lbl = path.replace(os.sep + "velodyne" + os.sep, os.sep + "labels" + os.sep)
                return read_label(lbl[: -len(".bin")] + ".label"), None

        else:
            semantic_infer = _build_semseg(cfg)
            label_fn = lambda path, scan: semantic_infer(scan)

    odo_cfg = OdometryConfig(dynamic_classes=dynamic, **{
        k: v for k, v in dict(cfg.odometry).items()
    })
    slam_opts = dict(cfg.get("slam") or {})  # --options slam=None = odometry-only
    if slam_opts:
        # full back-end (config #4): keyframes + loop closure + pose graph
        from pointcept_keypointdetection_tpu.slam.semantic_slam import (
            SemanticSLAM,
            SlamConfig,
        )

        engine = SemanticSLAM(SlamConfig(odometry=odo_cfg, **slam_opts))
    else:
        engine = LidarOdometry(odo_cfg)

    t0 = time.time()
    for i, path in enumerate(scans):
        scan = read_scan(path)
        labels, embedding = label_fn(path, scan) if label_fn else (None, None)
        if slam_opts:
            # the learned scan embedding (pooled semseg backbone features)
            # joins the keyframe place-recognition descriptor
            engine.process(scan, labels, embedding=embedding)
        else:
            engine.process(scan, labels)
        if (i + 1) % 50 == 0:
            print(f"[{i + 1}/{len(scans)}] {(i + 1) / (time.time() - t0):.2f} scans/s")
    elapsed = time.time() - t0
    print(f"Processed {len(scans)} scans in {elapsed:.1f}s ({len(scans) / elapsed:.2f} scans/s)")

    os.makedirs(cfg.save_path, exist_ok=True)
    poses = engine.odo.poses if slam_opts else engine.poses
    positions = engine.positions
    if slam_opts:
        # retro-corrected trajectory: every frame re-based on its anchor
        # keyframe's optimized pose (a loop closure fixes the past)
        final = engine.final_trajectory()
        positions = final[:, :3, 3]
        poses = list(final)
        print(
            f"keyframes: {engine.keyframe_count}   edges: {engine.edge_count}   "
            f"loop closures: {engine.loop_count}"
        )
    traj = np.stack([p[:3].reshape(-1) for p in poses])
    np.savetxt(os.path.join(cfg.save_path, f"traj_{seq}.txt"), traj, fmt="%.6f")

    gt_file = os.path.join(cfg.data_root, "dataset", "poses", f"{seq}.txt")
    if os.path.exists(gt_file):
        gt = load_kitti_poses(gt_file)[: len(poses), :3, 3]
        # KITTI gt poses are in the left-camera frame; compare xyz trajectories
        # after Umeyama alignment (absorbs the cam-velodyne extrinsic).
        ate, _ = absolute_trajectory_error(positions, gt, align=True)
        rpe, _ = relative_pose_error(positions, gt, delta=10)
        print(f"ATE RMSE: {ate:.3f} m   RPE@10: {rpe:.3f} m")
        if slam_opts:
            live = engine.odo.positions
            ate_live, _ = absolute_trajectory_error(live, gt, align=True)
            print(f"ATE RMSE (live, no retro-correction): {ate_live:.3f} m")


def _build_semseg(cfg):
    import jax
    import jax.numpy as jnp

    from pointcept_keypointdetection_tpu.datasets.collate import collate, pad_sample
    from pointcept_keypointdetection_tpu.engines.common import build_point_batch
    from pointcept_keypointdetection_tpu.engines.test import sample_to_device
    from pointcept_keypointdetection_tpu.models import build_model
    from pointcept_keypointdetection_tpu.utils.checkpoint import load_checkpoint, restore_into
    from pointcept_keypointdetection_tpu.utils.config import Config

    sem_cfg = Config.fromfile(cfg.semantic.config)
    model = build_model(dict(sem_cfg.model))
    slot = int(cfg.semantic.get("slot", 131072))
    state = {"vars": None, "fwd": None}

    def infer(scan):
        coord = scan[:, :3]
        strength = scan[:, 3:4]
        grid = np.floor(coord / 0.05).astype(np.int64)
        grid -= grid.min(0)
        from pointcept_keypointdetection_tpu.ops.serialization import z_order_encode_np

        key = z_order_encode_np(np.minimum(grid, 2**16 - 1), 16)
        # np.unique returns (values, first_index, inverse) in THIS order
        _, sel, inv = np.unique(key, return_index=True, return_inverse=True)
        data = dict(
            coord=coord[sel].astype(np.float32),
            grid_coord=grid[sel].astype(np.int32),
            feat=np.concatenate([coord[sel], strength[sel]], 1).astype(np.float32),
        )
        n = len(sel)
        batch = collate([pad_sample(data, slot)], slot)
        dev = sample_to_device(batch)
        if state["vars"] is None:
            import functools

            point = build_point_batch(dev, 1)
            variables = jax.jit(functools.partial(model.init, train=False))(
                {"params": jax.random.PRNGKey(0)}, point, dev
            )
            if cfg.semantic.get("weight"):
                loaded = load_checkpoint(cfg.semantic.weight)
                variables = {
                    "params": restore_into(jax.device_get(variables["params"]), loaded["params"]),
                    "batch_stats": restore_into(
                        jax.device_get(variables.get("batch_stats", {})), loaded.get("batch_stats", {})
                    ),
                }
            state["vars"] = variables

            def fwd(v, b):
                point = build_point_batch(b, 1)
                out, mods = model.apply(
                    v, point, b, train=False, mutable=["intermediates"]
                )
                pred = jnp.argmax(out["seg_logits"], -1)
                # learned scan embedding for the SLAM place-recognition
                # frontend (slam/frontend.py): masked mean pool of the
                # backbone features the forward already computed.  Segmentors
                # other than DefaultSegmentor/V2 may not sow backbone_feat —
                # fall back to pooled logits (still the model's learned
                # representation) instead of crashing
                inter = mods.get("intermediates", {})
                feat = inter.get("backbone_feat", (out["seg_logits"],))[0]
                w = point.valid.astype(feat.dtype)[:, None]
                emb = (feat * w).sum(0) / jnp.maximum(w.sum(), 1.0)
                return pred, emb.astype(jnp.float32)

            state["fwd"] = jax.jit(fwd)
        pred, emb = state["fwd"](state["vars"], dev)
        pred = np.asarray(pred)[:n]
        return pred[inv], np.asarray(emb)  # labels back at full resolution

    return infer


if __name__ == "__main__":
    main()
