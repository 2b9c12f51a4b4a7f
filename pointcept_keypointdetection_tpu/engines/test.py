"""Testers: full-resolution TTA inference.

Parity surface: `pointcept/engines/test.py` — the ``TESTERS`` registry,
``SemSegTester`` (fragment/TTA inference: per-scene fragment list from
GridSample(test) x aug variants, per-fragment softmax accumulated into a
full-resolution prediction via the ``index`` map, per-dataset submission
writers, global mIoU), ``ClsTester``.  Keypoint testers live in
tools/infer_offset.py-equivalent utilities plus ``OffsetKeypointTester`` here.

The per-fragment forward is one jitted function at a fixed padded fragment
capacity; fragments stream through it scene by scene.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import build_dataset
from ..datasets.collate import collate
from ..models import build_model
from ..utils.checkpoint import load_checkpoint, restore_into
from ..utils.logger import get_root_logger
from ..utils.misc import AverageMeter, intersection_and_union, make_dirs
from ..utils.registry import Registry
from .common import build_point_batch

TESTERS = Registry("testers")


class TesterBase:
    def __init__(self, cfg, model=None, variables=None, test_loader=None, verbose=False):
        self.logger = get_root_logger(
            log_file=os.path.join(cfg.save_path, "test.log"), file_mode="a"
        )
        self.logger.info("=> Loading config ...")
        self.cfg = cfg
        self.verbose = verbose
        if model is None or variables is None:
            self.logger.info("=> Building model ...")
            self.model = build_model(dict(cfg.model))
            self.variables = self.load_variables()
        else:
            self.model = model
            self.variables = variables
        if test_loader is None:
            self.logger.info("=> Building test dataset & loader ...")
            self.test_dataset = build_dataset(dict(cfg.data.test))
        else:
            self.test_dataset = test_loader

    def load_variables(self):
        cfg = self.cfg
        weight_path = cfg.get("weight") or os.path.join(cfg.save_path, "model", "model_best.ckpt")
        if not os.path.isfile(weight_path):
            alt = os.path.join(cfg.save_path, "model", "model_last.ckpt")
            weight_path = alt if os.path.isfile(alt) else weight_path
        if not os.path.isfile(weight_path):
            raise FileNotFoundError(f"no checkpoint at {weight_path}")
        self.logger.info(f"Loading weight at: {weight_path}")
        loaded = load_checkpoint(weight_path)

        # build template variables by shape-only init on a probe batch
        sample = self.probe_sample()
        point = build_point_batch(sample, sample["num_samples"])
        import functools

        variables = jax.jit(functools.partial(self.model.init, train=False))(
            {"params": jax.random.PRNGKey(0)}, point, sample_to_device(sample)
        )
        params = restore_into(jax.device_get(variables["params"]), loaded["params"])
        batch_stats = restore_into(
            jax.device_get(variables.get("batch_stats", {})), loaded.get("batch_stats", {})
        )
        self.logger.info(f"=> Loaded weight (epoch {loaded.get('epoch', '?')})")
        return {"params": params, "batch_stats": batch_stats}

    def probe_sample(self):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError

    def scene_indices(self):
        """Shard test scenes over processes (reference DistributedSampler +
        rank-0 gather contract, `engines/test.py:312-314`); per-process partial
        metrics are re-joined with ``host_allreduce_sum``."""
        from ..parallel.collectives import process_count

        n = len(self.test_dataset)
        if process_count() == 1:
            return range(n)
        return range(jax.process_index(), n, process_count())


def sample_to_device(batch: Dict) -> Dict:
    out = {}
    for key, value in batch.items():
        if key in ("name", "num_samples") or isinstance(value, (list, str)):
            continue
        arr = np.asarray(value)
        if arr.dtype == object or arr.dtype.kind in "US":
            continue
        out[key] = jnp.asarray(arr)
    return out


def _pad_fragment(frag: Dict, capacity: int) -> Dict:
    """Pad one fragment dict to the fixed capacity (keeps 'index')."""
    from ..datasets.collate import pad_sample

    return pad_sample(dict(frag), capacity)


@TESTERS.register_module()
class SemSegTester(TesterBase):
    """Fragment/TTA semantic segmentation tester (`engines/test.py:122-354`)."""

    def __init__(self, cfg, fragment_capacity=None, **kwargs):
        # attrs used by probe_sample() must exist before the base init loads weights
        self.fragment_capacity = fragment_capacity or cfg.get("slot_size", 131072)
        self.num_classes = cfg.data.num_classes
        self.ignore_index = cfg.data.get("ignore_index", -1)
        self._forward = None
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        backbone = self.cfg.model.get("backbone") or {}
        frag = {
            "coord": np.zeros((4, 3), np.float32),
            "grid_coord": np.zeros((4, 3), np.int32),
            "feat": np.zeros((4, backbone.get("in_channels", 3)), np.float32),
            "segment": np.zeros((4,), np.int32),
        }
        return collate([_pad_fragment(frag, self.fragment_capacity)], self.fragment_capacity)

    def _build_forward(self):
        model = self.model

        def forward(variables, batch):
            point = build_point_batch(batch, 1)
            out = model.apply(variables, point, batch, train=False)
            probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)
            return probs

        self._forward = jax.jit(forward)

    def scene_batch_extras(self, data_dict: Dict) -> Dict:
        """Scene-level arrays merged into every fragment batch (DINO etc.)."""
        return {}

    def test(self):
        assert self.test_dataset.test_mode
        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        if self._forward is None:
            self._build_forward()

        save_path = os.path.join(self.cfg.save_path, "result")
        make_dirs(save_path)
        K = self.num_classes
        inter_sum, union_sum, target_sum = np.zeros(K), np.zeros(K), np.zeros(K)
        batch_time = AverageMeter()

        for idx in self.scene_indices():
            start = time.time()
            data_dict = self.test_dataset[idx]
            fragment_list = data_dict.pop("fragment_list")
            segment = data_dict.pop("segment")
            name = data_dict.pop("name")
            extras = self.scene_batch_extras(data_dict)
            # width comes from the model's first output: PPT-style models emit
            # max(num_classes)-wide padded logits (extra columns ~0 after
            # softmax), plain segmentors emit exactly K
            pred = None

            for frag in fragment_list:
                index = frag.pop("index")
                n = frag["coord"].shape[0]
                if n > self.fragment_capacity:
                    logger.warning(
                        f"{name}: fragment {n} pts > capacity {self.fragment_capacity}; truncating"
                    )
                    # truncate DETERMINISTICALLY and keep `index` aligned —
                    # pad_sample's random subsample would decouple row r of
                    # the forward output from index[r]
                    frag = {
                        k: (v[: self.fragment_capacity]
                            if isinstance(v, np.ndarray) and v.shape[:1] == (n,) else v)
                        for k, v in frag.items()
                    }
                    index = index[: self.fragment_capacity]
                    n = self.fragment_capacity
                padded = _pad_fragment(frag, self.fragment_capacity)
                batch = collate([padded], self.fragment_capacity)
                batch.update(extras)
                probs = np.asarray(self._forward(self.variables, sample_to_device(batch)))
                if pred is None:
                    pred = np.zeros((segment.size, probs.shape[1]), np.float32)
                m = min(n, self.fragment_capacity)
                pred[index[:m]] += probs[:m]

            if pred is None:
                pred = np.zeros((segment.size, K), np.float32)
            seg_pred = pred[:, :K].argmax(axis=1)
            if "origin_segment" in data_dict and "inverse" in data_dict:
                seg_pred = seg_pred[data_dict["inverse"]]
                segment = data_dict["origin_segment"]
            np.save(os.path.join(save_path, f"{name}_pred.npy"), seg_pred)
            if self.cfg.get("save_submit"):
                if "ScanNetPP" in self.cfg.data.test.type:
                    # ScanNet++ benchmark wants the top-3 predictions per
                    # vertex (parity: `engines/test.py:216-223`)
                    top3 = np.argsort(-pred[:, :K], axis=1)[:, :3]
                    if "inverse" in data_dict:
                        top3 = top3[data_dict["inverse"]]
                    out_dir = os.path.join(save_path, "submit")
                    make_dirs(out_dir)
                    np.savetxt(
                        os.path.join(out_dir, f"{name}.txt"), top3, fmt="%d", delimiter=","
                    )
                else:
                    write_submission(self.cfg.data.test.type, save_path, name, seg_pred)

            inter, union, target = intersection_and_union(seg_pred, segment, K, self.ignore_index)
            inter_sum += inter
            union_sum += union
            target_sum += target
            batch_time.update(time.time() - start)
            iou = inter.sum() / (union.sum() + 1e-10)
            acc = inter.sum() / (target.sum() + 1e-10)
            logger.info(
                f"Test: {name} [{idx + 1}/{len(self.test_dataset)}]-{segment.size} "
                f"Batch {batch_time.val:.3f} ({batch_time.avg:.3f}) "
                f"Accuracy {acc:.4f} mIoU {iou:.4f}"
            )

        from ..parallel.collectives import host_allreduce_sum, is_main_process

        inter_sum, union_sum, target_sum = host_allreduce_sum(
            (inter_sum, union_sum, target_sum)
        )
        if self.cfg.get("save_confusion") and is_main_process():
            split = self.cfg.data.test.get("split", "test")
            np.savez(
                os.path.join(save_path, f"confusion_{split}.npz"),
                intersection=inter_sum, union=union_sum, target=target_sum,
            )
        iou_class = inter_sum / np.maximum(union_sum, 1)
        acc_class = inter_sum / np.maximum(target_sum, 1)
        m_iou, m_acc = float(iou_class.mean()), float(acc_class.mean())
        all_acc = float(inter_sum.sum() / np.maximum(target_sum.sum(), 1))
        logger.info(f"Val result: mIoU/mAcc/allAcc {m_iou:.4f}/{m_acc:.4f}/{all_acc:.4f}")
        for c in range(K):
            logger.info(f"Class_{c} Result: iou/accuracy {iou_class[c]:.4f}/{acc_class[c]:.4f}")
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(mIoU=m_iou, mAcc=m_acc, allAcc=all_acc)


@TESTERS.register_module()
class DINOSemSegTester(SemSegTester):
    """SemSegTester variant feeding scene-level DINO side arrays into every
    fragment forward (parity: `engines/test.py:361-604`).

    The scene's ``dino_coord``/``dino_feat`` are padded once to
    ``dino_capacity`` and merged into each fragment batch; the model knn-lifts
    them per point (``DINOEnhancedSegmentor``).
    """

    def __init__(self, cfg, dino_capacity=None, **kwargs):
        self.dino_capacity = dino_capacity or cfg.get("dino_capacity", 65536)
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        sample = super().probe_sample()
        sample.update(self._pad_dino(np.zeros((4, 3), np.float32),
                                     np.zeros((4, self.cfg.model.get("dino_channels", 384)), np.float32)))
        return sample

    def _pad_dino(self, dino_coord, dino_feat):
        m = dino_coord.shape[0]
        cap = self.dino_capacity
        if m > cap:
            # deterministic subsample: results must be reproducible run-to-run
            sel = np.random.default_rng(0).choice(m, cap, replace=False)
            dino_coord, dino_feat = dino_coord[sel], dino_feat[sel]
            m = cap
        valid = np.zeros(cap, bool)
        valid[:m] = True
        return {
            "dino_coord": np.pad(dino_coord, ((0, cap - m), (0, 0))).astype(np.float32),
            "dino_feat": np.pad(dino_feat, ((0, cap - m), (0, 0))).astype(np.float32),
            "dino_valid": valid,
        }

    def scene_batch_extras(self, data_dict):
        return self._pad_dino(data_dict["dino_coord"], data_dict["dino_feat"])


@TESTERS.register_module()
class ClsTester(TesterBase):
    """Object classification tester (`engines/test.py:606-683`)."""

    def __init__(self, cfg, **kwargs):
        self.num_classes = cfg.data.num_classes
        self.slot = cfg.get("slot_size", 4096)
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        frag = {
            "coord": np.zeros((4, 3), np.float32),
            "grid_coord": np.zeros((4, 3), np.int32),
            "feat": np.zeros((4, self.cfg.model.backbone.in_channels), np.float32),
            "category": np.zeros((1,), np.int32),
        }
        return collate([_pad_fragment(frag, self.slot)], self.slot)

    def test(self):
        model = self.model

        @jax.jit
        def forward(variables, batch):
            point = build_point_batch(batch, 1)
            out = model.apply(variables, point, batch, train=False)
            return jnp.argmax(out["cls_logits"], axis=-1)

        correct = total = 0
        for idx in self.scene_indices():
            sample = self.test_dataset[idx]
            batch = collate([_pad_fragment(sample, self.slot)], self.slot)
            pred = int(np.asarray(forward(self.variables, sample_to_device(batch)))[0])
            correct += int(pred == int(sample["category"]))
            total += 1
        from ..parallel.collectives import host_allreduce_sum

        correct, total = host_allreduce_sum(np.array([correct, total], np.int64))
        acc = correct / max(total, 1)
        self.logger.info(f"Test result: allAcc {acc:.4f}")
        return dict(allAcc=acc)


def write_submission(dataset_type: str, save_path: str, name: str, seg_pred: np.ndarray):
    """Per-dataset submission writers (parity: `engines/test.py:225-274`)."""
    make_dirs(save_path)
    if "SemanticKITTI" in dataset_type:
        from ..datasets.semantic_kitti import map_to_raw_labels

        seq, frame = name.split("_", 1)
        out_dir = os.path.join(save_path, "submit", "sequences", seq, "predictions")
        make_dirs(out_dir)
        map_to_raw_labels(seg_pred.astype(np.int32)).tofile(os.path.join(out_dir, f"{frame}.label"))
    elif "ScanNet" in dataset_type:
        out_dir = os.path.join(save_path, "submit")
        make_dirs(out_dir)
        np.savetxt(os.path.join(out_dir, f"{name}.txt"), seg_pred.astype(np.int32), fmt="%d")
    elif "Nuscenes" in dataset_type.lower() or "NuScenes" in dataset_type:
        out_dir = os.path.join(save_path, "submit", "lidarseg")
        make_dirs(out_dir)
        (seg_pred.astype(np.uint8) + 1).tofile(os.path.join(out_dir, f"{name}.bin"))
    else:
        np.save(os.path.join(save_path, f"{name}_submit.npy"), seg_pred)


@TESTERS.register_module()
class ClsVotingTester(TesterBase):
    """Rotated-vote classification tester (parity: `engines/test.py:684-800`):
    averages logits over ``num_repeat`` randomly-rotated evaluations."""

    def __init__(self, cfg, num_repeat=10, **kwargs):
        self.num_repeat = num_repeat
        self.num_classes = cfg.data.num_classes
        self.slot = cfg.get("slot_size", 4096)
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        frag = {
            "coord": np.zeros((4, 3), np.float32),
            "grid_coord": np.zeros((4, 3), np.int32),
            "feat": np.zeros((4, self.cfg.model.backbone.in_channels), np.float32),
            "category": np.zeros((1,), np.int32),
        }
        return collate([_pad_fragment(frag, self.slot)], self.slot)

    def test(self):
        import jax

        model = self.model

        @jax.jit
        def forward(variables, batch):
            point = build_point_batch(batch, 1)
            out = model.apply(variables, point, batch, train=False)
            return jax.nn.softmax(out["cls_logits"], axis=-1)

        correct = total = 0
        for idx in self.scene_indices():
            probs = None
            for r in range(self.num_repeat):
                sample = self.test_dataset[idx]  # transforms re-randomize per call
                batch = collate([_pad_fragment(sample, self.slot)], self.slot)
                p = np.asarray(forward(self.variables, sample_to_device(batch)))[0]
                probs = p if probs is None else probs + p
            pred = int(np.argmax(probs))
            correct += int(pred == int(np.asarray(sample["category"]).reshape(-1)[0]))
            total += 1
            if (idx + 1) % 50 == 0:
                self.logger.info(f"Vote test [{idx + 1}/{len(self.test_dataset)}] acc={correct / total:.4f}")
        from ..parallel.collectives import host_allreduce_sum

        correct, total = host_allreduce_sum(np.array([correct, total], np.int64))
        acc = correct / max(total, 1)
        self.logger.info(f"Test result: allAcc {acc:.4f} ({self.num_repeat} votes)")
        return dict(allAcc=acc)


@TESTERS.register_module()
class PartSegTester(TesterBase):
    """ShapeNetPart tester (parity: `engines/test.py:801-895`): per-category
    part-IoU averaged over instances and categories."""

    def __init__(self, cfg, **kwargs):
        self.num_classes = cfg.data.num_classes
        self.slot = cfg.get("slot_size", 4096)
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        frag = {
            "coord": np.zeros((4, 3), np.float32),
            "grid_coord": np.zeros((4, 3), np.int32),
            "feat": np.zeros((4, self.cfg.model.backbone.in_channels), np.float32),
            "segment": np.zeros((4,), np.int32),
        }
        return collate([_pad_fragment(frag, self.slot)], self.slot)

    def test(self):
        model = self.model

        @jax.jit
        def forward(variables, batch):
            point = build_point_batch(batch, 1)
            out = model.apply(variables, point, batch, train=False)
            return jnp.argmax(out["seg_logits"], axis=-1)

        ious = []
        for idx in self.scene_indices():
            sample = self.test_dataset[idx]
            n = sample["coord"].shape[0]
            batch = collate([_pad_fragment(sample, self.slot)], self.slot)
            pred = np.asarray(forward(self.variables, sample_to_device(batch)))[:n]
            gt = np.asarray(sample["segment"])[:n]
            parts = np.unique(gt)
            part_ious = []
            for p in parts:
                inter = np.logical_and(pred == p, gt == p).sum()
                union = np.logical_or(pred == p, gt == p).sum()
                part_ious.append(inter / max(union, 1))
            ious.append(float(np.mean(part_ious)))
        from ..parallel.collectives import host_allreduce_sum

        iou_sum, iou_cnt = host_allreduce_sum(
            np.array([float(np.sum(ious)), float(len(ious))])
        )
        miou = float(iou_sum / iou_cnt) if iou_cnt else 0.0
        self.logger.info(f"Test result: instance-avg part mIoU {miou:.4f}")
        return dict(mIoU=miou)


@TESTERS.register_module()
class InsSegTester(TesterBase):
    """Instance segmentation tester (parity: `engines/test.py:896-1324`).

    Whole-scene (voxelized) inference at a fixed padded capacity: one jitted
    forward -> semantic probs + center-shift vectors; host-side clustering of
    the shifted coordinates into proposals with mean-confidence scores
    (models/point_group.py); optional 1-nn mapping of the proposal masks back
    to the raw-resolution points when the pipeline kept ``origin_coord``
    (reference knn map-to-origin, `test.py:938-948`); ScanNet-devkit AP over
    all scenes.  Multi-process: scenes are sharded over processes and the
    per-scene association structures re-joined with the object all-gather
    (the reference's gloo ``comm.gather``, `test.py:976-983`).
    """

    def __init__(
        self,
        cfg,
        segment_ignore_index=(-1, 0, 1),
        instance_ignore_index=-1,
        cluster_thresh=0.05,
        cluster_min_points=50,
        cluster_propose_points=100,
        capacity=None,
        **kwargs,
    ):
        self.num_classes = cfg.data.num_classes
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.cluster_thresh = cluster_thresh
        self.cluster_min_points = cluster_min_points
        self.cluster_propose_points = cluster_propose_points
        self.capacity = capacity or cfg.get("slot_size", 131072)
        self._forward = None
        super().__init__(cfg, **kwargs)

    def probe_sample(self):
        backbone = self.cfg.model.get("backbone") or {}
        frag = {
            "coord": np.zeros((4, 3), np.float32),
            "grid_coord": np.zeros((4, 3), np.int32),
            "feat": np.zeros((4, backbone.get("in_channels", 3)), np.float32),
        }
        return collate([_pad_fragment(frag, self.capacity)], self.capacity)

    def _build_forward(self):
        model = self.model

        def forward(variables, batch):
            point = build_point_batch(batch, 1)
            out = model.apply(variables, point, batch, train=False)
            probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, -1).astype(jnp.int32), out["bias_pred"], probs

        self._forward = jax.jit(forward)

    def test(self):
        from ..models.point_group import cluster_proposals, proposals_from_labels
        from ..ops.knn import knn
        from .hooks.insseg_evaluator import (
            associate_instances,
            evaluate_matches,
            summarize_ap,
        )
        from ..parallel.collectives import host_allgather_objects

        logger = self.logger
        logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
        if self._forward is None:
            self._build_forward()
        batch_time = AverageMeter()
        scenes = []
        for idx in self.scene_indices():
            start = time.time()
            data_dict = dict(self.test_dataset[idx])
            name = data_dict.pop("name", f"scene{idx}")
            segment = np.asarray(data_dict["segment"]).reshape(-1)
            instance = np.asarray(data_dict["instance"]).reshape(-1)
            n = data_dict["coord"].shape[0]
            if n > self.capacity:
                logger.warning(f"{name}: {n} pts > capacity {self.capacity}; truncating")
                for k, v in list(data_dict.items()):
                    if isinstance(v, np.ndarray) and v.shape[:1] == (n,):
                        data_dict[k] = v[: self.capacity]
                segment, instance = segment[: self.capacity], instance[: self.capacity]
                n = self.capacity
            batch = collate([_pad_fragment(dict(data_dict), self.capacity)], self.capacity)
            seg_pred, bias_pred, probs = self._forward(self.variables, sample_to_device(batch))
            valid = np.asarray(batch["valid"]).reshape(-1)
            coord = jnp.asarray(batch["coord"])
            labels = cluster_proposals(
                coord, seg_pred, bias_pred, jnp.asarray(valid),
                cluster_thresh=self.cluster_thresh,
                segment_ignore_index=self.segment_ignore_index,
                min_points=self.cluster_min_points,
            )
            masks, classes, scores = proposals_from_labels(
                labels, np.asarray(seg_pred), np.asarray(probs),
                propose_points=self.cluster_propose_points,
            )
            masks = masks[:, valid] if len(masks) else masks

            if "origin_coord" in data_dict:
                # 1-nn map-to-origin of the proposal masks (`test.py:938-948`)
                origin = np.asarray(data_dict["origin_coord"], np.float32)
                reverse, _ = knn(
                    jnp.asarray(origin), coord, 1,
                    base_valid=jnp.asarray(valid),
                )
                reverse = np.asarray(reverse).reshape(-1)
                # masks are over valid rows; re-index via the dense->valid map
                dense_to_valid = np.cumsum(valid) - 1
                masks = masks[:, dense_to_valid[reverse]] if len(masks) else masks
                segment = np.asarray(data_dict["origin_segment"]).reshape(-1)
                instance = np.asarray(data_dict["origin_instance"]).reshape(-1)

            gt, pr = associate_instances(
                classes, scores, masks, segment, instance,
                self.num_classes, self.segment_ignore_index, self.instance_ignore_index,
            )
            scenes.append(dict(gt=gt, pr=pr))
            batch_time.update(time.time() - start)
            logger.info(
                f"Test: {name} [{idx + 1}/{len(self.test_dataset)}] "
                f"proposals {len(masks)} Batch {batch_time.val:.3f} ({batch_time.avg:.3f})"
            )

        all_scenes = [s for part in host_allgather_objects(scenes) for s in part]
        class_ids = [c for c in range(self.num_classes) if c not in self.segment_ignore_index]
        ap = evaluate_matches(all_scenes, class_ids)
        all_ap, ap50, ap25 = summarize_ap(ap)
        logger.info(f"Val result: mAP/AP50/AP25 {all_ap:.4f}/{ap50:.4f}/{ap25:.4f}")
        names = self.cfg.data.get("names")
        for i, c in enumerate(class_ids):
            label = names[c] if names else f"class_{c}"
            with np.errstate(invalid="ignore"):
                row = ap[i]
                main = ~np.isclose(np.append(np.arange(0.5, 0.95, 0.05), 0.25), 0.25)
            logger.info(
                f"Class_{c}-{label} Result: AP/AP50/AP25 "
                f"{np.nanmean(row[main]):.4f}/{row[0]:.4f}/{row[-1]:.4f}"
            )
        logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")
        return dict(mAP=all_ap, AP50=ap50, AP25=ap25)
