"""Instance segmentation evaluator (ScanNet-style AP).

Parity surface: `pointcept/engines/hooks/evaluator.py:246-644`
(``InsSegEvaluator``): per-scene association of predicted masks to GT
instances by intersection, then AP over IoU overlaps 0.5:0.05:0.95 (mAP) plus
AP50/AP25, with min-region-size filtering and void-region forgiveness
(points in ignored segments don't count against a prediction).  Host numpy —
the reference also evaluates on CPU-side arrays.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ...utils.logger import get_root_logger
from .builder import HOOKS
from .default import HookBase

OVERLAPS = np.append(np.arange(0.5, 0.95, 0.05), 0.25)
MIN_REGION_SIZE = 100


def associate_instances(
    pred_classes: np.ndarray,  # int[P]
    pred_scores: np.ndarray,  # float[P]
    pred_masks: np.ndarray,  # bool[P, N]
    segment: np.ndarray,  # int[N]
    instance: np.ndarray,  # int[N]
    num_classes: int,
    segment_ignore_index: Sequence[int] = (-1,),
    instance_ignore_index: int = -1,
):
    """Build the per-scene gt/pred association structure."""
    void_mask = np.isin(segment, segment_ignore_index)
    gt: Dict[int, List[dict]] = {c: [] for c in range(num_classes) if c not in segment_ignore_index}
    pr: Dict[int, List[dict]] = {c: [] for c in gt}

    ids, idx, counts = np.unique(instance, return_index=True, return_counts=True)
    seg_of = segment[idx]
    for i in range(len(ids)):
        if ids[i] == instance_ignore_index or seg_of[i] in segment_ignore_index:
            continue
        if seg_of[i] not in gt:
            continue
        gt[seg_of[i]].append(
            dict(instance_id=ids[i], vert_count=counts[i], matched_pred=[])
        )

    for p in range(len(pred_classes)):
        c = int(pred_classes[p])
        if c in segment_ignore_index or c not in pr:
            continue
        mask = pred_masks[p] != 0
        vert = int(mask.sum())
        if vert < MIN_REGION_SIZE:
            continue
        inst = dict(
            confidence=float(pred_scores[p]),
            vert_count=vert,
            void_intersection=int(np.logical_and(void_mask, mask).sum()),
            matched_gt=[],
        )
        for g in gt[c]:
            inter = int(np.logical_and(instance == g["instance_id"], mask).sum())
            if inter > 0:
                inst["matched_gt"].append(dict(g, intersection=inter))
                g["matched_pred"].append(dict(inst, intersection=inter))
        pr[c].append(inst)
    return gt, pr


def evaluate_matches(scenes: List[dict], class_ids: Sequence[int]):
    """AP per (class, overlap) over the scene association structures."""
    ap = np.zeros((len(class_ids), len(OVERLAPS)))
    for oi, overlap in enumerate(OVERLAPS):
        for ci, c in enumerate(class_ids):
            y_true, y_score = [], []
            hard_false_negatives = 0
            has_gt = has_pred = False
            for scene in scenes:
                gts = scene["gt"].get(c, [])
                preds = scene["pr"].get(c, [])
                has_gt |= len(gts) > 0
                has_pred |= len(preds) > 0
                cur_true = np.ones(len(gts))
                cur_score = np.full(len(gts), -np.inf)
                cur_match = np.zeros(len(gts), bool)
                taken = set()
                for gi, g in enumerate(gts):
                    found = False
                    for m in g["matched_pred"]:
                        iou = m["intersection"] / (
                            g["vert_count"] + m["vert_count"] - m["intersection"]
                        )
                        if iou > overlap:
                            conf = m["confidence"]
                            if cur_match[gi]:
                                # keep highest-confidence match; demote the other
                                if conf > cur_score[gi]:
                                    y_true.append(0)
                                    y_score.append(cur_score[gi])
                                    cur_score[gi] = conf
                                else:
                                    y_true.append(0)
                                    y_score.append(conf)
                            else:
                                found = True
                                cur_match[gi] = True
                                cur_score[gi] = conf
                    if not found:
                        hard_false_negatives += 1
                for gi in range(len(gts)):
                    if cur_match[gi]:
                        y_true.append(1)
                        y_score.append(cur_score[gi])
                # unmatched predictions -> false positives (void-forgiven)
                for m in preds:
                    matched = any(
                        m2["intersection"]
                        / (m2["vert_count"] + m["vert_count"] - m2["intersection"])
                        > overlap
                        for m2 in m["matched_gt"]
                    )
                    if not matched:
                        non_void = m["vert_count"] - m["void_intersection"]
                        # points on smaller-overlap gt of same class also forgiven
                        for m2 in m["matched_gt"]:
                            non_void -= m2["intersection"]
                        if non_void / max(m["vert_count"], 1) > overlap:
                            y_true.append(0)
                            y_score.append(m["confidence"])
            if not has_gt:
                ap[ci, oi] = np.nan
                continue
            if not y_score:
                ap[ci, oi] = 0.0
                continue
            order = np.argsort(-np.asarray(y_score))
            y = np.asarray(y_true)[order]
            tp = np.cumsum(y)
            fp = np.cumsum(1 - y)
            total_gt = tp[-1] + hard_false_negatives if len(tp) else hard_false_negatives
            precision = tp / np.maximum(tp + fp, 1)
            recall = tp / max(total_gt, 1)
            # standard AP: integrate precision over recall
            prec = np.concatenate([[1.0], precision, [0.0]])
            rec = np.concatenate([[0.0], recall, [recall[-1] if len(recall) else 0.0]])
            for i in range(len(prec) - 2, -1, -1):
                prec[i] = max(prec[i], prec[i + 1])
            ap[ci, oi] = np.sum((rec[1:] - rec[:-1]) * prec[1:])
    return ap


def summarize_ap(ap: np.ndarray):
    with np.errstate(invalid="ignore"):
        o50 = np.where(np.isclose(OVERLAPS, 0.5))[0][0]
        o25 = np.where(np.isclose(OVERLAPS, 0.25))[0][0]
        main = ~np.isclose(OVERLAPS, 0.25)
        all_ap = np.nanmean(ap[:, main])
        ap50 = np.nanmean(ap[:, o50])
        ap25 = np.nanmean(ap[:, o25])
    return float(all_ap), float(ap50), float(ap25)


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1,
                 cluster_thresh=0.05, min_points=100):
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.cluster_thresh = cluster_thresh
        self.min_points = min_points
        self._eval_step = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        from ..common import build_point_batch

        model = self.trainer.model

        def eval_step(state, batch, num_samples: int):
            point = build_point_batch(batch, num_samples)
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, point, batch, train=False
            )
            probs = jax.nn.softmax(out["seg_logits"].astype(jnp.float32), -1)
            return jnp.argmax(probs, -1).astype(jnp.int32), out["bias_pred"], probs

        self._eval_step = jax.jit(eval_step, static_argnums=(2,))

    def after_epoch(self):
        if self.trainer.val_loader is None:
            return
        if self._eval_step is None:
            self._build()
        import jax.numpy as jnp

        from ...models.point_group import cluster_proposals
        from ...parallel.mesh import shard_batch

        trainer = self.trainer
        logger = get_root_logger()
        num_classes = trainer.cfg.data.num_classes
        scenes = []
        for batch_np in trainer.val_loader:
            ns = batch_np["num_samples"]
            batch = shard_batch(batch_np, trainer.mesh)
            batch.pop("num_samples", None)
            seg_pred, bias_pred, seg_probs = self._eval_step(trainer.state, batch, ns)
            from ..common import build_point_batch
            from ...models.point_group import proposals_from_labels

            point = build_point_batch(batch, ns)
            labels = cluster_proposals(
                point.coord, seg_pred, bias_pred, point.valid, point.batch,
                self.cluster_thresh, self.segment_ignore_index, self.min_points,
            )
            valid = np.asarray(batch_np["valid"])
            seg_pred = np.asarray(seg_pred)
            # proposal masks + mean-confidence scores
            # (`point_group_v1m1_base.py:150-176`)
            masks, classes, scores = proposals_from_labels(labels, seg_pred, np.asarray(seg_probs))
            uniq = np.arange(len(masks))
            gt, pr = associate_instances(
                classes, scores, masks[:, valid] if len(uniq) else masks,
                np.asarray(batch_np["segment"])[valid],
                np.asarray(batch_np["instance"])[valid],
                num_classes, self.segment_ignore_index, self.instance_ignore_index,
            )
            scenes.append(dict(gt=gt, pr=pr))

        class_ids = [c for c in range(num_classes) if c not in self.segment_ignore_index]
        ap = evaluate_matches(scenes, class_ids)
        all_ap, ap50, ap25 = summarize_ap(ap)
        logger.info(f"Val result: mAP/AP50/AP25 {all_ap:.4f}/{ap50:.4f}/{ap25:.4f}")
        trainer.storage.put_scalar("val/mAP", all_ap)
        trainer.comm_info["current_metric_value"] = all_ap
        trainer.comm_info["current_metric_name"] = "mAP"
