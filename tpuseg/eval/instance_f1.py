"""Instance-level evaluation (SURVEY.md C14, NORTH-STAR "instance F1").

Matches predicted to ground-truth instances either by IoU (optimal one-to-one
assignment via scipy's Hungarian solver on the contingency table) or by the
center-hit criterion (predicted instance contains the GT center), and reports
precision / recall / F1 plus the mean IoU of matched pairs.

Host-side numpy: evaluation is offline and the contingency construction is a
single np.unique over voxel pairs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy.optimize import linear_sum_assignment


def _contingency(pred: np.ndarray, gt: np.ndarray):
    """Areas and intersection table between the two labelings.

    Returns (pred_ids, gt_ids, inter) where inter[i, j] = |pred_i ∩ gt_j|.
    """
    pred = pred.ravel()
    gt = gt.ravel()
    pred_ids, pred_inv = np.unique(pred, return_inverse=True)
    gt_ids, gt_inv = np.unique(gt, return_inverse=True)
    table = np.zeros((len(pred_ids), len(gt_ids)), np.int64)
    np.add.at(table, (pred_inv, gt_inv), 1)
    return pred_ids, gt_ids, table


def voxel_metrics(pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    """Voxel-level foreground agreement between two labelings: Dice / IoU of
    the binarized masks plus the voxel accuracy — the segmentation-quality
    complement to the instance-level F1 (papers in this family report both)."""
    p = np.asarray(pred) > 0
    g = np.asarray(gt) > 0
    inter = float(np.logical_and(p, g).sum())
    ps, gs = float(p.sum()), float(g.sum())
    union = ps + gs - inter
    return {
        "voxel_dice": 2 * inter / (ps + gs) if ps + gs else 1.0,
        "voxel_iou": inter / union if union else 1.0,
        "voxel_accuracy": float((p == g).mean()),
    }


def instance_metrics(
    pred: np.ndarray,
    gt: np.ndarray,
    iou_threshold: float = 0.5,
    criterion: str = "iou",
) -> Dict[str, float]:
    """criterion: "iou" (Hungarian on IoU >= threshold) or "center"
    (predicted instance containing the GT instance's centroid)."""
    pred = np.asarray(pred)
    gt = np.asarray(gt)
    pred_ids, gt_ids, inter = _contingency(pred, gt)

    p_mask = pred_ids > 0
    g_mask = gt_ids > 0
    p_areas = inter.sum(axis=1)[p_mask].astype(np.float64)
    g_areas = inter.sum(axis=0)[g_mask].astype(np.float64)
    inter_fg = inter[np.ix_(p_mask, g_mask)].astype(np.float64)

    n_pred, n_gt = int(p_mask.sum()), int(g_mask.sum())
    if n_pred == 0 or n_gt == 0:
        tp = 0
        mean_iou = 0.0
    elif criterion == "iou":
        union = p_areas[:, None] + g_areas[None, :] - inter_fg
        iou = np.where(union > 0, inter_fg / union, 0.0)
        rows, cols = linear_sum_assignment(-iou)
        matched = iou[rows, cols] >= iou_threshold
        tp = int(matched.sum())
        mean_iou = float(iou[rows, cols][matched].mean()) if tp else 0.0
    elif criterion == "center":
        # one-pass centroids: accumulate per-instance coordinate sums with
        # np.add.at instead of a full-volume argwhere per GT instance
        flat = gt.ravel()
        _, inv = np.unique(flat, return_inverse=True)  # inv indexes gt_ids
        lin = np.arange(flat.size, dtype=np.int64)
        hw = gt.shape[1] * gt.shape[2]
        k = len(gt_ids)
        counts = np.bincount(inv, minlength=k).astype(np.int64)
        sums = np.stack([
            np.bincount(inv, weights=lin // hw, minlength=k),
            np.bincount(inv, weights=(lin % hw) // gt.shape[2], minlength=k),
            np.bincount(inv, weights=lin % gt.shape[2], minlength=k),
        ], axis=-1)
        hits = set()
        used_pred = set()
        for j, gid in enumerate(gt_ids):
            if gid <= 0:
                continue
            cz, cy, cx = np.round(sums[j] / counts[j]).astype(int)
            pid = pred[cz, cy, cx]
            if pid > 0 and pid not in used_pred:
                hits.add(gid)
                used_pred.add(pid)
        tp = len(hits)
        mean_iou = float("nan")
    else:
        raise ValueError(f"unknown criterion {criterion!r}")

    fp = n_pred - tp
    fn = n_gt - tp
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pred": n_pred,
        "n_gt": n_gt,
        "mean_matched_iou": mean_iou,
    }


def center_match_f1(labels, centers, n_pred: int | None = None) -> Dict[str, float]:
    """Center-criterion instance F1 against known GT centers, using only
    POINT READS of ``labels`` — works on GVoxel-scale memmaps where the dense
    (P x G) contingency of :func:`instance_metrics` cannot (VERDICT r2 #4 /
    weak #7).

    A GT instance scores a hit when the predicted instance containing its
    (rounded) center has not already been claimed by another GT center.
    ``n_pred`` defaults to a streamed max over z-slabs of ``labels``.
    """
    centers = np.asarray(centers)
    if n_pred is None:
        n_pred = 0
        for z0 in range(0, labels.shape[0], 64):
            n_pred = max(n_pred, int(np.max(labels[z0:z0 + 64])))
    used = set()
    tp = 0
    for c in np.round(centers).astype(int):
        c = np.clip(c, 0, np.asarray(labels.shape) - 1)
        pid = int(labels[c[0], c[1], c[2]])
        if pid > 0 and pid not in used:
            used.add(pid)
            tp += 1
    n_gt = len(centers)
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gt if n_gt else 0.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "n_pred": n_pred, "n_gt": n_gt}
