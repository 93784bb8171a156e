"""Benchmark metrics: IoU, IoCM (precision), Hausdorff, threshold mAP.

Capability parity with reference ActAffordance/scripts/evaluation/
calculate_iou.py:9-114 and 2Haff/train_ds.py:761-813. All metrics operate
on the left|right UNION of binary masks, like the reference evaluator.

Batched jittable variants (suffix `_batch`) run on-device for the
training-time validation loop; the host versions mirror the reference's
numpy/cv2 semantics for the offline benchmark protocol.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def iou(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-6) -> float:
    """Binary mask IoU (reference calculate_iou.py:26-41)."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    if union == 0:
        return 1.0 if inter == 0 else 0.0
    return float(inter / (union + eps))


def iocm(pred: np.ndarray, gt: np.ndarray, eps: float = 1e-6) -> float:
    """Intersection over Comparison (= predicted) Mask — the reference's
    'Precision' (calculate_iou.py:96-114)."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    inter = np.logical_and(pred, gt).sum()
    area = pred.sum()
    if area == 0:
        return 0.0
    return float(inter / (area + eps))


def _contour_points(mask: np.ndarray) -> Optional[np.ndarray]:
    import cv2

    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_LIST,
                                   cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    return np.concatenate([c.reshape(-1, 2) for c in contours], axis=0)


def directed_hausdorff(a: np.ndarray, b: np.ndarray) -> float:
    """max over points of a of distance to nearest point of b."""
    from scipy.spatial import cKDTree

    tree = cKDTree(b)
    d, _ = tree.query(a, k=1)
    return float(np.max(d))


def hausdorff(pred: np.ndarray, gt: np.ndarray) -> Tuple[float, float]:
    """(directed pred->gt, symmetric) contour Hausdorff (reference
    calculate_iou.py:9-24). Returns (nan, nan) when a side is empty."""
    pa = _contour_points(pred)
    pb = _contour_points(gt)
    if pa is None or pb is None:
        return float("nan"), float("nan")
    d_pg = directed_hausdorff(pa, pb)
    d_gp = directed_hausdorff(pb, pa)
    return d_pg, max(d_pg, d_gp)


def union_metrics(pred_left, pred_right, gt_left, gt_right):
    """Metrics on the left|right unions (reference
    calculate_iou.py:237-270)."""
    pred = np.logical_or(pred_left.astype(bool), pred_right.astype(bool))
    gt = np.logical_or(gt_left.astype(bool), gt_right.astype(bool))
    d, s = hausdorff(pred, gt)
    return dict(iou=iou(pred, gt), iocm=iocm(pred, gt), hausdorff=d,
                hausdorff_sym=s)


def threshold_sweep(pred_logits_left, pred_logits_right, gt_left, gt_right,
                    thresholds: Sequence[float] = (0.1, 0.2, 0.3, 0.5, 0.7)):
    """Per-threshold metrics over sigmoid probabilities + mAP summary
    (reference inference.py:197 sweep + calculate_iou.py:312-334)."""
    probs_l = 1.0 / (1.0 + np.exp(-pred_logits_left.astype(np.float64)))
    probs_r = 1.0 / (1.0 + np.exp(-pred_logits_right.astype(np.float64)))
    per = {}
    for th in thresholds:
        per[th] = union_metrics(probs_l > th, probs_r > th, gt_left,
                                gt_right)
    best = max(per.values(), key=lambda m: m["iou"])
    return dict(per_threshold=per,
                map_iou=float(np.mean([m["iou"] for m in per.values()])),
                best_iou=best["iou"])


# --------------------------- jittable batched ----------------------------

def iou_batch(pred, gt, eps: float = 1e-6):
    """pred/gt: (B, H, W) binary (jnp). Returns (B,) IoU."""
    import jax.numpy as jnp

    p = pred.astype(bool)
    g = gt.astype(bool)
    inter = jnp.sum(p & g, axis=(1, 2))
    union = jnp.sum(p | g, axis=(1, 2))
    return jnp.where(union == 0, 1.0, inter / (union + eps))


def iocm_batch(pred, gt, eps: float = 1e-6):
    import jax.numpy as jnp

    p = pred.astype(bool)
    g = gt.astype(bool)
    inter = jnp.sum(p & g, axis=(1, 2))
    area = jnp.sum(p, axis=(1, 2))
    return jnp.where(area == 0, 0.0, inter / (area + eps))
