"""Eval metrics vs hand-computed values."""

import numpy as np

from haff_tpu.eval.metrics import (
    hausdorff,
    iocm,
    iou,
    threshold_sweep,
    union_metrics,
)


def _sq(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


def test_iou_iocm_exact():
    a = _sq(20, 20, 0, 10, 0, 10)   # 100 px
    b = _sq(20, 20, 5, 15, 0, 10)   # 100 px, overlap 50
    assert abs(iou(a, b) - 50 / 150) < 1e-4
    assert abs(iocm(a, b) - 0.5) < 1e-4
    # empty union = failed prediction (reference calculate_iou.py:40)
    assert iou(np.zeros((5, 5)), np.zeros((5, 5))) == 0.0
    assert iocm(np.zeros((5, 5)), _sq(5, 5, 0, 2, 0, 2)) == 0.0


def test_hausdorff_translation():
    a = _sq(40, 40, 10, 20, 10, 20)
    b = _sq(40, 40, 10, 20, 15, 25)  # shifted 5 px right
    d, s = hausdorff(a, b)
    assert abs(d - 5.0) < 1e-6
    assert abs(s - 5.0) < 1e-6


def test_union_metrics_combines_hands():
    left = _sq(20, 20, 0, 5, 0, 5)
    right = _sq(20, 20, 10, 15, 10, 15)
    gt_union_match = union_metrics(left, right, left, right)
    assert abs(gt_union_match["iou"] - 1.0) < 1e-6


def test_threshold_sweep_monotone_area():
    rng = np.random.RandomState(0)
    logits = rng.randn(20, 20) * 2
    gt = (logits > 0.5).astype(np.uint8)
    out = threshold_sweep(logits, np.full_like(logits, -10), gt,
                          np.zeros_like(gt))
    assert set(out["per_threshold"]) == {0.1, 0.2, 0.3, 0.5, 0.7}
    # reference sweep summary: mean precision, best by IoCM
    assert 0.0 <= out["map_precision"] <= 1.0
    assert out["best_iocm"] >= out["map_precision"] - 1e-9
    assert out["best_threshold"] in out["per_threshold"]


def test_hausdorff_empty_sides_reference_semantics():
    """Empty prediction -> diagonal penalty; empty GT -> (0, 0)
    (reference calculate_iou.py:13-17)."""
    gt = _sq(30, 40, 5, 10, 5, 10)
    empty = np.zeros((30, 40), np.uint8)
    d, s = hausdorff(empty, gt)
    diag = np.sqrt(30 ** 2 + 40 ** 2)
    assert abs(d - diag) < 1e-6 and abs(s - diag) < 1e-6
    d, s = hausdorff(gt, empty)
    assert d == 0.0 and s == 0.0


def test_hausdorff_first_external_contour_only():
    """Two disjoint GT blobs: the reference measures against only the
    FIRST external contour."""
    gt = _sq(60, 60, 2, 6, 2, 6) | _sq(60, 60, 50, 54, 50, 54)
    pred = _sq(60, 60, 50, 54, 50, 54)  # matches one blob exactly
    d, s = hausdorff(pred, gt)
    # cv2 returns contours bottom-up: first contour = the (50..54) blob,
    # which pred matches -> directed pred->gt distance 0
    assert d == 0.0
