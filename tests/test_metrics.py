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
    assert iou(np.zeros((5, 5)), np.zeros((5, 5))) == 1.0
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
    assert 0.0 <= out["map_iou"] <= 1.0
    assert out["best_iou"] >= out["map_iou"] - 1e-9
