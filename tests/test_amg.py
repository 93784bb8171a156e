"""Automatic mask generator: grid/RLE/NMS primitives + end-to-end over a
synthetic decoder."""

import numpy as np

from haff_tpu.eval.annotations import rle_to_mask
from haff_tpu.infer.amg import (
    AutomaticMaskGenerator,
    box_iou,
    build_point_grid,
    mask_to_box,
    mask_to_rle,
    nms,
    stability_score,
)


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() > 0 and g.max() < 1
    np.testing.assert_allclose(g[0], [0.125, 0.125])


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    m = (rng.rand(13, 17) > 0.5)
    back = rle_to_mask(mask_to_rle(m))
    np.testing.assert_array_equal(back.astype(bool), m)


def test_box_and_nms():
    a = dict(_bbox_xyxy=[0, 0, 10, 10], bbox=[0, 0, 10, 10],
             predicted_iou=0.9)
    b = dict(_bbox_xyxy=[1, 1, 11, 11], bbox=[1, 1, 10, 10],
             predicted_iou=0.8)  # heavy overlap
    c = dict(_bbox_xyxy=[20, 20, 30, 30], bbox=[20, 20, 10, 10],
             predicted_iou=0.7)
    kept = nms([a, b, c], iou_thresh=0.5)
    assert len(kept) == 2
    assert kept[0]["predicted_iou"] == 0.9
    assert box_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
    # public record bbox is XYWH (reference box_xyxy_to_xywh); the
    # internal NMS key is dropped from the output
    assert all("_bbox_xyxy" not in r for r in kept)


def test_bbox_is_xywh():
    from haff_tpu.infer.amg import box_xyxy_to_xywh, mask_to_box

    m = np.zeros((20, 20), bool)
    m[3:8, 5:15] = True       # rows 3..7, cols 5..14
    box = mask_to_box(m)
    assert box == [5, 3, 14, 7]                 # inclusive XYXY
    assert box_xyxy_to_xywh(box) == [5, 3, 9, 4]  # reference XYWH


def test_generate_end_to_end_synthetic():
    """Synthetic decoder: each point produces a disc around itself."""
    H = W = 64

    def decode_batch(points):
        n = len(points)
        yy, xx = np.mgrid[:H, :W]
        logits = np.zeros((n, 1, H, W), np.float32)
        for i, (px, py) in enumerate(points):
            dist = np.sqrt((xx - px) ** 2 + (yy - py) ** 2)
            logits[i, 0] = 5.0 - dist / 2.0  # disc radius ~10
        ious = np.full((n, 1), 0.95, np.float32)
        return logits, ious

    amg = AutomaticMaskGenerator(decode_batch, points_per_side=4,
                                 pred_iou_thresh=0.9,
                                 stability_thresh=0.5,
                                 box_nms_thresh=0.5, batch=8)
    records = amg.generate((H, W))
    assert records, "no masks survived"
    r = records[0]
    mask = rle_to_mask(r["segmentation"])
    assert mask.sum() == r["area"]
    x0, y0, x1, y1 = r["bbox"]
    assert x1 > x0 and y1 > y0
    assert 0.5 < stability_score(np.full((8, 8), 3.0)) <= 1.0


def test_from_predictor_uses_real_logits():
    """Regression: binarized masks fed as 'logits' made stability_score
    always 0 and AMG returned zero masks. With real logits the stability
    score of a confident synthetic prediction is near 1."""
    from haff_tpu.infer.amg import stability_score

    yy, xx = np.mgrid[:32, :32]
    logits = 5.0 - np.sqrt((xx - 16.0) ** 2 + (yy - 16.0) ** 2) / 2.0
    assert stability_score(logits) > 0.4  # (8/12)^2 disc ratio
    binary_pm1 = (logits > 0).astype(np.float32) * 2 - 1
    assert stability_score(binary_pm1) == 0.0  # the old failure mode
