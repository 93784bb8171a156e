"""Annotation extraction: polygon fill, RLE decode, TORAS/COCO export."""

import json
import os

import numpy as np

from haff_tpu.eval.annotations import (
    extract_coco_masks,
    extract_toras_masks,
    polygons_to_mask,
    rle_to_mask,
)


def test_polygons_to_mask_square():
    m = polygons_to_mask([[4, 4, 20, 4, 20, 20, 4, 20]], (32, 32))
    assert m[10, 10] == 1 and m[0, 0] == 0
    assert abs(int(m.sum()) - 17 * 17) <= 40


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(7, 9) > 0.6).astype(np.uint8)
    # build column-major RLE
    flat = mask.T.reshape(-1)
    counts = []
    val = 0
    run = 0
    for x in flat:
        if x == val:
            run += 1
        else:
            counts.append(run)
            val = x
            run = 1
    counts.append(run)
    back = rle_to_mask({"counts": counts, "size": [7, 9]})
    np.testing.assert_array_equal(back, mask)


def test_extract_toras(tmp_path):
    ann = [{"image": "123", "vid": "P01_01", "size": [40, 50],
            "polygons": {"left": [[5, 5, 15, 5, 15, 15, 5, 15]],
                         "right": []}}]
    p = tmp_path / "toras.json"
    p.write_text(json.dumps(ann))
    n = extract_toras_masks(str(p), str(tmp_path / "bench"))
    assert n == 1
    out = tmp_path / "bench" / "P01_01" / "0000123" / "aff_left.png"
    assert out.exists()
    import cv2

    m = cv2.imread(str(out), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (40, 50) and m[10, 10] == 255


def test_extract_coco(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "0000007.png", "height": 30,
                    "width": 30, "video": "P02_02"}],
        "categories": [{"id": 1, "name": "hand_left"},
                       {"id": 2, "name": "hand_right"}],
        "annotations": [
            {"image_id": 1, "category_id": 2,
             "segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]]},
        ],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    n = extract_coco_masks(str(p), str(tmp_path / "bench"))
    assert n == 1
    out = tmp_path / "bench" / "P02_02" / "0000007" / "aff_right.png"
    assert out.exists()
