"""Semantic/referring segmentation corpora over synthetic layouts."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def semseg_dir(tmp_path):
    import cv2

    (tmp_path / "images").mkdir()
    (tmp_path / "annotations").mkdir()
    img = (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), img)
    ann = np.zeros((40, 60), np.uint8)
    ann[5:20, 5:30] = 1   # class "pan"
    ann[25:35, 40:55] = 2  # class "cup"
    cv2.imwrite(str(tmp_path / "annotations" / "a.png"), ann)
    return str(tmp_path)


def test_sem_seg_dataset(semseg_dir):
    from haff_tpu.data.seg_datasets import SemSegDataset

    ds = SemSegDataset(semseg_dir, classes=["background", "pan", "cup"])
    assert len(ds) == 1
    s = ds.get(0, class_id=2)
    assert "cup" in s.question and s.answer == "It is [SEG]."
    assert s.mask_left[30, 45] == 1 and s.mask_left[10, 10] == 0


@pytest.fixture
def refer_dir(tmp_path):
    import cv2

    img = (np.random.RandomState(1).rand(30, 50, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "img1.jpg"), img)
    instances = {
        "images": [{"id": 10, "file_name": "img1.jpg", "height": 30,
                    "width": 50}],
        "annotations": [{"id": 100, "image_id": 10,
                         "segmentation": [[5, 5, 20, 5, 20, 20, 5, 20]]}],
        "categories": [],
    }
    refs = [{"ref_id": 1, "ann_id": 100, "image_id": 10, "split": "train",
             "sentences": [{"sent": "the red mug on the left"}]}]
    (tmp_path / "instances.json").write_text(json.dumps(instances))
    (tmp_path / "refs.json").write_text(json.dumps(refs))
    return str(tmp_path)


def test_refer_seg_dataset(refer_dir):
    from haff_tpu.data.seg_datasets import Refer, ReferSegDataset

    refer = Refer(os.path.join(refer_dir, "refs.json"),
                  os.path.join(refer_dir, "instances.json"))
    assert refer.get_ref_ids("train") == [1]
    ref = refer.load_ref(1)
    mask = refer.get_mask(ref)
    assert mask.shape == (30, 50) and mask[10, 10] == 1

    ds = ReferSegDataset(os.path.join(refer_dir, "refs.json"),
                         os.path.join(refer_dir, "instances.json"),
                         refer_dir)
    s = ds.get(0)
    assert "red mug" in s.question
    assert s.mask_left.sum() > 0


def test_grefer_multi_and_no_target(tmp_path):
    """gRefCOCO generalization: list ann_ids union; empty -> zero mask."""
    import cv2

    from haff_tpu.data.seg_datasets import Refer

    img = (np.random.RandomState(2).rand(20, 30, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "im.jpg"), img)
    instances = {
        "images": [{"id": 1, "file_name": "im.jpg", "height": 20,
                    "width": 30}],
        "annotations": [
            {"id": 10, "image_id": 1,
             "segmentation": [[1, 1, 8, 1, 8, 8, 1, 8]]},
            {"id": 11, "image_id": 1,
             "segmentation": [[15, 10, 25, 10, 25, 18, 15, 18]]},
        ],
        "categories": [],
    }
    refs = [
        {"ref_id": 1, "ann_id": [10, 11], "image_id": 1, "split": "train",
         "sentences": [{"sent": "both things"}]},
        {"ref_id": 2, "ann_id": [], "image_id": 1, "split": "train",
         "sentences": [{"sent": "the unicorn"}]},
    ]
    (tmp_path / "instances.json").write_text(json.dumps(instances))
    (tmp_path / "refs.json").write_text(json.dumps(refs))
    refer = Refer(str(tmp_path / "refs.json"),
                  str(tmp_path / "instances.json"))
    m1 = refer.get_mask(refer.load_ref(1))
    assert m1[4, 4] == 1 and m1[14, 20] == 1  # union of both anns
    m2 = refer.get_mask(refer.load_ref(2))
    assert m2.sum() == 0  # no-target
