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
