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


def test_ade20k_adapter(tmp_path):
    """init_ade20k layout walk + the id-shift label quirk (reference
    sem_seg_dataset.py:39-67, 245-248)."""
    import cv2

    from haff_tpu.data.seg_datasets import (SemSegDataset,
                                            ade20k_label_transform,
                                            init_ade20k)

    root = tmp_path / "ade20k"
    (root / "images" / "training").mkdir(parents=True)
    (root / "annotations" / "training").mkdir(parents=True)
    (root / "ade20k_classes.json").write_text('["wall", "sky", "tree"]')
    img = np.full((16, 16, 3), 100, np.uint8)
    ann = np.zeros((16, 16), np.uint8)     # 0 = unlabeled in ADE20K
    ann[2:8, 2:8] = 2                      # class id 1 ("sky") stored +1
    ann[10:12, 10:12] = 255                # explicit ignore
    cv2.imwrite(str(root / "images" / "training" / "a.jpg"), img)
    cv2.imwrite(str(root / "annotations" / "training" / "a.png"), ann)

    classes, images, labels = init_ade20k(str(tmp_path))
    assert classes == ["wall", "sky", "tree"]
    assert len(images) == 1 and labels[0].endswith("a.png")

    t = ade20k_label_transform(ann)
    assert (t[0, 0] == 255) and (t[2, 2] == 1) and (t[10, 10] == 255)

    ds = SemSegDataset("", classes, image_paths=images,
                       label_paths=labels,
                       label_transform=ade20k_label_transform, seed=0)
    s = ds.get(0, class_id=1)
    assert s.mask_left.sum() == 36
    assert "sky" in s.question


def test_cocostuff_hyphen_drop(tmp_path):
    from haff_tpu.data.seg_datasets import (
        init_cocostuff, make_cocostuff_label_transform)

    root = tmp_path / "cocostuff"
    (root / "train2017").mkdir(parents=True)
    (root / "cocostuff_classes.txt").write_text(
        "header\n0: person\n1: wall-brick\n2: sky\n")
    import cv2

    lab = np.zeros((8, 8), np.uint8)
    lab[:2] = 1          # hyphenated -> ignore
    lab[2:4] = 2
    cv2.imwrite(str(root / "train2017" / "x.png"), lab)

    classes, images, labels = init_cocostuff(str(tmp_path))
    assert classes == ["person", "wall-brick", "sky"]
    assert images[0].endswith("coco/train2017/x.jpg".replace("/", os.sep)) \
        or "coco" in images[0]
    t = make_cocostuff_label_transform(classes)(lab)
    assert (t[0] == 255).all() and (t[2] == 2).all()


def test_mapillary_adapter(tmp_path):
    import cv2

    from haff_tpu.data.seg_datasets import init_mapillary

    root = tmp_path / "mapillary"
    (root / "training" / "v2.0" / "labels").mkdir(parents=True)
    (root / "config_v2.0.json").write_text(
        '{"labels": [{"readable": "Bird"}, {"readable": "Curb"}]}')
    cv2.imwrite(str(root / "training" / "v2.0" / "labels" / "f.png"),
                np.zeros((4, 4), np.uint8))
    classes, images, labels = init_mapillary(str(tmp_path))
    assert classes == ["bird", "curb"]
    assert "images" in images[0] and images[0].endswith("f.jpg")


def test_part_seg_dataset(tmp_path):
    """PACO/Pascal-Part COCO-format adapter with obj:part phrasing
    (reference sem_seg_dataset.py:89-124, 226-236)."""
    import json as _json

    import cv2

    from haff_tpu.data.seg_datasets import (PartSegDataset,
                                            part_name_phrases)

    assert part_name_phrases("dog") == ["dog"]
    assert part_name_phrases("dog_(canine):tail_(rear)") == [
        "dog tail", "the tail of the dog"]

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "i.jpg"), np.full((20, 20, 3), 9, np.uint8))
    ann = {
        "images": [{"id": 1, "file_name": "i.jpg",
                    "height": 20, "width": 20}],
        "categories": [{"id": 7, "name": "car:wheel"}],
        "annotations": [{"id": 3, "image_id": 1, "category_id": 7,
                         "segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]],
                         "bbox": [2, 2, 10, 10]}],
    }
    ap = tmp_path / "train.json"
    ap.write_text(_json.dumps(ann))
    ds = PartSegDataset(str(ap), str(img_dir), seed=0)
    assert len(ds) == 1
    s = ds.get(0)
    assert s.mask_left.sum() > 0
    assert ("car wheel" in s.question) or ("wheel of the car" in s.question)
