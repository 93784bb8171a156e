"""Legacy corpora: polygon rasterizer, ReasonSeg/VQA samples, hybrid mix."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def reason_seg_dir(tmp_path):
    import cv2

    d = tmp_path / "train"
    d.mkdir()
    img = (np.random.RandomState(0).rand(60, 80, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(d / "a.jpg"), img)
    ann = {
        "text": "the largest cup",
        "is_sentence": True,
        "shapes": [
            {"label": "target", "points": [[10, 10], [40, 10], [40, 40],
                                           [10, 40]]},
            {"label": "ignore_region", "points": [[50, 10], [70, 10],
                                                  [70, 30], [50, 30]]},
        ],
    }
    (d / "a.json").write_text(json.dumps(ann))
    return str(tmp_path)


def test_get_mask_from_json(reason_seg_dir):
    import cv2

    from haff_tpu.data.extra_datasets import get_mask_from_json

    img = cv2.imread(os.path.join(reason_seg_dir, "train", "a.jpg"))
    mask, text, is_sentence = get_mask_from_json(
        os.path.join(reason_seg_dir, "train", "a.json"), img)
    assert text == "the largest cup" and is_sentence
    assert mask[20, 20] == 1       # target region
    assert mask[20, 60] == 255     # ignore region
    assert mask[5, 5] == 0


def test_reason_seg_dataset(reason_seg_dir):
    from haff_tpu.data.extra_datasets import ReasonSegDataset

    ds = ReasonSegDataset(reason_seg_dir, "train")
    assert len(ds) == 1
    s = ds.get(0)
    assert "the largest cup" in s.question
    assert s.answer == "It is [SEG]."
    assert s.mask_left.sum() > 0 and s.mask_right is None
    assert s.taxonomy.tolist() == [1, 0, 0, 0]


def test_vqa_dataset_and_hybrid(tmp_path, reason_seg_dir):
    import cv2

    from haff_tpu.data.extra_datasets import (
        HybridDataset,
        ReasonSegDataset,
        VqaDataset,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "x.jpg"),
                (np.random.RandomState(1).rand(30, 30, 3) * 255)
                .astype(np.uint8))
    items = [{"image": "x.jpg", "conversations": [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A kitchen."}]}]
    vqa_json = tmp_path / "vqa.json"
    vqa_json.write_text(json.dumps(items))

    vqa = VqaDataset(str(vqa_json), str(img_dir))
    s = vqa.get(0)
    assert s.answer == "A kitchen." and s.mask_left is None

    rs = ReasonSegDataset(reason_seg_dir, "train")
    hybrid = HybridDataset([vqa, rs], [9, 3], samples_per_epoch=50, seed=0)
    kinds = set()
    for i in range(30):
        smp = hybrid[i]
        kinds.add(smp.answer)
    assert "A kitchen." in kinds and "It is [SEG]." in kinds


def test_vqa_sample_through_collate_has_no_mask_loss():
    """A VQA sample collates with zero masks; the model's seg gate
    weights its mask losses to zero (no [SEG] token in the answer)."""
    from haff_tpu.data.collate import Sample, collate_affordance
    from haff_tpu.data.tokenizer import ByteTokenizer, seg_token_idx

    tok = ByteTokenizer()
    img = (np.random.RandomState(2).rand(40, 50, 3) * 255).astype(np.uint8)
    batch = collate_affordance(
        [Sample(image=img, question="<image>\nWhat?", answer="A pan.")],
        tok, sam_image_size=128, clip_image_size=32, max_text_len=512)
    assert batch["masks_left"].sum() == 0
    sup = batch["labels"][0][batch["labels"][0] != -100]
    assert seg_token_idx(tok) not in sup.tolist()


def test_reason_seg_explanatory(tmp_path):
    from haff_tpu.data.extra_datasets import ReasonSegDataset

    """Explanatory sampling: choice 2 drops [SEG] + masks; choice 1
    appends the explanation to a [SEG] answer."""
    import cv2

    d = tmp_path / "reason"
    (d / "train").mkdir(parents=True)
    (d / "explanatory").mkdir()
    img = (np.random.RandomState(0).rand(40, 50, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(d / "train" / "x.jpg"), img)
    (d / "train" / "x.json").write_text(json.dumps({
        "text": "the red mug", "is_sentence": False,
        "shapes": [{"label": "t",
                    "points": [[5, 5], [30, 5], [30, 20], [5, 20]]}]}))
    (d / "explanatory" / "train.json").write_text(json.dumps(
        [{"image": "x.jpg", "query": "q", "outputs": "Because reasons."}]))

    # explanatory=1.0 -> always choice 2 (pure text answer)
    ds = ReasonSegDataset(str(d), explanatory=1.0, seed=0)
    s = ds.get(0)
    assert "[SEG]" not in s.answer and s.answer == "Because reasons."
    assert s.mask_left is None and s.taxonomy is None

    # explanatory=0.0 -> choice in {0,1}; with seed sweep both occur
    seen = set()
    for seed in range(8):
        s = ReasonSegDataset(str(d), explanatory=0.0, seed=seed).get(0)
        seen.add("exp" if "Because" in s.answer else "plain")
        assert "[SEG]" in s.answer
        assert s.mask_left is not None
    assert seen == {"exp", "plain"}, seen

    # explanatory off -> plain behavior
    s = ReasonSegDataset(str(d), seed=0).get(0)
    assert s.answer == "It is [SEG]."
