"""Semantic- and referring-segmentation pretraining corpora.

Capability parity with reference utils/sem_seg_dataset.py (ADE20K /
COCO-Stuff style: image + per-pixel class-id annotation, sample a
present class, ask to segment it) and utils/refer_seg_dataset.py +
refer.py/grefer.py (refclef/refcoco/+/g: COCO-format instances + refs
with natural-language sentences).

Like extra_datasets.py, both emit the unified Sample contract (single
mask on the LEFT decoder, taxonomy [1,0,0,0]) so the one static-shape
collate and model serve every corpus.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .collate import Sample
from .prompts import ANSWER_LIST

# Reference utils/utils.py:14-23 SHORT_QUESTION_LIST (all 4 templates).
SEG_QUESTION_LIST = [
    "<image>\nCan you segment the {class_name} in this image?",
    "<image>\nPlease segment the {class_name} in this image.",
    "<image>\nWhat is {class_name} in this image? Please respond with "
    "segmentation mask.",
    "<image>\nWhat is {class_name} in this image? Please output "
    "segmentation mask.",
]


class SemSegDataset:
    """Images + class-id annotation PNGs + class-name list (ADE20K-style
    layout: images/<name>.jpg, annotations/<name>.png)."""

    def __init__(self, base_dir: str, classes: Sequence[str],
                 image_subdir: str = "images",
                 ann_subdir: str = "annotations", seed: int = 0,
                 ignore_label: int = 255):
        self.classes = list(classes)
        self.ignore_label = ignore_label
        self.images = sorted(
            glob.glob(os.path.join(base_dir, image_subdir, "*.jpg"))
            + glob.glob(os.path.join(base_dir, image_subdir, "*.png")))
        self.ann_dir = os.path.join(base_dir, ann_subdir)
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.images)

    def get(self, idx: int, class_id: Optional[int] = None) -> Sample:
        import cv2

        img_path = self.images[idx]
        image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        stem = os.path.splitext(os.path.basename(img_path))[0]
        ann = cv2.imread(os.path.join(self.ann_dir, stem + ".png"),
                         cv2.IMREAD_GRAYSCALE)
        present = [c for c in np.unique(ann)
                   if c != self.ignore_label and c < len(self.classes)]
        if class_id is None:
            class_id = int(self.rng.choice(present)) if present else 0
        mask = (ann == class_id).astype(np.uint8)
        name = self.classes[class_id]
        q = self.rng.choice(SEG_QUESTION_LIST).format(class_name=name)
        return Sample(image=image, question=q, answer=str(self.rng.choice(ANSWER_LIST)),
                      mask_left=mask, mask_right=None,
                      taxonomy=np.asarray([1, 0, 0, 0], np.float32))

    def __getitem__(self, idx) -> Sample:
        return self.get(int(self.rng.randint(0, len(self.images))))


class Refer:
    """Minimal REFER-style API over refs(<split>).json + instances.json
    (reference utils/refer.py surface: getRefIds/loadRefs/getMask).
    Also covers the gRefCOCO generalization (reference utils/grefer.py):
    `ann_id` may be a LIST (multi-target refs — masks are unioned) or
    empty/None/-1 (no-target refs — an all-zero mask)."""

    def __init__(self, refs_json: str, instances_json: str):
        with open(refs_json) as f:
            self.refs = json.load(f)
        with open(instances_json) as f:
            inst = json.load(f)
        self.anns = {a["id"]: a for a in inst["annotations"]}
        self.imgs = {im["id"]: im for im in inst["images"]}

    def get_ref_ids(self, split: Optional[str] = None) -> List[int]:
        return [r["ref_id"] for r in self.refs
                if split is None or r.get("split") == split]

    def load_ref(self, ref_id: int) -> Dict:
        return next(r for r in self.refs if r["ref_id"] == ref_id)

    def get_mask(self, ref: Dict) -> np.ndarray:
        from ..eval.annotations import coco_annotation_to_mask

        im = self.imgs[ref["image_id"]]
        shape = (im["height"], im["width"])
        ann_ids = ref.get("ann_id")
        if not isinstance(ann_ids, list):
            ann_ids = [ann_ids]
        mask = np.zeros(shape, np.uint8)
        for aid in ann_ids:
            if aid in (None, -1, "") or aid not in self.anns:
                continue  # no-target component (gRefCOCO)
            mask |= coco_annotation_to_mask(self.anns[aid], shape)
        return mask

    def image_file(self, ref: Dict) -> str:
        return self.imgs[ref["image_id"]]["file_name"]


class ReferSegDataset:
    """Referring segmentation over a REFER corpus (reference
    utils/refer_seg_dataset.py)."""

    def __init__(self, refs_json: str, instances_json: str,
                 image_dir: str, split: str = "train", seed: int = 0):
        self.refer = Refer(refs_json, instances_json)
        self.ref_ids = self.refer.get_ref_ids(split) or \
            self.refer.get_ref_ids(None)
        self.image_dir = image_dir
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.ref_ids)

    def get(self, idx: int) -> Sample:
        import cv2

        ref = self.refer.load_ref(self.ref_ids[idx])
        image = cv2.cvtColor(
            cv2.imread(os.path.join(self.image_dir,
                                    self.refer.image_file(ref))),
            cv2.COLOR_BGR2RGB)
        mask = self.refer.get_mask(ref)
        sent = self.rng.choice(
            [s["sent"] if isinstance(s, dict) else s
             for s in ref["sentences"]])
        q = self.rng.choice(SEG_QUESTION_LIST).format(class_name=sent)
        return Sample(image=image, question=q, answer=str(self.rng.choice(ANSWER_LIST)),
                      mask_left=mask.astype(np.uint8), mask_right=None,
                      taxonomy=np.asarray([1, 0, 0, 0], np.float32))

    def __getitem__(self, idx) -> Sample:
        return self.get(int(self.rng.randint(0, len(self.ref_ids))))
