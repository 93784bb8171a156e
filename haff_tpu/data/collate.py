"""Static-shape batch assembly.

Capability parity with reference utils/dataset.py collate_fn (tokenize
with image sentinel, pad, IGNORE_INDEX masking over system+instruction
spans, truncation to model_max_length - image patches) — redesigned for
XLA: every batch has the same shapes (text padded to a fixed length,
batch padded with zero-weight rows), so one compiled train step serves
the whole run.

Label-boundary note: the reference reverse-engineers the instruction span
by splitting the rendered string and subtracting magic offsets
(dataset.py:98-128). Here the span is computed exactly: the prompt is
built from (question, answer), so the boundary is the tokenized length of
the prefix up to and including "ASSISTANT: ".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.config import IGNORE_INDEX
from .prompts import build_conversation, wrap_image_tokens
from .tokenizer import tokenizer_image_token


@dataclass
class Sample:
    """One training example at original resolution (host-side)."""

    image: np.ndarray            # (H, W, 3) uint8 RGB
    question: str                # with <image> sentinel
    answer: Optional[str]        # None for inference prompts
    mask_left: Optional[np.ndarray] = None    # (H, W) binary
    mask_right: Optional[np.ndarray] = None
    taxonomy: Optional[np.ndarray] = None     # (4,)


def tokenize_conversation(question: str, answer: Optional[str], tokenizer,
                          conv_type: str = "llava_v1",
                          use_mm_start_end: bool = True):
    """Returns (input_ids list, labels list). Labels IGNORE everything up
    to and including the assistant role marker; answer + EOS supervised."""
    full = build_conversation(question, answer, conv_type)
    full = wrap_image_tokens(full, use_mm_start_end)
    ids = tokenizer_image_token(full, tokenizer)
    if answer is None:
        return ids, [IGNORE_INDEX] * len(ids)
    # prefix = everything before the answer text ("ASSISTANT: " for
    # llava_v1, "[/INST] " for llava_llama_2)
    from .prompts import CONV_TEMPLATES

    marker = CONV_TEMPLATES[conv_type].answer_marker
    prefix = full[: full.rindex(marker) + len(marker)]
    prefix_ids = tokenizer_image_token(prefix, tokenizer)
    boundary = min(len(prefix_ids), len(ids))
    labels = [IGNORE_INDEX] * boundary + list(ids[boundary:])
    return ids, labels


def collate_affordance(samples: Sequence[Sample], tokenizer, *,
                       sam_image_size: int = 1024, clip_image_size: int = 224,
                       max_text_len: int = 320, batch_size: int = None,
                       conv_type: str = "llava_v1",
                       use_mm_start_end: bool = True,
                       for_training: bool = True) -> Dict[str, np.ndarray]:
    """Samples -> dict of fixed-shape numpy arrays matching
    model/lisa.py TrainBatch fields."""
    from .transforms import (
        clip_preprocess,
        mask_to_canvas,
        sam_preprocess,
        valid_region,
    )

    n = len(samples)
    b = batch_size or n
    assert b >= n
    S, C = sam_image_size, clip_image_size

    images_sam = np.zeros((b, S, S, 3), np.float32)
    images_clip = np.zeros((b, C, C, 3), np.float32)
    input_ids = np.zeros((b, max_text_len), np.int32)
    labels = np.full((b, max_text_len), IGNORE_INDEX, np.int32)
    attention = np.zeros((b, max_text_len), np.int32)
    masks_l = np.zeros((b, S, S), np.float32)
    masks_r = np.zeros((b, S, S), np.float32)
    taxonomies = np.zeros((b, 4), np.float32)
    valid = np.zeros((b, S, S), np.float32)
    weight = np.zeros((b,), np.float32)
    resizes = np.zeros((b, 2), np.int32)

    for i, s in enumerate(samples):
        canvas, resize_hw = sam_preprocess(s.image, S)
        images_sam[i] = canvas
        images_clip[i] = clip_preprocess(s.image, C)
        resizes[i] = resize_hw
        ids, labs = tokenize_conversation(
            s.question, s.answer if for_training else None, tokenizer,
            conv_type, use_mm_start_end)
        # Truncate like the reference (model_max_length cap pre-splice).
        ids = ids[:max_text_len]
        labs = labs[:max_text_len]
        input_ids[i, :len(ids)] = ids
        labels[i, :len(labs)] = labs
        attention[i, :len(ids)] = 1
        if s.mask_left is not None:
            masks_l[i] = mask_to_canvas(s.mask_left, resize_hw, S)
        if s.mask_right is not None:
            masks_r[i] = mask_to_canvas(s.mask_right, resize_hw, S)
        if s.taxonomy is not None:
            taxonomies[i] = s.taxonomy
        valid[i] = valid_region(resize_hw, S)
        weight[i] = 1.0

    return dict(
        images_sam=images_sam, images_clip=images_clip,
        image_index=np.arange(b, dtype=np.int32), input_ids=input_ids,
        labels=labels, attention_mask=attention, masks_left=masks_l,
        masks_right=masks_r, taxonomies=taxonomies, valid_region=valid,
        sample_weight=weight, resizes=resizes)
