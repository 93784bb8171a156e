"""Data layer: tokenizer splice, conversation labels, transforms shape
math, h5/json shard roundtrip, collate contract."""

import json
import os

import numpy as np
import pytest

from haff_tpu.core.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from haff_tpu.data.aff_dataset import AffDataset, rasterize_contours
from haff_tpu.data.collate import Sample, collate_affordance, tokenize_conversation
from haff_tpu.data.prompts import build_conversation
from haff_tpu.data.tokenizer import ByteTokenizer, seg_token_idx, tokenizer_image_token
from haff_tpu.data.transforms import (
    clip_preprocess,
    get_preprocess_shape,
    mask_to_canvas,
    sam_preprocess,
)


def test_preprocess_shape_math():
    # reference transforms.py:102-113 semantics: int(side * scale + 0.5)
    assert get_preprocess_shape(480, 640, 1024) == (768, 1024)
    assert get_preprocess_shape(640, 480, 1024) == (1024, 768)
    assert get_preprocess_shape(1024, 1024, 1024) == (1024, 1024)
    assert get_preprocess_shape(720, 1280, 1024) == (576, 1024)


def test_tokenizer_image_token_splice():
    tok = ByteTokenizer()
    ids = tokenizer_image_token("hi <image> there", tok)
    assert ids[0] == tok.bos_token_id
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # Roundtrip text (image sentinel dropped)
    text = tok.decode([i for i in ids if i >= 0])
    assert text == "hi  there"


def test_seg_token_roundtrip():
    tok = ByteTokenizer()
    sid = seg_token_idx(tok)
    ids = tok("It is [SEG].").input_ids
    assert sid in ids
    assert tok.decode(ids) == "It is [SEG]."


def test_conversation_label_masking():
    tok = ByteTokenizer()
    ids, labels = tokenize_conversation(
        "<image>\nWhere?", "It is [SEG].", tok)
    assert len(ids) == len(labels)
    sid = seg_token_idx(tok)
    # everything before the answer is IGNORE; answer tokens supervised
    assert labels[0] == IGNORE_INDEX
    assert sid in labels
    first_sup = next(i for i, l in enumerate(labels) if l != IGNORE_INDEX)
    answer_txt = tok.decode([l for l in labels[first_sup:] if l >= 0])
    assert answer_txt.startswith("It is [SEG].")
    # prompt contains exactly one image sentinel
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def test_sam_and_clip_preprocess_shapes():
    img = (np.random.RandomState(0).rand(120, 160, 3) * 255).astype(np.uint8)
    canvas, resize = sam_preprocess(img, 256)
    assert canvas.shape == (256, 256, 3)
    assert resize == (192, 256)
    assert np.all(canvas[192:] == 0)
    clip = clip_preprocess(img, 64)
    assert clip.shape == (64, 64, 3)


def test_rasterize_contours_square():
    contour = [[[2, 2]], [[2, 7]], [[7, 7]], [[7, 2]]]  # cv2 point format
    mask = rasterize_contours([contour], (10, 10))
    assert mask[4, 4] == 1 and mask[0, 0] == 0
    assert mask.sum() == 36  # 6x6 filled square


def test_mask_to_canvas_binary():
    mask = np.zeros((50, 100), np.uint8)
    mask[10:20, 30:60] = 1
    canvas = mask_to_canvas(mask, (64, 128), 128)
    assert canvas.shape == (128, 128)
    assert set(np.unique(canvas)) <= {0.0, 1.0}


@pytest.fixture
def shard_dir(tmp_path):
    """Synthetic 2HANDS shard pair (h5 + json) in the reference layout."""
    import h5py

    h5dir = tmp_path / "h5"
    jdir = tmp_path / "jsons"
    h5dir.mkdir()
    jdir.mkdir()
    n = 4
    with h5py.File(h5dir / "0-3_P01.h5", "w") as f:
        g = f.create_group("data")
        g.create_dataset("inpainted",
                         data=np.random.RandomState(0).randint(
                             0, 255, (n, 64, 80, 3), np.uint8))
        g.create_dataset(
            "narration",
            data=np.array([b"open drawer", b"cut onion", b"pour water",
                           b"wash plate"]))
        tax = np.zeros((n, 4), np.float32)
        tax[:, 0] = 1
        g.create_dataset("taxonomy", data=tax)
    entries = {}
    for i in range(n):
        entries[str(i)] = {
            "original_size": [64, 80],
            "aff_left": [[[[10, 10]], [[10, 20]], [[20, 20]], [[20, 10]]]],
            "aff_right": [],
        }
    (jdir / "0-3_P01.json").write_text(json.dumps(entries))
    return str(tmp_path)


def test_aff_dataset_local_shards(shard_dir):
    ds = AffDataset(shard_dir, samples_per_epoch=8, seed=0)
    assert ds.size == 4
    s = ds.get(1)
    assert s.image.shape == (64, 80, 3)
    assert "cut onion" in s.question
    assert "[SEG]" in s.answer
    assert s.mask_left.sum() > 0
    assert s.mask_right.sum() == 0
    assert s.taxonomy.tolist() == [1, 0, 0, 0]
    # random-draw __getitem__
    s2 = ds[0]
    assert s2.image.shape == (64, 80, 3)


def test_collate_static_shapes(shard_dir):
    ds = AffDataset(shard_dir, samples_per_epoch=8, seed=0)
    tok = ByteTokenizer()
    samples = [ds.get(i) for i in range(3)]
    batch = collate_affordance(samples, tok, sam_image_size=128,
                               clip_image_size=32, max_text_len=512,
                               batch_size=4)
    assert batch["images_sam"].shape == (4, 128, 128, 3)
    assert batch["input_ids"].shape == (4, 512)
    assert batch["sample_weight"].tolist() == [1, 1, 1, 0]
    assert (batch["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 3
    # labels supervise only the answer region
    row = batch["labels"][0]
    assert (row != IGNORE_INDEX).sum() > 0
    sup = row[row != IGNORE_INDEX]
    assert seg_token_idx(tok) in sup.tolist()


def test_llava_llama_2_conversation_format():
    """llava_llama_2 renders exactly as the reference's
    SeparatorStyle.LLAMA_2 (conversation.py:72-93, template at 300-312):
    [INST] <<SYS>>...<</SYS>>

    q [/INST] a </s>, with the leading <s> sep stripped."""
    sysmsg = ("You are a helpful language and vision assistant. "
              "You are able to understand the visual content that the "
              "user provides, and assist the user with a variety of "
              "tasks using natural language.")
    got = build_conversation("What is this?", "It is [SEG].",
                             conv_type="llava_llama_2")
    expect = (f"[INST] <<SYS>>\n{sysmsg}\n<</SYS>>\n\n"
              "What is this? [/INST] It is [SEG]. </s>")
    assert got == expect
    # inference form: no answer -> prompt ends at [/INST]
    got_inf = build_conversation("What is this?", None,
                                 conv_type="llava_llama_2")
    assert got_inf.endswith("[/INST]")
    assert "[SEG]" not in got_inf


def test_llama_2_label_boundary():
    """Labels must supervise exactly the answer tokens for llama_2."""
    from haff_tpu.core.config import IGNORE_INDEX
    from haff_tpu.data.collate import tokenize_conversation
    from haff_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(None, model_max_length=512)
    ids, labels = tokenize_conversation(
        "<image>\nDo the thing.", "Sure, [SEG].", tok,
        conv_type="llava_llama_2")
    assert len(ids) == len(labels)
    sup = [i for i, l in enumerate(labels) if l != IGNORE_INDEX]
    assert sup, "answer span must be supervised"
    # supervised ids decode back to the answer (+eos)
    txt = tok.decode([ids[i] for i in sup if ids[i] >= 0])
    assert "[SEG]" in txt and "Do the thing" not in txt


def test_clip_preprocess_matches_hf_processor():
    """clip_preprocess must reproduce HF CLIPImageProcessor exactly
    (the checkpoint's training-time preprocessing): int-truncated long
    side, PIL bicubic, center crop, CLIP stats."""
    from transformers import CLIPImageProcessor

    from haff_tpu.data.transforms import clip_preprocess

    proc = CLIPImageProcessor()  # defaults = openai/clip-vit 224 config
    rng = np.random.RandomState(0)
    for shape in ((480, 640, 3), (333, 250, 3), (224, 224, 3)):
        img = rng.randint(0, 256, shape, np.uint8)
        ref = proc.preprocess(img, return_tensors="np")["pixel_values"][0]
        ours = clip_preprocess(img).transpose(2, 0, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_label_boundary_supervises_first_answer_token():
    """The common-prefix boundary must supervise the FIRST answer token
    even when the tokenizer merges the role marker's trailing space into
    it (SentencePiece phantom token)."""
    from haff_tpu.core.config import IGNORE_INDEX
    from haff_tpu.data.collate import tokenize_conversation
    from haff_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(None, model_max_length=512)
    ids, labels = tokenize_conversation(
        "<image>\nDo the thing.", "It is [SEG].", tok)
    sup = [ids[i] for i, l in enumerate(labels) if l != IGNORE_INDEX]
    txt = tok.decode([t for t in sup if t >= 0])
    assert txt.lstrip().startswith("It is"), txt


def test_multiturn_vqa_supervision():
    """Multi-turn conversations supervise EVERY answer span (reference
    vqa_dataset.py keeps all rounds in one conversation)."""
    from haff_tpu.core.config import IGNORE_INDEX
    from haff_tpu.data.collate import tokenize_multiturn
    from haff_tpu.data.tokenizer import load_tokenizer

    tok = load_tokenizer(None, model_max_length=2048)
    turns = [("<image>\nWhat is shown?", "A red mug."),
             ("Where is it?", "On the table.")]
    ids, labels = tokenize_multiturn(turns, tok)
    assert len(ids) == len(labels)
    sup = tok.decode([ids[i] for i, l in enumerate(labels)
                      if l != IGNORE_INDEX and ids[i] >= 0])
    assert "A red mug." in sup and "On the table." in sup, sup
    assert "What is shown?" not in sup and "Where is it?" not in sup, sup


def test_prefetch_loader_ordered_multiworker():
    """Worker-pool loader delivers batches strictly in index order with
    out-of-order completion, and bounds the build-ahead window."""
    import threading
    import time as _time

    from haff_tpu.data.loader import PrefetchLoader

    in_flight = []
    lock = threading.Lock()

    def make(i):
        with lock:
            in_flight.append(i)
        _time.sleep(0.02 * ((i * 7) % 3))  # jitter completion order
        return {"i": i}

    out = [b["i"] for b in PrefetchLoader(make, 12, prefetch=2,
                                          num_workers=3)]
    assert out == list(range(12))


def test_prefetch_loader_propagates_worker_error():
    from haff_tpu.data.loader import PrefetchLoader

    def make(i):
        if i == 3:
            raise ValueError("shard corrupt")
        return {"i": i}

    got = []
    import pytest as _pytest
    with _pytest.raises(ValueError, match="shard corrupt"):
        for b in PrefetchLoader(make, 8, num_workers=2):
            got.append(b["i"])
    assert got == sorted(got)
