"""Benchmark assembly (reference configure_bench.py:30-243): a synthetic
raw folder set assembles into the exact <vid>/<frame>/ layout the
evaluator walker reads."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from haff_tpu.eval.benchmark import evaluate_folder, iter_frames
from haff_tpu.eval.tools import (
    add_object_masks,
    assemble_cropped_annotations,
    copy_annotations,
    copy_json_with_target_box,
    insert_inpainting_frames,
    rename_frames_7digit,
    restore_padding,
)


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def _raw_layout(tmp_path):
    """Raw pieces the reference assembly starts from: frame folders with
    GT aff masks, a flat inpainting dir, an annotation dir, and
    object-mask dirs per hand."""
    vid = tmp_path / "bench" / "P90_01"
    H = W = 64
    rng = np.random.RandomState(0)
    for idx in ("12", "345"):  # non-normalized ids -> rename step
        fdir = vid / idx
        aff = np.zeros((H, W), np.uint8)
        aff[10:20, 10:30] = 255
        _write_png(str(fdir / "aff_left.png"), aff)
        _write_png(str(fdir / "aff_right.png"), np.roll(aff, 15, axis=1))

    # flat source dirs keyed by the 7-digit ids
    src = tmp_path / "inpainting_src"
    anns = tmp_path / "annotations"
    objs = tmp_path / "objects"
    for idx in ("0000012", "0000345"):
        frame = rng.randint(0, 255, (H, W, 3), np.uint8)
        _write_png(str(src / f"{idx}.png"), frame)
        adir = anns / idx
        os.makedirs(adir, exist_ok=True)
        with open(adir / "annotation.json", "w") as f:
            json.dump({"narration": "cut the onion"}, f)
        obj = np.zeros((H, W - 8), np.uint8)  # non-square -> pad step
        obj[24:40, 16:40] = 255
        _write_png(str(objs / "left" / f"{idx}.png"), obj)
        _write_png(str(objs / "right" / f"{idx}.png"),
                   np.roll(obj, 10, axis=0))
    return str(vid), str(src), str(anns), str(objs)


def test_assemble_full_benchmark_layout(tmp_path):
    vid_dir, src, anns, objs = _raw_layout(tmp_path)

    assert rename_frames_7digit(vid_dir) == 2
    assert insert_inpainting_frames(vid_dir, src) == 2
    assert copy_annotations(vid_dir, anns) == 2
    assert add_object_masks(vid_dir, objs) == 4

    # exact per-frame file set the walker/evaluator reads
    bench_root = os.path.dirname(vid_dir)
    frames = list(iter_frames(bench_root))
    assert [(v, f) for v, f, _ in frames] == [
        ("P90_01", "0000012"), ("P90_01", "0000345")]
    for _, _, fdir in frames:
        files = set(os.listdir(fdir))
        assert {"inpainting.png", "annotation.json", "aff_left.png",
                "aff_right.png", "obj_left.png", "obj_right.png"} <= files
        # object masks were square-padded (left pad: taller than wide)
        obj = cv2.imread(os.path.join(fdir, "obj_left.png"),
                         cv2.IMREAD_GRAYSCALE)
        assert obj.shape[0] == obj.shape[1]

    # the assembled tree walks straight through the evaluator
    # (self-comparison == perfect IoU)
    res = evaluate_folder(bench_root, bench_root, cropped=True)
    assert res["frames"] == 2
    assert res["iou"] == pytest.approx(1.0)

    # inpainting channel reversal is the reference's exact behavior
    raw = cv2.imread(os.path.join(src, "0000012.png"))
    out = cv2.imread(os.path.join(vid_dir, "0000012", "inpainting.png"))
    np.testing.assert_array_equal(out, raw[:, :, ::-1])


def test_cropped_annotations_and_restore_roundtrip(tmp_path):
    vid_dir, src, anns, objs = _raw_layout(tmp_path)
    rename_frames_7digit(vid_dir)
    insert_inpainting_frames(vid_dir, src)
    copy_annotations(vid_dir, anns)
    add_object_masks(vid_dir, objs)

    bench_root = os.path.dirname(vid_dir)
    out = str(tmp_path / "cropped")
    assert assemble_cropped_annotations(bench_root, out, offset=4,
                                        crop_images=True) == 2

    leaf = os.path.join(out, "P90_01", "0000012")
    with open(os.path.join(leaf, "annotation.json")) as f:
        data = json.load(f)
    assert data["narration"] == "cut the onion"
    x0, y0, x1, y1 = data["target_box"]
    assert all(isinstance(v, int) for v in (x0, y0, x1, y1))

    # the merged box covers both hands' (square-padded) object masks,
    # grown by the offset and clamped to the canvas
    ol = cv2.imread(os.path.join(vid_dir, "0000012", "obj_left.png"),
                    cv2.IMREAD_GRAYSCALE)
    orr = cv2.imread(os.path.join(vid_dir, "0000012", "obj_right.png"),
                     cv2.IMREAD_GRAYSCALE)
    ys, xs = np.nonzero((ol > 0) | (orr > 0))
    assert x0 <= xs.min() and x1 >= xs.max()
    assert y0 <= ys.min() and y1 >= ys.max()

    # cropped images exist and match the box size
    crop = cv2.imread(os.path.join(leaf, "inpainting.png"))
    assert crop.shape[:2] == (y1 - y0, x1 - x0)

    # restore_padding puts a cropped prediction back on the full canvas
    pred = np.ones((y1 - y0, x1 - x0), np.uint8) * 255
    full = restore_padding(pred, (x0, y0, x1, y1), canvas=ol.shape)
    assert full.shape == ol.shape
    assert full[y0:y1, x0:x1].min() == 255
    outside = full.sum() - full[y0:y1, x0:x1].sum()
    assert outside == 0


def test_copy_json_with_target_box_missing_source(tmp_path):
    ok = copy_json_with_target_box(
        str(tmp_path / "nope.json"), str(tmp_path / "out.json"),
        (0, 1, 2, 3))
    assert ok is False


def test_cropped_images_nonsquare_padded_not_resized(tmp_path):
    """Non-square source images must be square-padded (top/left, like
    add_object_masks) before cropping — resizing would stretch them out
    of register with the padded-canvas target_box."""
    from haff_tpu.eval.tools import assemble_cropped_annotations

    leaf = tmp_path / "bench" / "P91_01" / "0000001"
    os.makedirs(leaf, exist_ok=True)
    H = W = 64
    obj = np.zeros((H, W), np.uint8)
    obj[30:40, 30:50] = 255
    _write_png(str(leaf / "obj_left.png"), obj)
    with open(leaf / "annotation.json", "w") as f:
        json.dump({"narration": "x"}, f)
    # non-square frame, 16 rows shorter than the mask canvas; a unique
    # marker row at frame row 0 must land at padded row 16
    frame = np.zeros((H - 16, W, 3), np.uint8)
    frame[0, :, :] = 200
    _write_png(str(leaf / "inpainting.png"), frame)

    out = tmp_path / "cropped"
    assert assemble_cropped_annotations(
        str(tmp_path / "bench"), str(out), offset=20,
        crop_images=True) == 1
    with open(out / "P91_01" / "0000001" / "annotation.json") as f:
        x0, y0, x1, y1 = json.load(f)["target_box"]
    crop = cv2.imread(str(out / "P91_01" / "0000001" / "inpainting.png"))
    assert crop.shape[:2] == (y1 - y0, x1 - x0)
    # marker row: original row 0 -> padded row 16 -> crop row 16 - y0
    marker_rows = np.nonzero((crop == 200).all(axis=2).any(axis=1))[0]
    assert list(marker_rows) == [16 - y0]
