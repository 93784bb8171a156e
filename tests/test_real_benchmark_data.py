"""Real ActAffordance benchmark data through the rebuild's data/eval
path (SURVEY section 4: "evaluate() ... on committed sample frames, e.g.
ActAffordance/data_zipped/ tarballs").

Uses the reference repo's committed val-split tarballs (EPIC P14_05) —
real images, real GT affordance masks, real annotations — to validate
the walker, prompt construction and the benchmark evaluator protocol on
authentic files rather than synthetic fixtures. Skipped when the
reference checkout is not present."""

import json
import os
import subprocess

import numpy as np
import pytest

_TARBALL = ("/root/reference/ActAffordance/data_zipped/masks/"
            "P14_05.tar.gz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_TARBALL),
    reason="reference data_zipped tarballs not available")


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("actaff_real")
    subprocess.run(["tar", "xzf", _TARBALL, "-C", str(root)], check=True)
    return str(root)


def test_val_walker_on_real_epic_frames(bench_dir):
    from haff_tpu.data.aff_dataset import AffDatasetVal

    ds = AffDatasetVal(bench_dir, require_masks=True, style="inference")
    assert len(ds) > 0
    sample, meta = ds[0]
    # real cropped benchmark frames are square-padded RGB uint8
    assert sample.image.dtype == np.uint8 and sample.image.ndim == 3
    ann = json.load(open(os.path.join(meta["dir"], "annotation.json")))
    assert ann["narration"].lower() in sample.question.lower()
    # at least one GT hand mask binarizes non-empty at the reference's
    # > 0 threshold
    import cv2

    masks = []
    for side in ("aff_left.png", "aff_right.png"):
        p = os.path.join(meta["dir"], side)
        if os.path.exists(p):
            masks.append(cv2.imread(p, cv2.IMREAD_GRAYSCALE))
    assert masks and any((m > 0).any() for m in masks)


def test_evaluator_scores_gt_against_itself(bench_dir):
    """Predictions == ground truth must score IoU = IoCM = 1.0 and
    Hausdorff = 0 under the full reference protocol on real files."""
    from haff_tpu.eval.benchmark import evaluate_folder

    res = evaluate_folder(bench_dir, bench_dir)
    assert res["frames"] > 0 and res["failed"] == 0
    assert res["iou"] == pytest.approx(1.0, abs=1e-6)
    assert res["iocm"] == pytest.approx(1.0, abs=1e-6)
    assert res["hausdorff"] == pytest.approx(0.0, abs=1e-6)


def test_real_taxonomy_annotations_are_valid_one_hot(bench_dir):
    """Every committed annotation carries a valid 4-way taxonomy and the
    object fields match the active hands (the invariants the loss gating
    and inference gating rely on)."""
    n = 0
    for vid in sorted(os.listdir(bench_dir)):
        vdir = os.path.join(bench_dir, vid)
        for frame in sorted(os.listdir(vdir)):
            p = os.path.join(vdir, frame, "annotation.json")
            if not os.path.exists(p):
                continue
            ann = json.load(open(p))
            tax = ann["taxonomy"]
            assert len(tax) == 4 and sum(tax) == 1, (vid, frame, tax)
            n += 1
    assert n > 0


def test_inference_cli_end_to_end_on_real_frames(bench_dir, tmp_path):
    """The full serving CLI (tiny random weights) over the real EPIC
    frames: walker -> prompts -> evaluate -> threshold sweep -> PNG
    layout, then the benchmark evaluator scores the produced folder —
    the complete reference inference.py + calculate_iou.py protocol on
    authentic data."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from haff_tpu.eval.benchmark import main as eval_main
    from haff_tpu.infer.cli import main as infer_main

    vis = str(tmp_path / "vis")
    infer_main([
        "--benchmark_dir", bench_dir, "--vis_save_path", vis,
        "--model_preset", "tiny", "--batch", "4", "--max_new_tokens", "4",
        "--max_text_len", "448", "--precision", "fp32",
        "--thresholds", "0.5",
    ])
    produced = []
    root = tmp_path / "vis0.5"
    if root.is_dir():
        produced = [p for p in root.rglob("aff_*.png")]
    # random taxonomy may gate sides off, but across 11 real frames at
    # least one mask must be written
    assert produced, "CLI wrote no prediction masks"

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main(["--benchmark_dir", bench_dir, "--comparison_dir", vis,
                   "--map", "--thresholds", "0.5"])
    result = _json.loads(buf.getvalue())
    assert result["best_threshold"] is not None
