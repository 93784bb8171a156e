"""ActAffordance benchmark tooling.

Capability parity with reference ActAffordance/scripts/data_processing/*
and scripts/utils/*:

  * video_to_frames      — video clip -> per-frame <vid>/<frame>/
                           {inpainting.png, annotation.json{narration}}
                           folders (preprocess_video.py:7-50, the
                           "video-clip streaming" input format)
  * gaussian_postprocess — Gaussian blur + 0.5 threshold of predicted
                           masks in place (utils/gaussian.py:8-33)
  * restore_padding      — un-crop predictions back to the full canvas
                           using annotation target_box
                           (utils/restore_image_padding.py:9-46)
  * crop_and_pad_frame   — benchmark image crop + square pad
                           (configure_bench.py:245-317)
  * overlay_results      — red=left / blue=right qualitative overlays
                           (show_lab_results.py:6-89)
  * rename_frames        — 7-digit frame ids (configure_bench.py:9-28)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def video_to_frames(video_path: str, out_dir: str, narration: str,
                    vid: Optional[str] = None, stride: int = 1) -> int:
    """Explode a clip into per-frame benchmark folders. Returns frame
    count."""
    import cv2

    vid = vid or os.path.splitext(os.path.basename(video_path))[0]
    cap = cv2.VideoCapture(video_path)
    n = 0
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % stride == 0:
            fdir = os.path.join(out_dir, vid, f"{idx:07d}")
            os.makedirs(fdir, exist_ok=True)
            cv2.imwrite(os.path.join(fdir, "inpainting.png"), frame)
            with open(os.path.join(fdir, "annotation.json"), "w") as f:
                json.dump({"narration": narration}, f)
            n += 1
        idx += 1
    cap.release()
    return n


def frames_to_benchmark(frames: Sequence[np.ndarray], out_dir: str,
                        narration: str, vid: str = "clip") -> int:
    """In-memory frames -> the same folder protocol (for the jitted
    streaming path, which decodes on host and preprocesses on device)."""
    import cv2

    for idx, frame in enumerate(frames):
        fdir = os.path.join(out_dir, vid, f"{idx:07d}")
        os.makedirs(fdir, exist_ok=True)
        cv2.imwrite(os.path.join(fdir, "inpainting.png"),
                    cv2.cvtColor(np.asarray(frame), cv2.COLOR_RGB2BGR))
        with open(os.path.join(fdir, "annotation.json"), "w") as f:
            json.dump({"narration": narration}, f)
    return len(frames)


def gaussian_postprocess(mask: np.ndarray, ksize: int = 15,
                         sigma: float = 0.0,
                         threshold: float = 0.5) -> np.ndarray:
    """Blur + threshold (reference utils/gaussian.py:8-33)."""
    import cv2

    m = np.asarray(mask, np.float32)
    if m.max() > 1:
        m = m / 255.0
    blurred = cv2.GaussianBlur(m, (ksize, ksize), sigma)
    return (blurred > threshold).astype(np.uint8) * 255


def restore_padding(mask: np.ndarray, target_box: Sequence[int],
                    canvas: Tuple[int, int] = (850, 850)) -> np.ndarray:
    """Place a cropped prediction back onto the full canvas at
    target_box = [x0, y0, x1, y1] (reference
    utils/restore_image_padding.py:9-46)."""
    import cv2

    x0, y0, x1, y1 = [int(v) for v in target_box]
    out = np.zeros(canvas, np.uint8)
    region = cv2.resize(np.asarray(mask, np.uint8),
                        (x1 - x0, y1 - y0),
                        interpolation=cv2.INTER_NEAREST)
    out[y0:y1, x0:x1] = region
    return out


def crop_and_pad_frame(image: np.ndarray, target_box: Sequence[int],
                       out_size: int = 855) -> np.ndarray:
    """Crop to the target box, pad to square, resize (reference
    configure_bench.py:245-317)."""
    import cv2

    from ..pipeline.ops import pad_to_square

    x0, y0, x1, y1 = [int(v) for v in target_box]
    crop = np.asarray(image)[y0:y1, x0:x1]
    sq = np.asarray(pad_to_square(crop[None]))[0]
    return cv2.resize(sq, (out_size, out_size),
                      interpolation=cv2.INTER_LINEAR)


def overlay_results(image: np.ndarray, mask_left: Optional[np.ndarray],
                    mask_right: Optional[np.ndarray],
                    alpha: float = 0.5) -> np.ndarray:
    """Qualitative overlay: red = left hand, blue = right hand (reference
    show_lab_results.py:6-89, chat.py save path). RGB uint8 in/out."""
    out = np.asarray(image, np.float32).copy()
    if mask_left is not None:
        m = np.asarray(mask_left, bool)
        out[m] = out[m] * (1 - alpha) + np.array([255.0, 0, 0]) * alpha
    if mask_right is not None:
        m = np.asarray(mask_right, bool)
        out[m] = out[m] * (1 - alpha) + np.array([0, 0, 255.0]) * alpha
    return out.astype(np.uint8)


def join_prediction_folders(pred_dir: str, bench_dir: str,
                            out_dir: str) -> int:
    """Join a baseline method's per-frame prediction folders with the
    benchmark's frame folders into one scoreable layout (reference
    prepare_folders.py:1-67). Frame ids are matched leading-zero-
    insensitively; the output keeps pred_dir's folder names. Copies
    aff_left.png / aff_right.png from pred_dir and inpainted_frame.png /
    annotation.json from bench_dir. Returns the number of joined
    frames."""
    import shutil

    def key(name):
        return name.lstrip("0") or "0"

    bench = {key(n): n for n in os.listdir(bench_dir)
             if os.path.isdir(os.path.join(bench_dir, n))}
    n_joined = 0
    for name in sorted(os.listdir(pred_dir)):
        src = os.path.join(pred_dir, name)
        if not os.path.isdir(src) or key(name) not in bench:
            continue
        bsrc = os.path.join(bench_dir, bench[key(name)])
        dst = os.path.join(out_dir, name)
        os.makedirs(dst, exist_ok=True)
        for fname, root in (("aff_left.png", src), ("aff_right.png", src),
                            ("inpainted_frame.png", bsrc),
                            ("annotation.json", bsrc)):
            fsrc = os.path.join(root, fname)
            if os.path.exists(fsrc):
                shutil.copy(fsrc, dst)
            elif root == bsrc:
                print(f"Warning: {fsrc} does not exist")
        n_joined += 1
    return n_joined


def add_external_affordances(bench_dir: str, masks_dir: str,
                             out_dir: str) -> int:
    """Bring an external method's affordance masks into the benchmark
    layout as aff_left.png / aff_right.png (reference add_affex.py:1-107).

    Two input layouts are accepted, mirroring the reference:
      1. masks_dir/{left,right}/<frame>.png   (flat per-hand folders)
      2. masks_dir/<frame>/aff_{left,right}.png (mirrors bench_dir)
    Only frames that exist in bench_dir are taken; existing outputs are
    never overwritten. Returns the number of files copied."""
    import shutil

    copied = 0

    def place(src, frame, hand):
        nonlocal copied
        if not os.path.isdir(os.path.join(bench_dir, frame)):
            return
        dst_dir = os.path.join(out_dir, frame)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f"aff_{hand}.png")
        if not os.path.exists(dst):
            shutil.copy(src, dst)
            copied += 1

    left_dir = os.path.join(masks_dir, "left")
    right_dir = os.path.join(masks_dir, "right")
    if os.path.isdir(left_dir) and os.path.isdir(right_dir):
        for hand, hdir in (("left", left_dir), ("right", right_dir)):
            for fname in sorted(os.listdir(hdir)):
                if fname.endswith(".png"):
                    place(os.path.join(hdir, fname),
                          fname.split(".")[0], hand)
    else:
        for frame in sorted(os.listdir(bench_dir)):
            msub = os.path.join(masks_dir, frame)
            if not os.path.isdir(msub):
                continue
            for hand in ("left", "right"):
                src = os.path.join(msub, f"aff_{hand}.png")
                if os.path.exists(src):
                    place(src, frame, hand)
    return copied


def rename_frames_7digit(vid_dir: str) -> int:
    """Normalize frame folder names to 7-digit ids (reference
    configure_bench.py:9-28)."""
    n = 0
    for name in sorted(os.listdir(vid_dir)):
        src = os.path.join(vid_dir, name)
        if not os.path.isdir(src) or not name.isdigit():
            continue
        dst = os.path.join(vid_dir, f"{int(name):07d}")
        if src != dst:
            os.rename(src, dst)
            n += 1
    return n
