"""File-polling robot loop — the reference 2Haff/robot_demo.py analog.

Watches <root>/in/ for {img.png, prompt.txt, margins.txt, mask_left.png,
mask_right.png} dropped by a camera pipeline (ZED2 in the reference),
runs evaluate, thresholds the LOGITS at --th (default -5, reference
robot_demo.py:22-55), re-pads the mask to the pre-crop size using the
margins, ANDs with the provided object masks, writes a heatmap and
aff_{left,right}.png to <root>/out/, then deletes the inputs
(robot_demo.py:178-336). --force_left/right/both override the taxonomy.

Usage: python -m haff_tpu.infer.robot_demo --root robot_demo
       [--th -5] [--force_left|--force_right|--force_both] ...
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def restore_margins(mask: np.ndarray, margins, full_hw) -> np.ndarray:
    """Re-pad a crop-space mask to the pre-crop frame using margins
    (top, bottom, left, right) (reference robot_demo.py:268-300)."""
    top, bottom, left, right = [int(v) for v in margins]
    out = np.zeros(full_hw, mask.dtype)
    h, w = mask.shape
    out[top:top + h, left:left + w] = mask
    return out


def process_once(predictor, root: str, th: float, force: str = "") -> bool:
    """One poll iteration; returns True when a frame was processed."""
    import cv2

    in_dir = os.path.join(root, "in")
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir, exist_ok=True)
    img_path = os.path.join(in_dir, "img.png")
    prompt_path = os.path.join(in_dir, "prompt.txt")
    if not (os.path.exists(img_path) and os.path.exists(prompt_path)):
        return False

    image = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
    with open(prompt_path) as f:
        prompt = f.read().strip()
    margins = None
    mpath = os.path.join(in_dir, "margins.txt")
    if os.path.exists(mpath):
        with open(mpath) as f:
            margins = [float(v) for v in f.read().split()]

    text, ml, mr, tax = predictor(image, prompt)
    bl = (ml > th).astype(np.uint8)
    br = (mr > th).astype(np.uint8)
    t = int(np.argmax(tax))
    if force == "left" or (not force and t == 0):
        br[:] = 0
    if force == "right" or (not force and t == 1):
        bl[:] = 0
    if force == "both":
        pass

    # AND with provided object masks when present
    for name, m in (("mask_left.png", bl), ("mask_right.png", br)):
        p = os.path.join(in_dir, name)
        if os.path.exists(p):
            obj = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if obj is not None and obj.shape == m.shape:
                m &= (obj > 127).astype(np.uint8)

    if margins and len(margins) == 6:
        # margins file: top bottom left right full_h full_w
        full_hw = (int(margins[4]), int(margins[5]))
        bl = restore_margins(bl, margins[:4], full_hw)
        br = restore_margins(br, margins[:4], full_hw)

    cv2.imwrite(os.path.join(out_dir, "aff_left.png"), bl * 255)
    cv2.imwrite(os.path.join(out_dir, "aff_right.png"), br * 255)
    heat = 1 / (1 + np.exp(-np.maximum(ml, mr)))
    cv2.imwrite(os.path.join(out_dir, "heatmap.png"),
                (heat * 255).astype(np.uint8))
    with open(os.path.join(out_dir, "text.txt"), "w") as f:
        f.write(text)

    for name in ("img.png", "prompt.txt", "margins.txt", "mask_left.png",
                 "mask_right.png"):
        p = os.path.join(in_dir, name)
        if os.path.exists(p):
            os.remove(p)
    return True


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="robot_demo")
    p.add_argument("--model_preset", default="7b")
    p.add_argument("--decoder", default="llama", choices=["llama", "mpt"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--load_in_8bit", action="store_true")
    p.add_argument("--load_in_4bit", action="store_true")
    p.add_argument("--conv_type", default="llava_v1",
                   choices=["llava_v1", "llava_llama_2"])
    p.add_argument("--use_mm_start_end", action="store_true", default=True)
    p.add_argument("--no_mm_start_end", dest="use_mm_start_end",
                   action="store_false")
    p.add_argument("--kv_cache_8bit", action="store_true")
    p.add_argument("--th", type=float, default=-5.0)
    p.add_argument("--force_left", action="store_true")
    p.add_argument("--force_right", action="store_true")
    p.add_argument("--force_both", action="store_true")
    p.add_argument("--poll_interval", type=float, default=0.2)
    p.add_argument("--max_iters", type=int, default=0,
                   help="0 = run forever")
    args = p.parse_args(argv)

    from .predictor import Predictor

    force = ("left" if args.force_left else
             "right" if args.force_right else
             "both" if args.force_both else "")
    predictor = Predictor(model_preset=args.model_preset,
                          decoder=args.decoder,
                          checkpoint=args.checkpoint,
                          tokenizer=args.tokenizer,
                          load_in_8bit=args.load_in_8bit,
                          load_in_4bit=args.load_in_4bit,
                          kv_cache_8bit=args.kv_cache_8bit,
                          conv_type=args.conv_type,
                          use_mm_start_end=args.use_mm_start_end)
    os.makedirs(os.path.join(args.root, "in"), exist_ok=True)
    print(f"polling {args.root}/in ...")
    i = 0
    while True:
        if process_once(predictor, args.root, args.th, force):
            print("processed frame", flush=True)
        else:
            time.sleep(args.poll_interval)
        i += 1
        if args.max_iters and i >= args.max_iters:
            break


if __name__ == "__main__":
    main()
