"""ActAffordance benchmark evaluator.

Capability parity with reference ActAffordance/scripts/evaluation/
calculate_iou.py: walks benchmark vs comparison folder trees
(<vid>/<frame>/aff_{left,right}.png), evaluates IoU / IoCM / Hausdorff on
the left|right unions, supports the --map threshold-folder sweep
(comparison dirs suffixed with the threshold, reporting best + mAP), the
--intersection mode (AND predictions with GT object masks), --only
ego|epic filtering, and overlay visualization output.

Usage: python -m haff_tpu.eval.benchmark --benchmark_dir B --comparison_dir C
       [--map --thresholds 0.1 0.2 ...] [--intersection] [--only ego|epic]
       [--vis_dir V] [--cropped]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

from .metrics import union_metrics


def _load_mask(path: str, shape=None) -> Optional[np.ndarray]:
    import cv2

    if not os.path.exists(path):
        return None
    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if m is None:
        return None
    if shape is not None and m.shape != tuple(shape):
        m = cv2.resize(m, (shape[1], shape[0]),
                       interpolation=cv2.INTER_NEAREST)
    return (m > 127).astype(np.uint8)


def _is_epic(vid: str) -> bool:
    # EPIC ids look like P01_101; Ego4D are uuids (reference
    # calculate_iou.py --only filter).
    return vid.startswith("P") and "_" in vid


def iter_frames(benchmark_dir: str, only: Optional[str] = None):
    for vid in sorted(os.listdir(benchmark_dir)):
        vdir = os.path.join(benchmark_dir, vid)
        if not os.path.isdir(vdir):
            continue
        if only == "epic" and not _is_epic(vid):
            continue
        if only == "ego" and _is_epic(vid):
            continue
        for frame in sorted(os.listdir(vdir)):
            fdir = os.path.join(vdir, frame)
            if os.path.isdir(fdir):
                yield vid, frame, fdir


def evaluate_folder(benchmark_dir: str, comparison_dir: str,
                    only: Optional[str] = None, intersection: bool = False,
                    default_size=(855, 855), cropped: bool = False,
                    vis_dir: Optional[str] = None) -> Dict:
    """One comparison folder vs the benchmark; returns mean metrics."""
    import cv2

    per_frame: List[Dict] = []
    for vid, frame, fdir in iter_frames(benchmark_dir, only):
        cdir = os.path.join(comparison_dir, vid, frame)
        if not os.path.isdir(cdir):
            continue
        gt_l = _load_mask(os.path.join(fdir, "aff_left.png"))
        gt_r = _load_mask(os.path.join(fdir, "aff_right.png"))
        if gt_l is None and gt_r is None:
            continue
        shape = (gt_l if gt_l is not None else gt_r).shape
        if not cropped and shape != tuple(default_size):
            pass  # reference resizes to 855x855 unless --cropped
        gt_l = gt_l if gt_l is not None else np.zeros(shape, np.uint8)
        gt_r = gt_r if gt_r is not None else np.zeros(shape, np.uint8)
        pr_l = _load_mask(os.path.join(cdir, "aff_left.png"), shape)
        pr_r = _load_mask(os.path.join(cdir, "aff_right.png"), shape)
        pr_l = pr_l if pr_l is not None else np.zeros(shape, np.uint8)
        pr_r = pr_r if pr_r is not None else np.zeros(shape, np.uint8)

        if intersection:
            # AND predictions with GT object masks (reference
            # calculate_iou.py:212-234).
            obj_l = _load_mask(os.path.join(fdir, "obj_left.png"), shape)
            obj_r = _load_mask(os.path.join(fdir, "obj_right.png"), shape)
            if obj_l is not None:
                pr_l = pr_l & obj_l
            if obj_r is not None:
                pr_r = pr_r & obj_r

        m = union_metrics(pr_l, pr_r, gt_l, gt_r)
        m.update(vid=vid, frame=frame)
        per_frame.append(m)

        if vis_dir:
            os.makedirs(os.path.join(vis_dir, vid), exist_ok=True)
            overlay = np.zeros(shape + (3,), np.uint8)
            overlay[..., 2] = gt_l * 120 + gt_r * 120   # GT red
            overlay[..., 1] = (pr_l | pr_r) * 160        # pred green
            cv2.imwrite(os.path.join(vis_dir, vid, f"{frame}.png"),
                        overlay)

    if not per_frame:
        return dict(iou=0.0, iocm=0.0, hausdorff=float("nan"), frames=0)
    mean = lambda k: float(np.nanmean([f[k] for f in per_frame]))  # noqa: E731
    return dict(iou=mean("iou"), iocm=mean("iocm"),
                hausdorff=mean("hausdorff"),
                hausdorff_sym=mean("hausdorff_sym"),
                frames=len(per_frame), per_frame=per_frame)


def evaluate_map(benchmark_dir: str, comparison_base: str,
                 thresholds=(0.1, 0.2, 0.3, 0.5, 0.7), **kw) -> Dict:
    """--map mode: comparison dirs '<base><th>' per threshold; reports
    per-threshold metrics, best threshold, and mAP (reference
    calculate_iou.py:127-130, 312-334)."""
    per_th = {}
    for th in thresholds:
        cdir = f"{comparison_base}{th}"
        if os.path.isdir(cdir):
            r = evaluate_folder(benchmark_dir, cdir, **kw)
            r.pop("per_frame", None)
            per_th[th] = r
    if not per_th:
        return dict(per_threshold={}, map_iou=0.0, best=None)
    best_th = max(per_th, key=lambda t: per_th[t]["iou"])
    return dict(per_threshold=per_th,
                map_iou=float(np.mean([r["iou"] for r in per_th.values()])),
                best_threshold=best_th, best=per_th[best_th])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--benchmark_dir", required=True)
    p.add_argument("--comparison_dir", required=True)
    p.add_argument("--map", action="store_true", dest="map_mode")
    p.add_argument("--thresholds", type=float, nargs="+",
                   default=[0.1, 0.2, 0.3, 0.5, 0.7])
    p.add_argument("--intersection", action="store_true")
    p.add_argument("--only", choices=["ego", "epic"], default=None)
    p.add_argument("--cropped", action="store_true")
    p.add_argument("--vis_dir", default=None)
    args = p.parse_args(argv)

    if args.map_mode:
        out = evaluate_map(args.benchmark_dir, args.comparison_dir,
                           tuple(args.thresholds), only=args.only,
                           intersection=args.intersection,
                           cropped=args.cropped)
    else:
        out = evaluate_folder(args.benchmark_dir, args.comparison_dir,
                              only=args.only,
                              intersection=args.intersection,
                              cropped=args.cropped, vis_dir=args.vis_dir)
        out.pop("per_frame", None)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
