"""2HANDS pipeline orchestration + dataset packing.

Capability parity with reference 2HANDS/pipeline.bash + scripts/** — the
offline producer that turns egocentric video into the h5+json training
shards AffDataset consumes:

  stage 1  frame acquisition            (caller-provided frames)
  stage 2  hand/object mask propagation (pluggable; reference: XMem_Batch
           submodule seeded from VISOR annotations)
  stage 3  dilate + recolor             (pipeline/ops.py, on device)
  stage 4  hand inpainting              (pluggable; reference:
           agent_inpainting submodule)
  stage 5  object mask completion       (built-in: OUR prompted SAM with
           a point prompt at the hand-mask centroid — replaces the sam2
           submodule; or pluggable)
  stage 6  affordance = hand AND completed object (ops.extract_affordance)
  stage 7  square padding               (ops.pad_to_square)
  stages 8-10  setup/filter/taxonomy    (this module)
  stage 11 augmentation                 (ops: flip/crop/jitter)
  stage 12 packing to h5 + json contour shards (this module; format
           identical to reference create_dataset.py:116-238 +
           compress_masks_to_json.py:60-92)

External heavy models (video object segmentation, video inpainting) stay
pluggable callables — the reference keeps them as non-vendored git
submodules too (.gitmodules), so parity is the interface + everything
around it.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import ops


def mask_to_contours(mask: np.ndarray) -> List:
    """Binary mask -> nested cv2 contour lists (reference
    utils/compress_masks_to_json.py:60-92 json format)."""
    import cv2

    contours, _ = cv2.findContours(
        (np.asarray(mask) > 0).astype(np.uint8), cv2.RETR_EXTERNAL,
        cv2.CHAIN_APPROX_SIMPLE)
    # Flattened (N, 2) point lists — the reference json stores
    # contour[:, 0, :].tolist() (compress_masks_to_json.py:60-92), not
    # cv2's nested (N, 1, 2) shape.
    return [c[:, 0, :].tolist() for c in contours]


def expand_taxonomy(tax3: Sequence[float], has_left: bool,
                    has_right: bool) -> List[float]:
    """3-dim [unimanual, bi-symmetric, bi-asymmetric] -> 4-dim
    [left, right, bi-sym, bi-asym] by splitting unimanual on which hand's
    files exist (reference data_setup/update_taxonomy.py:24-39)."""
    uni, sym, asym = [float(x) for x in tax3]
    # Reference order (update_taxonomy.py:24-39): default the unimanual
    # weight to RIGHT ([0]+tax3 keeps it at index 1); move it to left
    # only when the right-hand files are absent.
    left = uni if not has_right else 0.0
    right = uni if has_right else 0.0
    return [left, right, sym, asym]


@dataclass
class FrameRecord:
    """One packed frame (reference per-frame folder layout,
    data_setup/setup_dataset.py:5-64)."""

    inpainted: np.ndarray            # (H, W, 3) uint8
    narration: str
    taxonomy: Sequence[float]        # 4-dim
    aff_left: Optional[np.ndarray] = None    # (H, W) binary
    aff_right: Optional[np.ndarray] = None
    obj_left: Optional[np.ndarray] = None
    obj_right: Optional[np.ndarray] = None
    noun: str = ""
    verb: str = ""
    obj_id_left: int = -1
    obj_id_right: int = -1


def filter_record(rec: FrameRecord, min_area: int = 20,
                  max_area: int = 30000) -> bool:
    """Reference filter gates (filter_dataset.py:40-117 +
    create_dataset.py:28-114): narration/verb present and affordance-
    bearing, at least one hand mask with in-range area."""
    if not ops.narration_ok(rec.narration, rec.verb or None):
        return False

    def ok(m):
        return (m is not None and np.count_nonzero(m)
                and ops.mask_area_ok(m, min_area, max_area))

    tax = [float(x) for x in rec.taxonomy]
    if tax[2] + tax[3] > 0:
        # bimanual: BOTH hands' masks must be present and in range
        # (reference filter_dataset.py is_valid, taxonomy[0]==0 branch)
        return bool(ok(rec.aff_left) and ok(rec.aff_right))
    if tax[0] > 0:
        return bool(ok(rec.aff_left))
    if tax[1] > 0:
        return bool(ok(rec.aff_right))
    return False


def pack_shard(records: Sequence[FrameRecord], out_dir: str,
               start_index: int = 0, shard_name: str = "P00") -> Tuple[str, str]:
    """Write one h5 + json shard pair in the exact reference layout:
    h5 'data/{inpainted, taxonomy, noun, verb, narration, obj_id_left,
    obj_id_right}', json '{idx: {original_size, aff_left, aff_right,
    obj_left, obj_right}}', filenames 'start-end_<name>.{h5,json}'
    (reference create_dataset.py:116-238, rename_dataset.py:4-33)."""
    import h5py

    os.makedirs(os.path.join(out_dir, "h5"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "jsons"), exist_ok=True)
    end_index = start_index + len(records) - 1
    stem = f"{start_index}-{end_index}_{shard_name}"
    h5_path = os.path.join(out_dir, "h5", stem + ".h5")
    json_path = os.path.join(out_dir, "jsons", stem + ".json")

    with h5py.File(h5_path, "w") as f:
        g = f.create_group("data")
        g.create_dataset(
            "inpainted",
            data=np.stack([r.inpainted for r in records]).astype(np.uint8))
        g.create_dataset(
            "taxonomy",
            data=np.stack([np.asarray(r.taxonomy, np.float32)
                           for r in records]))
        str_dt = h5py.string_dtype()
        g.create_dataset("narration",
                         data=[r.narration for r in records], dtype=str_dt)
        g.create_dataset("noun", data=[r.noun for r in records],
                         dtype=str_dt)
        g.create_dataset("verb", data=[r.verb for r in records],
                         dtype=str_dt)
        g.create_dataset(
            "obj_id_left",
            data=np.asarray([r.obj_id_left for r in records], np.int32))
        g.create_dataset(
            "obj_id_right",
            data=np.asarray([r.obj_id_right for r in records], np.int32))

    entries = {}
    for i, r in enumerate(records):
        entries[str(start_index + i)] = {
            "original_size": list(r.inpainted.shape[:2]),
            "aff_left": mask_to_contours(r.aff_left)
            if r.aff_left is not None else [],
            "aff_right": mask_to_contours(r.aff_right)
            if r.aff_right is not None else [],
            "obj_left": mask_to_contours(r.obj_left)
            if r.obj_left is not None else [],
            "obj_right": mask_to_contours(r.obj_right)
            if r.obj_right is not None else [],
        }
    with open(json_path, "w") as f:
        json.dump(entries, f)
    return h5_path, json_path


# ---------------------------------------------------------------------------
# Mask completion with our own SAM (replaces the sam2 submodule stage)
# ---------------------------------------------------------------------------

def sam_mask_completion(sam_apply: Callable, images: np.ndarray,
                        partial_masks: np.ndarray) -> np.ndarray:
    """Complete occluded object masks on inpainted frames by prompting
    SAM with the partial mask's centroid (reference stage 5 uses the sam2
    submodule; here the in-framework prompted SAM serves).

    sam_apply(images (B,S,S,3) preprocessed, points (B,1,2), labels
    (B,1)) -> mask logits (B,1,S,S)."""
    b = partial_masks.shape[0]
    pts = np.zeros((b, 1, 2), np.float32)
    for i in range(b):
        ys, xs = np.nonzero(partial_masks[i])
        if len(xs):
            pts[i, 0] = (xs.mean(), ys.mean())
    labels = np.ones((b, 1), np.int32)
    logits = sam_apply(images, pts, labels)
    return (np.asarray(logits)[:, 0] > 0).astype(np.uint8)


@dataclass
class PipelineStages:
    """Pluggable external stages (reference submodules). When left None,
    run_pipeline_from_video falls back to the in-repo jitted defaults
    (pipeline/defaults.py) so the whole pipeline runs with zero external
    repos — the reference requires cloning XMem_Batch +
    agent_inpainting submodules for the same stages (.gitmodules:1-12)."""

    propagate_masks: Optional[Callable] = None   # XMem analog
    inpaint_hands: Optional[Callable] = None     # agent_inpainting analog
    complete_masks: Optional[Callable] = None    # sam2 analog


def run_pipeline_from_video(frames: np.ndarray, seed_left: np.ndarray,
                            seed_right: np.ndarray, seed_obj: np.ndarray,
                            narration: str, taxonomy3: Sequence[float],
                            out_dir: str,
                            stages: PipelineStages = PipelineStages(),
                            **kwargs) -> List[Tuple[str, str]]:
    """Raw clip -> shards with only frame-0 seed masks (the VISOR-seeded
    protocol of reference pipeline.bash stages 1-2): propagate the seeds
    through the clip (stage 2), inpaint the hands out (stage 4), then
    run the standard mask pipeline.

    frames: (N, H, W, 3) uint8; seed_*: (H, W) binary masks on frame 0.
    """
    from .defaults import default_inpaint, default_propagate

    n = frames.shape[0]
    if stages.propagate_masks is not None:
        left, right, obj = stages.propagate_masks(
            frames, seed_left, seed_right, seed_obj)
    else:
        left, right, obj = default_propagate(
            frames, seed_left, seed_right, seed_obj)

    hands = ((np.asarray(left) != 0) | (np.asarray(right) != 0))
    if stages.inpaint_hands is not None:
        inpainted = np.asarray(stages.inpaint_hands(frames))
    else:
        inpainted = default_inpaint(frames, hands.astype(np.uint8))

    # Stage 4 already consumed; null it so run_pipeline does not re-run.
    inner = PipelineStages(inpaint_hands=None,
                           complete_masks=stages.complete_masks)
    return run_pipeline(
        inpainted, np.asarray(left), np.asarray(right), np.asarray(obj),
        [narration] * n, np.tile(np.asarray(taxonomy3, np.float32), (n, 1)),
        out_dir, stages=inner, **kwargs)


def run_pipeline(frames: np.ndarray, hand_masks_left: np.ndarray,
                 hand_masks_right: np.ndarray, object_masks: np.ndarray,
                 narrations: Sequence[str], taxonomies3: np.ndarray,
                 out_dir: str, stages: PipelineStages = PipelineStages(),
                 dilate_factor: int = 10, shard_name: str = "P00",
                 shard_size: int = 512,
                 start_index: int = 0) -> List[Tuple[str, str]]:
    """End-to-end pipeline.bash analog over in-memory frame arrays.

    frames: (N, H, W, 3) uint8; hand/object masks: (N, H, W) binary;
    taxonomies3: (N, 3). Returns list of (h5, json) shard paths."""
    import jax.numpy as jnp

    if stages.inpaint_hands is not None:
        frames = np.asarray(stages.inpaint_hands(frames))

    # Reference flow (pipeline.bash stages 3, 6): per-hand DILATED masks
    # AND the completed object, then the resulting affordance is dilated
    # AGAIN by process_affordances before packing.
    dil_left = ops.recolor_white(ops.dilate_masks(
        jnp.asarray(hand_masks_left.astype(np.float32)), dilate_factor))
    dil_right = ops.recolor_white(ops.dilate_masks(
        jnp.asarray(hand_masks_right.astype(np.float32)), dilate_factor))
    objs = jnp.asarray(object_masks.astype(np.float32))
    if stages.complete_masks is not None:
        objs = jnp.asarray(
            stages.complete_masks(frames, np.asarray(objs)).astype(
                np.float32))
    aff_l = np.asarray(ops.recolor_white(ops.dilate_masks(
        ops.extract_affordance(dil_left, objs), dilate_factor)))
    aff_r = np.asarray(ops.recolor_white(ops.dilate_masks(
        ops.extract_affordance(dil_right, objs), dilate_factor)))

    records: List[FrameRecord] = []
    for i in range(frames.shape[0]):
        left = aff_l[i].astype(np.uint8)
        right = aff_r[i].astype(np.uint8)
        tax4 = expand_taxonomy(taxonomies3[i],
                               has_left=bool(left.any()),
                               has_right=bool(right.any()))
        rec = FrameRecord(
            inpainted=frames[i], narration=str(narrations[i]),
            taxonomy=tax4,
            aff_left=left if left.any() else None,
            aff_right=right if right.any() else None,
            obj_left=np.asarray(objs[i], np.uint8),
            obj_right=np.asarray(objs[i], np.uint8))
        if filter_record(rec):
            records.append(rec)

    shards = []
    for s in range(0, len(records), shard_size):
        chunk = records[s:s + shard_size]
        shards.append(pack_shard(chunk, out_dir,
                                 start_index=start_index + s,
                                 shard_name=shard_name))
    return shards
