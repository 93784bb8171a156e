"""Default in-repo implementations of the 2HANDS pipeline's external
stages 2 and 4.

The reference keeps these as non-vendored git submodules
(reference 2HANDS/.gitmodules:1-12, pipeline.bash:22-37):

  stage 2  hand/object mask propagation — XMem_Batch video object
           segmentation seeded from VISOR annotations
  stage 4  hand inpainting              — agent_inpainting
           (taming-transformers based)

so the reference pipeline cannot run without cloning and wiring two
external model repos. These defaults make `pipeline/orchestrate.py`
runnable end-to-end from raw frames with zero external dependencies,
while `PipelineStages` keeps both stages pluggable for quality.

Both are TPU-first jitted array programs, not model ports:

* `propagate_masks` — a scan over consecutive frames: block features
  (mean color + gradient per cell) are matched within a local search
  window (cost volume over static shifts, the XLA-friendly form of
  patch correlation), the per-cell flow warps the mask forward, and a
  color-consistency gate suppresses drift onto dissimilar pixels.
* `temporal_inpaint` — a forward+backward "last visible value" scan
  over time (pixels occluded now are filled from the nearest frame
  where they were visible), with an iterated neighborhood-diffusion
  fill for pixels masked in every frame.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pixel_features(frames: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) uint8/float -> (N, H, W, 5) per-pixel features:
    RGB + |dy|, |dx| gradient magnitude."""
    x = frames.astype(jnp.float32) / 255.0
    gy = jnp.abs(jnp.diff(x, axis=1, append=x[:, -1:])).mean(-1, keepdims=True)
    gx = jnp.abs(jnp.diff(x, axis=2, append=x[:, :, -1:])).mean(-1, keepdims=True)
    return jnp.concatenate([x, gy, gx], axis=-1)         # (N, H, W, 5)


@functools.partial(jax.jit, static_argnames=("radius", "window"))
def propagate_masks(frames: jnp.ndarray, seed_masks: jnp.ndarray,
                    radius: int = 6, window: int = 9,
                    color_gate: float = 0.25) -> jnp.ndarray:
    """Propagate seed masks from frame 0 through a clip.

    frames: (N, H, W, 3) uint8; seed_masks: (M, H, W) binary masks on
    frame 0 (e.g. [left hand, right hand, object] from a VISOR
    annotation). Returns (N, M, H, W) float {0,1} masks per frame.

    Per step, each PIXEL of frame t+1 searches a (2*radius+1)^2 pixel
    neighborhood of frame t for its best feature match: the cost of a
    shift is the window-aggregated squared feature distance (box-filter
    block matching). The running argmin over shifts is carried through
    a fori_loop — a streaming cost volume, O(H*W) memory — and the mask
    warps with the winning per-pixel flow. A color gate zeroes pixels
    whose best match is still dissimilar (drift suppression).

    Design note (round 4): the original formulation matched CELL-level
    block features with cell-level shifts, so sub-cell motion (e.g. a
    2 px/frame pan with 8 px cells) was invisible per step and the
    accumulated drift destroyed the track over ~30 frames (measured
    IoU 1.0 -> 0.25, tests/test_pipeline_quality.py). Pixel-resolution
    flow with window aggregation keeps per-step quantization <= 0.5 px.
    """
    n, H, W, _ = frames.shape
    m = seed_masks.shape[0]
    feats = _pixel_features(frames)                      # (N, H, W, 5)
    seeds = seed_masks.astype(jnp.float32)               # (M, H, W)
    side = 2 * radius + 1
    n_shifts = side * side

    def box(x):                                          # window sum
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (window, window), (1, 1), "SAME")

    # Per-pixel tap count for the SAME-padded window: near borders the
    # box covers fewer real pixels (25/81 at a 9x9 corner), so
    # normalizing the gate by a constant window^2 would underestimate
    # border costs ~3x and let a track drifting off-frame keep a
    # spurious border mask.
    box_count = box(jnp.ones((H, W), jnp.float32))

    def step(masks_prev, pair):
        f_prev, f_next = pair                            # (H, W, 5)
        fp_pad = jnp.pad(f_prev, ((radius, radius), (radius, radius),
                                  (0, 0)), mode="edge")
        mp_pad = jnp.pad(masks_prev, ((0, 0), (radius, radius),
                                      (radius, radius)), mode="edge")

        def scan_shift(s, carry):
            best_cost, best_mask = carry
            dy = s // side
            dx = s % side
            cand = jax.lax.dynamic_slice(fp_pad, (dy, dx, 0), (H, W, 5))
            cost = box(jnp.sum((cand - f_next) ** 2, axis=-1))
            cand_mask = jax.lax.dynamic_slice(
                mp_pad, (0, dy, dx), (m, H, W))
            take = cost < best_cost
            return (jnp.where(take, cost, best_cost),
                    jnp.where(take[None], cand_mask, best_mask))

        init = (jnp.full((H, W), jnp.inf, jnp.float32),
                jnp.zeros((m, H, W), jnp.float32))
        best_cost, masks_next = jax.lax.fori_loop(
            0, n_shifts, scan_shift, init)
        gate = (best_cost / box_count < color_gate).astype(jnp.float32)
        masks_next = masks_next * gate[None]
        return masks_next, masks_next

    _, out = jax.lax.scan(step, seeds, (feats[:-1], feats[1:]))
    out = jnp.concatenate([seeds[None], out], axis=0)    # (N, M, H, W)
    return (out > 0.5).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("diffusion_iters",))
def temporal_inpaint(frames: jnp.ndarray, masks: jnp.ndarray,
                     diffusion_iters: int = 16) -> jnp.ndarray:
    """Remove masked (hand) regions from a clip.

    frames: (N, H, W, 3) uint8; masks: (N, H, W) binary hand masks.
    Returns (N, H, W, 3) uint8 with the masked region filled from the
    nearest frame in time where the pixel is visible; pixels masked in
    EVERY frame fall back to iterated neighborhood diffusion.
    """
    x = frames.astype(jnp.float32)
    visible = (masks == 0).astype(jnp.float32)[..., None]  # (N,H,W,1)

    def fill_scan(carry, inp):
        last_val, last_vis = carry
        val, vis = inp
        new_val = jnp.where(vis > 0, val, last_val)
        new_vis = jnp.maximum(vis, last_vis)
        return (new_val, new_vis), (new_val, new_vis)

    zero = (jnp.zeros_like(x[0]), jnp.zeros_like(visible[0]))
    _, (fwd_val, fwd_vis) = jax.lax.scan(fill_scan, zero, (x, visible))
    _, (bwd_val, bwd_vis) = jax.lax.scan(
        fill_scan, zero, (x[::-1], visible[::-1]))
    bwd_val, bwd_vis = bwd_val[::-1], bwd_vis[::-1]

    filled = jnp.where(visible > 0, x,
                       jnp.where(fwd_vis > 0, fwd_val, bwd_val))
    ever = jnp.maximum(fwd_vis, bwd_vis)                 # visible anywhere

    # Diffusion fallback for never-visible pixels: iterate a masked
    # 3x3 box blur that only writes the still-unfilled region.
    def blur(img):
        return jax.lax.reduce_window(
            img, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
            "SAME") / 9.0

    def diff_step(i, img):
        return jnp.where(ever > 0, img, blur(img))

    filled = jax.lax.fori_loop(0, diffusion_iters, diff_step, filled)
    return jnp.clip(filled, 0, 255).astype(jnp.uint8)


def default_propagate(frames: np.ndarray, seed_left: np.ndarray,
                      seed_right: np.ndarray, seed_obj: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host wrapper matching PipelineStages.propagate_masks: seeds on
    frame 0 -> per-frame (left, right, object) masks (N, H, W)."""
    seeds = jnp.stack([jnp.asarray(seed_left, jnp.float32),
                       jnp.asarray(seed_right, jnp.float32),
                       jnp.asarray(seed_obj, jnp.float32)])
    out = propagate_masks(jnp.asarray(frames), seeds)
    arr = np.asarray(out)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def default_inpaint(frames: np.ndarray, hand_masks: np.ndarray
                    ) -> np.ndarray:
    """Host wrapper matching PipelineStages.inpaint_hands."""
    return np.asarray(temporal_inpaint(jnp.asarray(frames),
                                       jnp.asarray(hand_masks)))
