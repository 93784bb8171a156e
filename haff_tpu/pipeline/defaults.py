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


def _block_features(frames: jnp.ndarray, cell: int) -> jnp.ndarray:
    """(N, H, W, 3) uint8/float -> (N, h, w, 5) block features:
    mean RGB + mean |dy|, |dx| gradient magnitude per (cell x cell)."""
    x = frames.astype(jnp.float32) / 255.0
    gy = jnp.abs(jnp.diff(x, axis=1, append=x[:, -1:])).mean(-1, keepdims=True)
    gx = jnp.abs(jnp.diff(x, axis=2, append=x[:, :, -1:])).mean(-1, keepdims=True)
    f = jnp.concatenate([x, gy, gx], axis=-1)           # (N, H, W, 5)
    return jax.lax.reduce_window(
        f, 0.0, jax.lax.add, (1, cell, cell, 1), (1, cell, cell, 1),
        "VALID") / float(cell * cell)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (h, w, C) by (dy, dx) with edge padding (static shift)."""
    h, w = x.shape[:2]
    r = max(abs(dy), abs(dx))
    pad = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="edge")
    return jax.lax.dynamic_slice(
        pad, (r + dy, r + dx, 0), x.shape)


@functools.partial(jax.jit, static_argnames=("cell", "radius"))
def propagate_masks(frames: jnp.ndarray, seed_masks: jnp.ndarray,
                    cell: int = 8, radius: int = 2,
                    color_gate: float = 0.25) -> jnp.ndarray:
    """Propagate seed masks from frame 0 through a clip.

    frames: (N, H, W, 3) uint8; seed_masks: (M, H, W) binary masks on
    frame 0 (e.g. [left hand, right hand, object] from a VISOR
    annotation). Returns (N, M, H, W) float {0,1} masks per frame.

    Per step, each block cell of frame t+1 searches a
    (2*radius+1)^2 cell neighborhood of frame t for its best feature
    match (cost volume over static shifts — compiler-friendly, no
    gather), pulls the mask value from the matched cell, and a color
    gate zeroes cells whose matched feature distance is large (drift
    suppression when the tracked object leaves the frame).
    """
    n, H, W, _ = frames.shape
    m = seed_masks.shape[0]
    feats = _block_features(frames, cell)                # (N, h, w, 5)
    h, w = feats.shape[1:3]
    # Block-pool the seeds to the feature grid.
    seeds = jax.lax.reduce_window(
        seed_masks.astype(jnp.float32), 0.0, jax.lax.max,
        (1, cell, cell), (1, cell, cell), "VALID")        # (M, h, w)

    shifts = [(dy, dx) for dy in range(-radius, radius + 1)
              for dx in range(-radius, radius + 1)]

    def step(masks_prev, pair):
        f_prev, f_next = pair                            # (h, w, 5)
        # cost volume: distance from each next-cell to each shifted
        # prev-cell; masks warp with the argmin shift.
        cands = jnp.stack([_shift2d(f_prev, dy, dx) for dy, dx in shifts])
        cost = jnp.sum((cands - f_next[None]) ** 2, axis=-1)  # (S, h, w)
        best = jnp.argmin(cost, axis=0)                  # (h, w)
        best_cost = jnp.min(cost, axis=0)
        # Warp every mask with the same flow: select among shifted masks.
        def warp(mask):                                  # (h, w)
            shifted = jnp.stack(
                [_shift2d(mask[..., None], dy, dx)[..., 0]
                 for dy, dx in shifts])                  # (S, h, w)
            sel = jnp.take_along_axis(shifted, best[None], axis=0)[0]
            return sel
        masks_next = jax.vmap(warp)(masks_prev)          # (M, h, w)
        gate = (best_cost < color_gate).astype(jnp.float32)
        masks_next = masks_next * gate[None]
        return masks_next, masks_next

    _, out = jax.lax.scan(step, seeds, (feats[:-1], feats[1:]))
    out = jnp.concatenate([seeds[None], out], axis=0)    # (N, M, h, w)
    # Upsample the block grid back to pixels (nearest).
    out = jnp.repeat(jnp.repeat(out, cell, axis=2), cell, axis=3)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, H - out.shape[2]),
                        (0, W - out.shape[3])), mode="edge")
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
