"""2HANDS pipeline mask/image operations — TPU-first.

Capability parity with the reference's per-file cv2 loops (reference:
2HANDS/scripts/affordance_extraction_preparation.py,
data_augmentation/*, data_setup/*): dilate + recolor, affordance
extraction (hand AND completed-object), square padding, horizontal-flip
augmentation (left<->right swap + taxonomy flip), crop-around-bbox, color
jitter, area filtering.

Every op here is a BATCHED jittable array function — the "video
extraction hot transforms" of BASELINE.json become device-side compute
fed by double-buffered prefetch instead of per-file Python/cv2 loops.
Host convenience wrappers live in pipeline/orchestrate.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dilate_masks(masks: jnp.ndarray, factor: int = 10) -> jnp.ndarray:
    """Binary dilation with a (factor x factor) ones kernel (reference:
    affordance_extraction_preparation.py dilate_masks). masks: (B, H, W)
    in {0, 1}. Implemented as a max-pool via reduce_window — the natural
    XLA form of dilation."""
    # cv2's even-kernel anchor sits at factor//2: a pixel dilates
    # factor//2 BEFORE and factor-1-factor//2 AFTER it (verified against
    # cv2.dilate); reduce_window covers [i-pad_lo, i+pad_hi], so pad_lo
    # must be the AFTER count to reproduce cv2's asymmetry.
    pad_lo = factor - 1 - factor // 2
    pad_hi = factor // 2
    return jax.lax.reduce_window(
        masks, 0.0, jax.lax.max, (1, factor, factor), (1, 1, 1),
        [(0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi)])


def recolor_white(masks: jnp.ndarray) -> jnp.ndarray:
    """Any nonzero -> 1 (reference recolor_masks_white, scaled to {0,1})."""
    return (masks != 0).astype(jnp.float32)


def extract_affordance(hand_masks: jnp.ndarray,
                       object_masks: jnp.ndarray) -> jnp.ndarray:
    """Affordance = hand AND completed-object overlap (reference
    affordance_extraction_preparation.py:256-304 bitwise_and)."""
    return ((hand_masks != 0) & (object_masks != 0)).astype(jnp.float32)


def pad_to_square(images: jnp.ndarray) -> jnp.ndarray:
    """Pad top/left to square (reference pad_image: the SHORT side is
    padded at its leading edge). images: (B, H, W, C) with static H, W."""
    b, h, w = images.shape[:3]
    if h > w:
        pad = [(0, 0), (0, 0), (h - w, 0)] + [(0, 0)] * (images.ndim - 3)
    else:
        pad = [(0, 0), (w - h, 0), (0, 0)] + [(0, 0)] * (images.ndim - 3)
    return jnp.pad(images, pad)


def horizontal_flip_sample(image, mask_left, mask_right, taxonomy):
    """Flip augmentation: mirror the image and SWAP left<->right masks;
    taxonomy flips left-only <-> right-only (reference
    horizontal_flip.py:7-80; bimanual classes 2/3 unchanged)."""
    flip = lambda x: jnp.flip(x, axis=-2 if x.ndim == 3 else -2)  # noqa: E731
    image_f = jnp.flip(image, axis=1) if image.ndim == 3 else jnp.flip(
        image, axis=2)
    new_left = jnp.flip(mask_right, axis=-1)
    new_right = jnp.flip(mask_left, axis=-1)
    tax = jnp.stack(
        [taxonomy[..., 1], taxonomy[..., 0], taxonomy[..., 2],
         taxonomy[..., 3]], axis=-1)
    return image_f, new_left, new_right, tax


def crop_around_bbox(image: jnp.ndarray, bbox: Tuple[int, int, int, int],
                     offset: int = 50) -> np.ndarray:
    """Object-bbox crop with a pixel offset, clamped to the frame
    (reference process_cropped_sequences.py:14-230). Host-side (dynamic
    output shape)."""
    x0, y0, x1, y1 = bbox
    h, w = image.shape[:2]
    x0 = max(0, x0 - offset)
    y0 = max(0, y0 - offset)
    x1 = min(w, x1 + offset)
    y1 = min(h, y1 + offset)
    return np.asarray(image)[y0:y1, x0:x1]


def color_jitter(images: jnp.ndarray, key,
                 brightness: float = 0.2, contrast: float = 0.2,
                 saturation: float = 0.2) -> jnp.ndarray:
    """Batched brightness/contrast/saturation jitter (reference
    apply_jitter.py:27-73 uses torchvision ColorJitter on 1/4 of
    folders). images: (B, H, W, 3) float 0-255."""
    kb, kc, ks = jax.random.split(key, 3)
    b = images.shape[0]
    x = images.astype(jnp.float32)
    fb = 1.0 + jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness,
                                  maxval=brightness)
    x = x * fb
    fc = 1.0 + jax.random.uniform(kc, (b, 1, 1, 1), minval=-contrast,
                                  maxval=contrast)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * fc + mean
    fs = 1.0 + jax.random.uniform(ks, (b, 1, 1, 1), minval=-saturation,
                                  maxval=saturation)
    gray = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - gray) * fs + gray
    return jnp.clip(x, 0.0, 255.0)


def bgr_to_rgb(images: jnp.ndarray) -> jnp.ndarray:
    """Color-order correction (reference perform_color_correction.py)."""
    return images[..., ::-1]


def mask_area_ok(mask: np.ndarray, min_area: int = 20,
                 max_area: int = 30000) -> bool:
    """Area gate used when packing the dataset (reference
    create_dataset.py:104-114 check_threshold)."""
    area = int(np.count_nonzero(mask))
    return min_area < area < max_area


# Verb classes excluded from the affordance dataset (the reference's
# invalid_verb_classes list, data_setup/filter_dataset.py:58).
EXCLUDED_VERBS = frozenset(
    "eat look search feel transition wait smell finish unfreeze".split())


def narration_ok(narration: str, verb: Optional[str] = None) -> bool:
    if not narration or narration in ("null", "None"):
        return False
    v = (verb or narration.split()[0]).lower()
    return v not in EXCLUDED_VERBS
