"""Image preprocessing: SAM resize-longest-side + pad, CLIP resize/crop.

Capability parity with reference segment_anything/utils/transforms.py
(ResizeLongestSide) and the HF CLIPImageProcessor path used in
aff_dataset.py:228-251. Host-side versions use cv2/numpy (data loader);
`device_preprocess_*` are jittable equivalents for the streaming video
path (BASELINE config 3), where frames go to HBM raw and resize/pad/
normalize run on-device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..nn.clip_vit import CLIP_MEAN, CLIP_STD
from ..nn.sam import PIXEL_MEAN, PIXEL_STD


def get_preprocess_shape(h: int, w: int, long_side: int) -> Tuple[int, int]:
    """Output (h, w) with the longest side == long_side (reference:
    transforms.py:102-113 — int(side * scale + 0.5))."""
    scale = long_side * 1.0 / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


def resize_longest_side(image: np.ndarray, long_side: int) -> np.ndarray:
    """PIL bilinear (antialiased) — the reference resizes through
    torchvision's to_pil_image + resize (transforms.py:30-34), whose
    pixel math differs from cv2.INTER_LINEAR on downscale."""
    from PIL import Image

    h, w = image.shape[:2]
    nh, nw = get_preprocess_shape(h, w, long_side)
    return np.asarray(Image.fromarray(image).resize(
        (nw, nh), Image.BILINEAR))


def sam_preprocess(image: np.ndarray, image_size: int = 1024):
    """uint8 RGB (H, W, 3) -> (image_size, image_size, 3) f32 normalized +
    zero-padded bottom/right; returns (canvas, (resize_h, resize_w)).

    HAFF_NATIVE_PREPROCESS=1 dispatches to the fused C++ path
    (runtime/haff_host.cpp) for hosts where the loader starves the chip.
    Its resampling is cv2.INTER_LINEAR-style (no antialias), so downscale
    pixels differ slightly from the PIL/torchvision default — keep the
    default for checkpoint-parity evaluation."""
    import os

    if os.environ.get("HAFF_NATIVE_PREPROCESS") == "1" and image.dtype == np.uint8:
        from . import native

        if native.available():
            return native.sam_preprocess_native(image, image_size,
                                                PIXEL_MEAN, PIXEL_STD)
    resized = resize_longest_side(image, image_size).astype(np.float32)
    resized = (resized - PIXEL_MEAN) / PIXEL_STD
    h, w = resized.shape[:2]
    canvas = np.zeros((image_size, image_size, 3), np.float32)
    canvas[:h, :w] = resized
    return canvas, (h, w)


def clip_preprocess(image: np.ndarray, image_size: int = 224) -> np.ndarray:
    """uint8 RGB -> (image_size, image_size, 3) f32, HF CLIPImageProcessor
    semantics: PIL-bicubic resize of the SHORT side to image_size (the
    long side is int-TRUNCATED, matching transformers'
    get_resize_output_image_size), center crop, scale 1/255, normalize
    with CLIP stats.

    HAFF_NATIVE_PREPROCESS=1 dispatches to the fused C++ path, which
    reproduces PIL's resampler (antialias, separable passes with
    intermediate uint8 rounding) and resamples only crop-region output
    pixels; agreement is within 1 LSB of PIL's fixed-point rounding."""
    import os

    if (os.environ.get("HAFF_NATIVE_PREPROCESS") == "1"
            and image.dtype == np.uint8):
        from . import native

        if native.available():
            return native.clip_preprocess_native(image, image_size,
                                                 CLIP_MEAN, CLIP_STD)
    from PIL import Image

    h, w = image.shape[:2]
    if h <= w:
        nh, nw = image_size, int(image_size * w / h)
    else:
        nh, nw = int(image_size * h / w), image_size
    resized = np.asarray(Image.fromarray(image).resize(
        (nw, nh), Image.BICUBIC))
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    crop = resized[top:top + image_size, left:left + image_size]
    x = crop.astype(np.float32) / 255.0
    return (x - np.array(CLIP_MEAN, np.float32)) / np.array(
        CLIP_STD, np.float32)


def mask_to_canvas(mask: np.ndarray, resize_hw: Tuple[int, int],
                   image_size: int = 1024) -> np.ndarray:
    """Binary GT mask at original resolution -> the SAM padded canvas
    (nearest resize keeps it binary). Loss parity note: the reference
    resizes PREDICTIONS to GT resolution instead; both compare pred and
    GT on a common grid, here the static-shape one."""
    import cv2

    h, w = resize_hw
    resized = cv2.resize(mask.astype(np.uint8), (w, h),
                         interpolation=cv2.INTER_NEAREST)
    canvas = np.zeros((image_size, image_size), np.float32)
    canvas[:h, :w] = resized
    return canvas


def valid_region(resize_hw: Tuple[int, int], image_size: int = 1024):
    h, w = resize_hw
    m = np.zeros((image_size, image_size), np.float32)
    m[:h, :w] = 1.0
    return m


# --------------------------- device-side (jittable) ----------------------

def device_sam_preprocess(frames, image_size: int = 1024,
                          resize_hw: Tuple[int, int] = None):
    """Jittable SAM preprocessing for the streaming path: frames
    (B, H, W, 3) uint8/f32 with a STATIC input size -> normalized padded
    canvas + the (static) resize shape. Runs on-device, fused by XLA."""
    import jax.numpy as jnp

    h, w = frames.shape[1:3]
    nh, nw = resize_hw or get_preprocess_shape(h, w, image_size)
    import jax

    x = jax.image.resize(frames.astype(jnp.float32),
                         (frames.shape[0], nh, nw, 3), method="bilinear")
    x = (x - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
    x = jnp.pad(x, ((0, 0), (0, image_size - nh), (0, image_size - nw),
                    (0, 0)))
    return x, (nh, nw)


def device_clip_preprocess(frames, image_size: int = 224):
    """Jittable CLIP preprocessing: short-side resize + center crop."""
    import jax
    import jax.numpy as jnp

    b, h, w, _ = frames.shape
    scale = image_size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    x = jax.image.resize(frames.astype(jnp.float32), (b, nh, nw, 3),
                         method="bilinear")
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    x = x[:, top:top + image_size, left:left + image_size]
    x = x / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
