"""Composite SAM with dual (left/right) mask decoders.

Capability parity with reference segment_anything/modeling/sam.py plus the
2HandedAfforder construction in build_sam.py:92-117 (`mask_decoder_left`
with taxonomy_on=True, `mask_decoder_right` without).

TPU-first deviations:
  * NHWC; one batched jitted forward (no per-image Python loop).
  * `postprocess_masks` keeps static shapes inside jit: low-res masks are
    upsampled to the padded square canvas; resizing to each frame's
    original resolution (dynamic shape) is a host-side utility
    (`resize_to_original`), mirroring reference sam.py:155-189 semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SamDecoderConfig, SamEncoderConfig
from .mask_decoder import MaskDecoder
from .prompt_encoder import PromptEncoder
from .sam_image_encoder import SamImageEncoder

# Reference sam.py pixel statistics (ImageNet, 0-255 scale).
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)


def preprocess_image(x: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """Normalize 0-255 RGB and pad bottom/right to a square canvas
    (reference: sam.py preprocess). x: (..., h, w, 3) with h, w <= image_size."""
    x = (x - PIXEL_MEAN) / PIXEL_STD
    h, w = x.shape[-3:-1]
    pad = [(0, 0)] * (x.ndim - 3) + [(0, image_size - h), (0, image_size - w), (0, 0)]
    return jnp.pad(x, pad)


class Sam(nn.Module):
    encoder_cfg: SamEncoderConfig
    decoder_cfg: SamDecoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        grid = self.encoder_cfg.grid_size
        self.image_encoder = SamImageEncoder(
            cfg=self.encoder_cfg, dtype=self.dtype,
            param_dtype=self.param_dtype, remat=self.remat)
        self.prompt_encoder = PromptEncoder(
            cfg=self.decoder_cfg,
            image_embedding_size=(grid, grid),
            input_image_size=(self.encoder_cfg.image_size,) * 2,
            dtype=self.dtype, param_dtype=self.param_dtype)
        self.mask_decoder_left = MaskDecoder(
            cfg=self.decoder_cfg, taxonomy_on=True, dtype=self.dtype,
            param_dtype=self.param_dtype)
        self.mask_decoder_right = MaskDecoder(
            cfg=self.decoder_cfg, taxonomy_on=False, dtype=self.dtype,
            param_dtype=self.param_dtype)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, S, S, 3) preprocessed pixels -> (B, g, g, 256)."""
        return self.image_encoder(images.astype(self.dtype))

    def decode_masks(self, image_embeddings: jnp.ndarray,
                     text_embeds: jnp.ndarray):
        """Prompted dual decode.

        image_embeddings: (B, g, g, 256); text_embeds: (B, T, 256).
        Returns (masks_left (B,1,4g,4g), masks_right (B,1,4g,4g),
                 iou_left (B,1), iou_right (B,1), taxonomy (B,4)).
        """
        sparse, dense = self.prompt_encoder(text_embeds=text_embeds)
        image_pe = self.prompt_encoder.get_dense_pe()[None]  # (1, g, g, d)
        masks_l, iou_l, taxonomy = self.mask_decoder_left(
            image_embeddings, image_pe, sparse, dense, multimask_output=False)
        masks_r, iou_r = self.mask_decoder_right(
            image_embeddings, image_pe, sparse, dense, multimask_output=False)
        return masks_l, masks_r, iou_l, iou_r, taxonomy

    def __call__(self, images, text_embeds):
        emb = self.encode_image(images)
        return self.decode_masks(emb, text_embeds)


def postprocess_masks_padded(low_res_masks: jnp.ndarray,
                             image_size: int) -> jnp.ndarray:
    """Upsample low-res logits (B, n, g*4, g*4) to the padded square canvas
    (B, n, image_size, image_size) — first half of reference sam.py
    postprocess_masks, static-shape so it stays inside jit."""
    b, n, h, w = low_res_masks.shape
    x = jax.image.resize(low_res_masks, (b, n, image_size, image_size),
                         method="bilinear")
    return x


def resize_to_original(canvas_masks: np.ndarray,
                       input_size: Tuple[int, int],
                       original_size: Tuple[int, int]) -> np.ndarray:
    """Host-side second half of reference sam.py postprocess_masks: crop the
    un-padded region then bilinear-resize to the frame's original size.

    canvas_masks: (n, S, S) float logits (numpy). Returns (n, H, W)."""
    import cv2

    ih, iw = input_size
    out = []
    for m in np.asarray(canvas_masks, dtype=np.float32):
        cropped = m[:ih, :iw]
        out.append(
            cv2.resize(cropped, (original_size[1], original_size[0]),
                       interpolation=cv2.INTER_LINEAR))
    return np.stack(out, axis=0)
