"""SAM mask decoder with the bimanual modifications.

Capability parity with reference segment_anything/modeling/mask_decoder.py:
iou token + 4 mask tokens, TwoWayTransformer, 2x transposed-conv upscaling,
per-token hypernetwork MLPs, IoU head, and — the 2HandedAfforder addition —
a 4-way taxonomy head (MLP 4*256 -> 4*256 -> 4, softmax) over the flattened
mask tokens when `taxonomy_on` (reference mask_decoder.py:75-77, 172-178).

The composite model instantiates this twice (left/right hands); the left
decoder carries the taxonomy head (reference build_sam.py:92-117).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import SamDecoderConfig
from .layers import ChannelLayerNorm, ReluMLP
from .two_way_transformer import TwoWayTransformer


class MaskDecoder(nn.Module):
    cfg: SamDecoderConfig
    taxonomy_on: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:
        return self.cfg.num_multimask_outputs + 1

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt_embeddings,
                 dense_prompt_embeddings, multimask_output: bool = False):
        """image_embeddings: (B, h, w, d) — already batched per prompt (the
        reference repeat-interleaves a single image across prompts; here the
        caller broadcasts). Returns (masks (B, n, 4h, 4w), iou (B, n)[,
        taxonomy (B, 4)])."""
        cfg = self.cfg
        d = cfg.prompt_embed_dim
        b = sparse_prompt_embeddings.shape[0]

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, d), self.param_dtype)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, d), self.param_dtype)
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b,) + output_tokens.shape).astype(self.dtype)
        tokens = jnp.concatenate(
            [output_tokens, sparse_prompt_embeddings.astype(self.dtype)], axis=1)

        src = image_embeddings.astype(self.dtype) + dense_prompt_embeddings.astype(self.dtype)
        hs, src_out = TwoWayTransformer(
            cfg=cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="transformer")(src, image_pe, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens, :]

        h, w = image_embeddings.shape[1:3]
        src_img = src_out.reshape(b, h, w, d)
        # Upscaling: ConvT(d->d/4, 2x) -> LN2d -> GELU -> ConvT(d/4->d/8, 2x) -> GELU
        # transpose_kernel=True reproduces torch ConvTranspose2d exactly
        # (verified numerically; kernel layout (kh, kw, out, in)).
        x = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             transpose_kernel=True,
                             name="upscale_conv1")(src_img)
        x = ChannelLayerNorm(param_dtype=self.param_dtype,
                             name="upscale_ln")(x)
        x = nn.gelu(x)
        x = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             transpose_kernel=True,
                             name="upscale_conv2")(x)
        upscaled = nn.gelu(x)  # (B, 4h, 4w, d/8)

        hyper_in = jnp.stack(
            [
                ReluMLP(hidden_dim=d, output_dim=d // 8, num_layers=3,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"hyper_mlps_{i}")(mask_tokens_out[:, i, :])
                for i in range(self.num_mask_tokens)
            ],
            axis=1)  # (B, n_tokens, d/8)

        uh, uw = upscaled.shape[1:3]
        masks = jnp.einsum(
            "bnc,bhwc->bnhw", hyper_in, upscaled,
            preferred_element_type=jnp.float32)  # (B, n_tokens, 4h, 4w)

        iou_pred = ReluMLP(
            hidden_dim=cfg.iou_head_hidden_dim,
            output_dim=self.num_mask_tokens, num_layers=cfg.iou_head_depth,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="iou_head")(iou_token_out)

        if multimask_output:
            masks_sel = masks[:, 1:, :, :]
            iou_sel = iou_pred[:, 1:]
        else:
            masks_sel = masks[:, 0:1, :, :]
            iou_sel = iou_pred[:, 0:1]

        if self.taxonomy_on:
            flat = mask_tokens_out.reshape(b, -1)
            tax_logits = ReluMLP(
                hidden_dim=d * self.num_mask_tokens,
                output_dim=cfg.taxonomy_classes, num_layers=3,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="taxonomy_embed")(flat)
            taxonomy = nn.softmax(tax_logits.astype(jnp.float32), axis=-1)
            return masks_sel, iou_sel, taxonomy
        return masks_sel, iou_sel
