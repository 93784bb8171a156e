"""SAM prompt encoder: point / box / mask / text prompts.

Capability parity with reference segment_anything/modeling/prompt_encoder.py,
including the text-embedding path LISA drives (text_embeds concatenated into
the sparse embeddings; reference prompt_encoder.py:176-177) and the
no_mask_embed dense fallback. NHWC layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SamDecoderConfig
from .layers import ChannelLayerNorm


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier-feature positional encoding
    (reference: prompt_encoder.py PositionEmbeddingRandom)."""

    num_pos_feats: int = 128
    scale: float = 1.0
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        # A fixed (non-trainable in reference: registered buffer) Gaussian
        # matrix; stored as a param so checkpoints can carry the reference's.
        self.gaussian = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key, shape, dtype: self.scale
            * jax.random.normal(key, shape, dtype),
            (2, self.num_pos_feats), self.param_dtype)

    def _encode(self, coords):  # coords in [0, 1], (..., 2)
        coords = 2.0 * coords.astype(jnp.float32) - 1.0
        coords = coords @ self.gaussian.astype(jnp.float32)
        coords = 2.0 * np.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def grid(self, h: int, w: int):
        """Dense PE over an h x w grid -> (h, w, 2*num_pos_feats)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) = (x, y)
        return self._encode(grid)

    def with_coords(self, coords, image_size: Tuple[int, int]):
        """coords (..., 2) as (x, y) pixels -> PE."""
        scaled = jnp.stack(
            [coords[..., 0] / image_size[1], coords[..., 1] / image_size[0]],
            axis=-1)
        return self._encode(scaled)


class PromptEncoder(nn.Module):
    cfg: SamDecoderConfig
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.cfg.prompt_embed_dim
        self.pe_layer = PositionEmbeddingRandom(
            num_pos_feats=d // 2, param_dtype=self.param_dtype)
        # 4 point embeddings: neg point, pos point, box corner 1, box corner 2.
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, d),
            self.param_dtype)
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, d),
            self.param_dtype)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, d),
            self.param_dtype)
        c = self.cfg.mask_in_chans
        self.mask_down = [
            nn.Conv(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mask_conv1"),
            ChannelLayerNorm(param_dtype=self.param_dtype, name="mask_ln1"),
            nn.Conv(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mask_conv2"),
            ChannelLayerNorm(param_dtype=self.param_dtype, name="mask_ln2"),
            nn.Conv(d, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mask_conv3"),
        ]

    def get_dense_pe(self):
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)  # (h, w, d)

    def _embed_points(self, points, labels, pad: bool):
        points = points + 0.5  # shift to pixel center
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros_like(points[:, :1])], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones_like(labels[:, :1])], axis=1)
        pe = self.pe_layer.with_coords(points, self.input_image_size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point_embed[0], 0.0)
        pe = pe + jnp.where(lab == 0, self.point_embeddings[0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embeddings[1], 0.0)
        return pe.astype(self.dtype)

    def _embed_boxes(self, boxes):
        boxes = boxes + 0.5
        corners = boxes.reshape(-1, 2, 2)
        pe = self.pe_layer.with_coords(corners, self.input_image_size)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3])
        return pe.astype(self.dtype)

    def _embed_masks(self, masks):  # (B, H, W, 1)
        x = masks
        for i, layer in enumerate(self.mask_down):
            x = layer(x)
            if i in (1, 3):
                x = nn.gelu(x)
        return x  # (B, h, w, d)

    def __call__(self, points=None, boxes=None, masks=None, text_embeds=None):
        """Returns (sparse (B, N, d), dense (B, h, w, d))."""
        if self.is_initializing() and masks is None:
            # flax creates params lazily; make sure the mask-downscaling
            # convs exist even when the init call uses no mask prompt.
            h, w = self.image_embedding_size
            self._embed_masks(jnp.zeros((1, 4 * h, 4 * w, 1), self.dtype))
        bs = None
        sparse_parts = []
        if points is not None:
            coords, labels = points
            bs = coords.shape[0]
            sparse_parts.append(
                self._embed_points(coords, labels, pad=boxes is None))
        if boxes is not None:
            bs = boxes.shape[0] if bs is None else bs
            sparse_parts.append(self._embed_boxes(boxes).reshape(bs, -1, self.cfg.prompt_embed_dim))
        if text_embeds is not None:
            bs = text_embeds.shape[0] if bs is None else bs
            sparse_parts.append(text_embeds.astype(self.dtype))
        if masks is not None:
            bs = masks.shape[0] if bs is None else bs
        if bs is None:
            bs = 1
        if sparse_parts:
            sparse = jnp.concatenate(sparse_parts, axis=1)
        else:
            sparse = jnp.zeros((bs, 0, self.cfg.prompt_embed_dim), self.dtype)

        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[0].astype(self.dtype),
                (bs, h, w, self.cfg.prompt_embed_dim))
        return sparse, dense
