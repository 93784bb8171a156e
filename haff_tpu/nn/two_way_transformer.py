"""TwoWayTransformer: bidirectional token<->image attention
(reference: segment_anything/modeling/transformer.py; depth 2, dim 256,
8 heads, mlp 2048, attention downsample rate 2).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import SamDecoderConfig
from .layers import MLPBlock


class DownsampledAttention(nn.Module):
    """MHA whose internal width is embedding_dim // downsample_rate
    (reference: transformer.py Attention)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embedding_dim // self.downsample_rate
        hd = d // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            d, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense("q_proj")(q)
        k = dense("k_proj")(k)
        v = dense("v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, hd)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("blnd,bmnd->bnlm", q / (hd ** 0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnlm,bmnd->blnd", probs.astype(self.dtype), v)
        out = out.reshape(out.shape[0], out.shape[1], d)
        return nn.Dense(self.embedding_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    cfg: SamDecoderConfig
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        d, nh = cfg.prompt_embed_dim, cfg.transformer_num_heads
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name)

        # Self-attention on tokens.
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(
                embedding_dim=d, num_heads=nh, dtype=self.dtype,
                param_dtype=self.param_dtype, name="self_attn")(
                    queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = DownsampledAttention(
                embedding_dim=d, num_heads=nh, dtype=self.dtype,
                param_dtype=self.param_dtype, name="self_attn")(q, q, queries)
            queries = queries + attn_out
        queries = ln("norm1")(queries).astype(self.dtype)

        # Cross: tokens -> image.
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            embedding_dim=d, num_heads=nh,
            downsample_rate=cfg.attention_downsample_rate, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = ln("norm2")(queries).astype(self.dtype)

        # MLP on tokens.
        mlp_out = MLPBlock(cfg.transformer_mlp_dim, dtype=self.dtype,
                           param_dtype=self.param_dtype, act=nn.relu,
                           name="mlp")(queries)
        queries = queries + mlp_out
        queries = ln("norm3")(queries).astype(self.dtype)

        # Cross: image -> tokens.
        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            embedding_dim=d, num_heads=nh,
            downsample_rate=cfg.attention_downsample_rate, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = keys + attn_out
        keys = ln("norm4")(keys).astype(self.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: SamDecoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, h, w, d); point_embedding: (B, N, d).

        Returns (queries (B, N, d), keys (B, h*w, d)).
        """
        cfg = self.cfg
        b, h, w, d = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, d).astype(self.dtype)
        key_pe = image_pe.reshape(b if image_pe.shape[0] == b else 1, h * w, d)
        key_pe = jnp.broadcast_to(key_pe, (b, h * w, d)).astype(self.dtype)
        queries = point_embedding.astype(self.dtype)
        query_pe = point_embedding.astype(self.dtype)

        for i in range(cfg.transformer_depth):
            queries, keys = TwoWayAttentionBlock(
                cfg=cfg, skip_first_layer_pe=(i == 0), dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layers_{i}")(
                    queries, keys, query_pe, key_pe)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampledAttention(
            embedding_dim=d, num_heads=cfg.transformer_num_heads,
            downsample_rate=cfg.attention_downsample_rate, dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(
            dtype=jnp.float32, param_dtype=self.param_dtype,
            name="norm_final_attn")(queries).astype(self.dtype)
        return queries, keys
