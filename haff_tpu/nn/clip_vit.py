"""CLIP ViT vision tower (openai/clip-vit-large-patch14 layout).

Capability parity with reference llava/model/multimodal_encoder/
clip_encoder.py: frozen CLIPVisionModel, feature_select = hidden_states at
select_layer (-2), patch tokens only (class token dropped).

TPU-first notes: because only hidden_states[-2] is consumed, the last
transformer layer and the post-layernorm are never computed (the reference
runs them and throws the result away). QuickGELU (x * sigmoid(1.702 x))
matches OpenAI CLIP exactly. One batched jitted call.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ClipVisionConfig


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, L, E)
        cfg = self.cfg
        b, l, e = x.shape
        hd = e // cfg.num_heads
        dense = lambda n, name: nn.Dense(  # noqa: E731
            n, use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)
        q = dense(e, "q_proj")(x).reshape(b, l, cfg.num_heads, hd)
        k = dense(e, "k_proj")(x).reshape(b, l, cfg.num_heads, hd)
        v = dense(e, "v_proj")(x).reshape(b, l, cfg.num_heads, hd)
        logits = jnp.einsum("blnd,bmnd->bnlm", q * (hd ** -0.5), k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnlm,bmnd->blnd", probs.astype(self.dtype), v)
        return dense(e, "out_proj")(out.reshape(b, l, e))


class ClipLayer(nn.Module):
    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=self.param_dtype, name=name)
        x = x + ClipAttention(cfg=cfg, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="self_attn")(ln("layer_norm1")(x).astype(self.dtype))
        h = ln("layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        return x + h


class ClipVisionTower(nn.Module):
    """Returns patch-token features from hidden_states[select_layer]
    (B, num_patches, hidden)."""

    cfg: ClipVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):  # (B, image_size, image_size, 3), normalized
        cfg = self.cfg
        b = pixels.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embedding")(pixels.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size),
                         self.param_dtype)
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="pre_layrnorm")(x).astype(self.dtype)

        # hidden_states[select_layer]: with HF's (embeddings, layer_1, ...,
        # layer_N) convention, select_layer=-2 is the output of layer N-1 —
        # so only N-1 layers are computed here.
        num_run = cfg.num_layers + cfg.select_layer + 1
        assert 0 < num_run <= cfg.num_layers
        for i in range(num_run):
            x = ClipLayer(cfg=cfg, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"layers_{i}")(x)
        return x[:, 1:, :]  # drop class token (feature_select "patch")


# CLIP preprocessing statistics (OpenAI checkpoints).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
