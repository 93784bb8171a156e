"""Shared small modules (reference: segment_anything/modeling/common.py,
mask_decoder.py MLP).

All spatial tensors are NHWC (TPU-idiomatic; the reference is NCHW).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class ChannelLayerNorm(nn.Module):
    """SAM's LayerNorm2d: normalize over the channel axis only
    (reference: common.py LayerNorm2d). In NHWC this is an ordinary
    LayerNorm over the last axis."""

    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (dim,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class MLPBlock(nn.Module):
    """Transformer MLP: Linear -> GELU -> Linear (reference: common.py MLPBlock)."""

    mlp_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    act: Callable = nn.gelu

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="lin1")(x)
        x = self.act(x)
        x = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="lin2")(x)
        return x


class ReluMLP(nn.Module):
    """num_layers-deep MLP with ReLU between layers (reference:
    mask_decoder.py MLP; used for hypernetworks, IoU head, taxonomy head)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x
