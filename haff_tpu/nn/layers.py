"""Shared small modules (reference: segment_anything/modeling/common.py,
mask_decoder.py MLP).

All spatial tensors are NHWC (TPU-idiomatic; the reference is NCHW).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class QDense(nn.Module):
    """Drop-in nn.Dense whose kernel may be int8-quantized in the params
    tree (quant.quantize_dense_tree adds a sibling 'scale' leaf). With a
    float kernel this is bit-identical to nn.Dense (same param names, so
    checkpoints/converters are unaffected); with an int8 kernel + scale
    it runs the W8A8 matmul (quant.int8_matmul) — int8 weights at rest
    in HBM, halved weight traffic (XLA's int8 dot does not raise the
    MXU rate on v5e; see tools/mxu_bench.py)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    kernel_axes: Optional[tuple] = None  # logical partitioning names

    @nn.compact
    def __call__(self, x, out_split=None):
        # out_split: optional tuple of output widths summing to features.
        # Returns a TUPLE of outputs, each computed as an independent dot
        # over the corresponding COLUMN slice of the same kernel (and of
        # its scale/bias). Param tree and checkpoint layout are exactly
        # those of the fused call; a column split leaves the K-reduction
        # untouched, so each piece equals the matching columns of the
        # fused output. Used by the SAM windowed-attention path to emit
        # q and kv as separate CONTIGUOUS operands (the band-table
        # einsum over a strided q slice of the fused (.., 3C) output
        # costs ~5x a contiguous read; see kernels/sam_attention.py).
        if out_split is not None:
            assert sum(out_split) == self.features, (out_split, self.features)
        # Packed-int4 kernels change the param SHAPE ((in/2, out) uint8 +
        # 2D group scales), so they must be read around self.param's
        # shape validation. W4A16: per-layer dequant fuses into the dot's
        # operand load — transient bf16 one layer at a time (a tree-level
        # dequant would hold the whole float model live across the jit,
        # which is exactly what 13B-on-16GB cannot afford).
        if not self.is_initializing() and self.has_variable("params", "kernel"):
            from flax.core import meta as flax_meta

            raw = self.get_variable("params", "kernel")
            if isinstance(raw, flax_meta.AxisMetadata):
                raw = raw.unbox()
            if getattr(raw, "dtype", None) == jnp.uint8:
                from .quant import int4_matmul

                scale = self.get_variable("params", "scale")
                if isinstance(scale, flax_meta.AxisMetadata):
                    scale = scale.unbox()
                group = (2 * raw.shape[0]) // scale.shape[0]
                bias = (self.param("bias", self.bias_init,
                                   (self.features,), self.param_dtype)
                        if self.use_bias else None)

                def int4_cols(lo, hi):
                    y = int4_matmul(x.astype(self.dtype), raw[:, lo:hi],
                                    scale[:, lo:hi], group=group,
                                    dtype=self.dtype)
                    if bias is not None:
                        y = y + bias[lo:hi].astype(self.dtype)
                    return y

                if out_split is None:
                    return int4_cols(0, self.features)
                outs, off = [], 0
                for w_ in out_split:
                    outs.append(int4_cols(off, off + w_))
                    off += w_
                return tuple(outs)
        kernel_init = self.kernel_init
        if self.kernel_axes is not None:
            kernel_init = nn.with_logical_partitioning(
                kernel_init, self.kernel_axes)
        kernel = self.param("kernel", kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        if out_split is not None:
            outs, off = [], 0
            for w_ in out_split:
                b_ = bias[off:off + w_] if bias is not None else None
                outs.append(self._dot(x, kernel[:, off:off + w_], b_,
                                      scale_cols=(off, off + w_)))
                off += w_
            return tuple(outs)
        return self._dot(x, kernel, bias, scale_cols=None)

    def _dot(self, x, kernel, bias, scale_cols):
        if (kernel.dtype == jnp.int8
                and self.has_variable("params", "scale")):
            import os

            from .quant import int8_matmul, quantized_matmul

            scale = self.get_variable("params", "scale")
            if scale_cols is not None:
                scale = scale[..., scale_cols[0]:scale_cols[1]]
            # HAFF_W8_COMPUTE=bf16 selects W8A16 (int8 weights at rest,
            # cast-to-bf16 dot, no activation-quant pass) over the W8A8
            # default. A/B on the SAM-H encoder bench (v5e-1, batch 24):
            # W8A8 17.07 fps vs W8A16 16.48 — int8 stays default. (An
            # isolated chained-dot microbench, tools/mxu_bench.py, shows
            # int8 dot_general <= bf16 rate, so the W8A8 edge here comes
            # from halved weight traffic in the fused encoder, not 2x
            # MXU FLOPs.)
            if os.environ.get("HAFF_W8_COMPUTE", "int8") == "bf16":
                y = quantized_matmul(x.astype(self.dtype), kernel, scale)
            else:
                y = int8_matmul(x.astype(self.dtype), kernel, scale,
                                dtype=self.dtype)
        else:
            xc = x.astype(self.dtype)
            y = jax.lax.dot_general(
                xc, kernel.astype(self.dtype),
                (((xc.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


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
        x = QDense(self.mlp_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                   name="lin1")(x)
        x = self.act(x)
        x = QDense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
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
