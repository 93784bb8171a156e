"""LoRA adapters.

Capability parity with the reference's PEFT LoRA wrap (reference:
train_ds.py:192-231): rank-r adapters on the LLM q/v projections only,
scaling alpha/r, optional input dropout. Implemented natively as extra
low-rank params inside the Dense scope — the trainable-parameter mask in
train/trainer.py replicates the reference's freezing exactly (LoRA +
embed_tokens + lm_head + both mask decoders + text projection trainable,
all else frozen)."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class LoraDense(nn.Module):
    features: int
    rank: int = 0
    alpha: float = 16.0
    dropout: float = 0.0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_axes: Optional[Tuple] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # QDense: bit-identical to nn.Dense with a float kernel; serves
        # int8 kernels (quantize_dense_tree) on the int8-MXU path.
        from .layers import QDense

        y = QDense(self.features, use_bias=self.use_bias,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   kernel_axes=self.kernel_axes, name="base")(x)
        if self.rank > 0:
            in_dim = x.shape[-1]
            a = self.param("lora_a", nn.initializers.he_uniform(),
                           (in_dim, self.rank), self.param_dtype)
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.rank, self.features), self.param_dtype)
            h = x
            if self.dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
            delta = (h.astype(self.dtype) @ a.astype(self.dtype)
                     ) @ b.astype(self.dtype)
            y = y + delta * (self.alpha / self.rank)
        return y


def is_lora_param(path: Tuple[str, ...]) -> bool:
    return any(p in ("lora_a", "lora_b") for p in path)
