"""Dtype policy.

Compute in bfloat16 on the MXU, keep parameters and loss accumulation in
float32 (reference trains fp16/bf16 under DeepSpeed with fp32 master
weights; train_ds.py:355-371).
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}


def resolve(name_or_dtype):
    if isinstance(name_or_dtype, str):
        return _DTYPES[name_or_dtype]
    return name_or_dtype
