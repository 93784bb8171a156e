"""Weight-only int8 quantization for serving.

TPU-native replacement for the reference's bitsandbytes 4/8-bit CUDA
path (reference: inference.py:133-156, skipping visual_model — N5 in
SURVEY.md section 2.6). Per-output-channel symmetric int8: kernels are
stored as int8 + an f32 scale row; the matmul runs with the int8 weights
cast to the compute dtype at load (XLA fuses the cast into the dot), so
HBM weight traffic and footprint drop 2x vs bf16 / 4x vs f32.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util


class QuantArray(NamedTuple):
    """int8 values + broadcastable f32 scales; a pytree, so it flows
    through lax.scan carries (used for the int8 KV cache)."""

    values: jnp.ndarray
    scales: jnp.ndarray


def quantize_activation(x: jnp.ndarray, axis: int = -1) -> QuantArray:
    """Symmetric per-slice int8 over `axis` (e.g. per token-head for KV
    cache entries: head_dim is the reduced axis)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return QuantArray(values=q, scales=scale)


def dequantize_activation(qa: QuantArray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qa.values.astype(jnp.float32) * qa.scales).astype(dtype)


def quantize_kernel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) kernel -> (int8 values (in, out), f32 scales (out,))."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_kernel(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantized_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray
                     ) -> jnp.ndarray:
    """x (.., in) @ int8 kernel with per-column scales; the int8->compute
    cast happens at the dot's operand load (weight HBM traffic is int8)."""
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def _unboxed(v):
    """Param leaves may be flax AxisMetadata boxes (LogicallyPartitioned
    sharding annotations); read through them."""
    from flax.core import meta

    return v.unbox() if isinstance(v, meta.AxisMetadata) else v


def _rebox(template, value):
    from flax.core import meta

    if isinstance(template, meta.AxisMetadata):
        return template.replace_boxed(value)
    return value


def quantize_tree(params: Dict,
                  should_quantize: Callable[[Tuple[str, ...]], bool]
                  ) -> Tuple[Dict, Dict]:
    """Quantize selected 2D kernels in a param tree (boxed or raw).

    Returns (new_params, qinfo) where quantized kernels are replaced by
    int8 arrays and qinfo maps the same flattened keys to scales. The
    serving wrapper (apply_quantized) dequantizes lazily per layer."""
    flat = dict(traverse_util.flatten_dict(params))
    scales = {}
    for k, v in list(flat.items()):
        arr = _unboxed(v)
        if (k[-1] == "kernel" and getattr(arr, "ndim", 0) == 2
                and should_quantize(k)):
            q, s = quantize_kernel(arr)
            flat[k] = _rebox(v, q)
            scales[k] = s
    return traverse_util.unflatten_dict(flat), scales


def dequantize_tree(params: Dict, scales: Dict,
                    dtype=jnp.bfloat16) -> Dict:
    """Materialize compute-dtype kernels from an int8 tree (inside jit,
    XLA keeps weights int8 in HBM and fuses the casts)."""
    flat = dict(traverse_util.flatten_dict(params))
    for k, s in scales.items():
        v = flat[k]
        flat[k] = _rebox(v, dequantize_kernel(_unboxed(v), s, dtype))
    return traverse_util.unflatten_dict(flat)


def default_llm_predicate(path: Tuple[str, ...]) -> bool:
    """Quantize LLM projections; skip the visual model and embeddings
    (reference skips visual_model for bnb too, inference.py:141-150)."""
    p = set(path)
    if "visual_model" in p or "vision_tower" in p or "embed_tokens" in p:
        return False
    return any(n in p for n in (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
        "down_proj", "lm_head", "Wqkv", "out_proj"))


def make_quantized_apply(model, params: Dict, dtype=jnp.bfloat16,
                         predicate: Callable = default_llm_predicate):
    """Returns (qparams, apply_fn) where apply_fn(qparams, *args, **kw)
    dequantizes inside jit then runs model.apply — int8 at rest and in
    HBM, compute in `dtype`."""
    qparams, scales = quantize_tree(params, predicate)

    def apply_fn(qp, *args, **kwargs):
        full = dequantize_tree(qp, scales, dtype)
        return model.apply({"params": full}, *args, **kwargs)

    return qparams, apply_fn
