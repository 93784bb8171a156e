"""Decode attention: single-token attention over a (possibly int8) KV
cache — the TPU-native stand-in for the reference's DeepSpeed
kernel-injection serving path (reference: inference.py:179-184 — N4 in
SURVEY.md section 2.6).

Measured on v5e (B8, 8k cache, 32q/8kv heads, hd128, 32-step scan):
XLA's fused decode attention runs at 396 us/step = ~80% of the pure
cache-streaming bound (327 us) — with the GQA head-repeat and the int8
dequant-cast FUSED, never materialized. Three Pallas variants (natural
layout, (B, nkv, L, hd) transposed layout, transpose-free dot_general)
all measured 500-980 us: with a single query row per head (M=1..4) the
MXU cannot amortize its tiles and the VPU softmax dominates. So unlike
prefill (where the Pallas flash kernel wins big), the DEFAULT decode
path here is the XLA formulation; the Pallas kernel is kept behind
`use_kernel=True` for future paged-cache layouts, verified by
tools/onchip_audit.py.

int8 caches (nn/quant.QuantArray: int8 values + per token-head scales)
halve the cache footprint; both paths dequantize without a materialized
full-precision copy.

GQA/MQA: query heads are grouped per kv head (nh % nkv == 0), matching
the MPT multiquery and LLaMA GQA layouts.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.quant import QuantArray

MIN_KERNEL_LEN = 1024


def _make_kernel(num_kb, sm_scale, nh, nkv, hd, quant):
    qpg = nh // nkv

    def kernel(*refs):
        if quant:
            (q_ref, k_ref, ks_ref, v_ref, vs_ref, mask_ref, o_ref,
             acc_ref, m_ref, l_ref) = refs
        else:
            (q_ref, k_ref, v_ref, mask_ref, o_ref,
             acc_ref, m_ref, l_ref) = refs
        ki = pl.program_id(1)

        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)

        blk = k_ref.shape[1]
        q = q_ref[0].astype(jnp.float32) * sm_scale      # (nh, hd)
        # k/v blocks arrive head-flattened (blk, nkv*hd); Mosaic needs
        # the last two block dims 8/128-aligned, which (nkv, hd) is not
        # for small nkv.
        k = k_ref[0].reshape(blk, nkv, hd)
        v = v_ref[0].reshape(blk, nkv, hd)
        if quant:
            ks = ks_ref[0][:nkv].astype(jnp.float32)      # (nkv, blk)
            vs = vs_ref[0][:nkv].astype(jnp.float32)
            k = k.astype(jnp.float32) * jnp.transpose(ks)[:, :, None]
            v = v.astype(jnp.float32) * jnp.transpose(vs)[:, :, None]
        k = jnp.transpose(k.astype(jnp.float32), (1, 0, 2))  # (nkv, blk, hd)
        v = jnp.transpose(v.astype(jnp.float32), (1, 0, 2))
        qg = q.reshape(nkv, qpg, hd)
        s = jax.lax.dot_general(
            qg, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (nkv, qpg, blk)
        live = mask_ref[0, 0, 0] > 0                      # (blk,)
        s = jnp.where(live[None, None, :], s, -jnp.inf)

        s2 = s.reshape(nh, blk)
        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        # All-masked blocks keep m = -inf; exp(-inf - -inf) guard:
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(s2), s2 - safe_m, -jnp.inf))
        alpha = jnp.where(jnp.isfinite(m_prev),
                          jnp.exp(m_prev - safe_m), 0.0)
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        pv = jax.lax.dot_general(
            p.reshape(nkv, qpg, blk), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (nkv, qpg, hd)
        acc_ref[:] = acc_ref[:] * alpha + pv.reshape(nh, hd)

        @pl.when(ki == num_kb - 1)
        def _finalize():
            denom = jnp.maximum(l_ref[:], 1e-30)
            o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)

    return kernel


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _kernel_path(q, k, v, kv_mask, sm_scale, block_k, interpret):
    b, nh, hd = q.shape
    quant = isinstance(k, QuantArray)
    lmax = (k.values if quant else k).shape[1]
    nkv = (k.values if quant else k).shape[2]

    block_k = min(block_k, lmax)
    while lmax % block_k:
        block_k //= 2
    num_kb = lmax // block_k

    kernel = _make_kernel(num_kb, sm_scale, nh, nkv, hd, quant)
    in_specs = [pl.BlockSpec((1, nh, hd), lambda g, kb: (g, 0, 0))]
    ops = [q]
    kv_spec = pl.BlockSpec((1, block_k, nkv * hd),
                           lambda g, kb: (g, kb, 0))
    # scales: (B, nkv_pad8, Lmax) f32 so block dims stay tile-aligned
    nkvp = _pad8(nkv)
    sc_spec = pl.BlockSpec((1, nkvp, block_k), lambda g, kb: (g, 0, kb))

    def prep_scales(sc):  # (B, Lmax, nkv, 1) -> (B, nkv_pad8, Lmax) f32
        sc = jnp.transpose(sc[..., 0], (0, 2, 1)).astype(jnp.float32)
        return jnp.pad(sc, ((0, 0), (0, nkvp - nkv), (0, 0)))

    if quant:
        in_specs += [kv_spec, sc_spec, kv_spec, sc_spec]
        ops += [k.values.reshape(b, lmax, nkv * hd), prep_scales(k.scales),
                v.values.reshape(b, lmax, nkv * hd), prep_scales(v.scales)]
    else:
        in_specs += [kv_spec, kv_spec]
        ops += [k.reshape(b, lmax, nkv * hd), v.reshape(b, lmax, nkv * hd)]
    # mask as (B, nkb, 1, block_k) so block dims are (1, block_k)
    in_specs.append(pl.BlockSpec((1, 1, 1, block_k),
                                 lambda g, kb: (g, kb, 0, 0)))
    ops.append(kv_mask.astype(jnp.int32).reshape(b, num_kb, 1, block_k))

    out = pl.pallas_call(
        kernel,
        grid=(b, num_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nh, hd), lambda g, kb: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nh, hd), jnp.float32),
            pltpu.VMEM((nh, 1), jnp.float32),
            pltpu.VMEM((nh, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*ops)
    return out


def _dequant_repeat(k, v, nh, dtype):
    """Dequantize an int8 cache and repeat kv heads for GQA/MQA —
    shared by the single-token XLA path and the chunked verify path so
    the two decode modes stay numerically identical (the speculative
    exactness contract, tests/test_speculative.py)."""
    if isinstance(k, QuantArray):
        from ..nn.quant import dequantize_activation

        k = dequantize_activation(k, dtype)
        v = dequantize_activation(v, dtype)
    nkv = k.shape[2]
    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    return k, v


def _xla_path(q, k, v, kv_mask, sm_scale):
    """Reference decode attention in XLA (also the fallback)."""
    b, nh, hd = q.shape
    k, v = _dequant_repeat(k, v, nh, q.dtype)
    s = jnp.einsum("bnd,blnd->bnl", q.astype(jnp.float32) * sm_scale,
                   k.astype(jnp.float32))
    s = jnp.where(kv_mask[:, None, :] > 0, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnl,blnd->bnd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def flash_decode_attention(
        q: jnp.ndarray,
        k_cache: Union[jnp.ndarray, QuantArray],
        v_cache: Union[jnp.ndarray, QuantArray],
        kv_mask: jnp.ndarray,
        sm_scale: Optional[float] = None,
        block_k: int = 512,
        use_kernel: bool = False,
        interpret: Optional[bool] = None) -> jnp.ndarray:
    """q (B, nh, hd) — ONE decode step's queries; k/v_cache
    (B, Lmax, nkv, hd) arrays or QuantArray with (B, Lmax, nkv, 1)
    scales; kv_mask (B, Lmax), 1 = live slot. Returns (B, nh, hd).

    Default path is XLA (measured faster than the Pallas variant at
    M=1 — see module docstring); `use_kernel=True` opts into the Pallas
    streaming kernel."""
    b, nh, hd = q.shape
    quant = isinstance(k_cache, QuantArray)
    lmax = (k_cache.values if quant else k_cache).shape[1]
    if sm_scale is None:
        sm_scale = hd ** -0.5
    small = lmax < MIN_KERNEL_LEN or hd % 128 != 0 or nh % 8 != 0
    if not use_kernel or small:
        return _xla_path(q, k_cache, v_cache, kv_mask, sm_scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _kernel_path(q, k_cache, v_cache, kv_mask, sm_scale, block_k,
                        interpret)


def chunk_decode_attention(
        q: jnp.ndarray,
        k_cache: Union[jnp.ndarray, QuantArray],
        v_cache: Union[jnp.ndarray, QuantArray],
        kv_mask: jnp.ndarray,
        q_positions: jnp.ndarray,
        sm_scale: Optional[float] = None) -> jnp.ndarray:
    """Multi-token decode ("verify") attention over the KV cache — the
    speculative-decoding counterpart of flash_decode_attention: a chunk
    of D draft tokens (already written into the cache at per-row
    offsets) attends over every live cache slot up to its own position.

    q (B, D, nh, hd); k/v_cache (B, Lmax, nkv, hd) or QuantArray;
    kv_mask (B, Lmax) 1 = live slot INCLUDING the chunk's slots;
    q_positions (B, D) absolute token positions of the chunk (cache
    slot j holds token position j, so causality is `slot <= position`).
    Returns (B, D, nh, hd).

    XLA-only: D is small (4-16) and Lmax a few hundred for the serving
    shapes this targets, so the (B, nh, D, Lmax) score tensor is tiny;
    the int8 dequant-cast and GQA repeat fuse exactly as in _xla_path.
    """
    b, d, nh, hd = q.shape
    if sm_scale is None:
        sm_scale = hd ** -0.5
    k_cache, v_cache = _dequant_repeat(k_cache, v_cache, nh, q.dtype)
    lmax = k_cache.shape[1]
    s = jnp.einsum("bdnh,blnh->bndl", q.astype(jnp.float32) * sm_scale,
                   k_cache.astype(jnp.float32))
    slots = jnp.arange(lmax)
    visible = ((kv_mask[:, None, :] > 0)
               & (slots[None, None, :] <= q_positions[:, :, None]))
    s = jnp.where(visible[:, None, :, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bndl,blnh->bdnh", p, v_cache.astype(jnp.float32))
    return out.astype(q.dtype)
