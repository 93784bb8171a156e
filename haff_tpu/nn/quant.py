"""Weight-only int8 quantization for serving.

TPU-native replacement for the reference's bitsandbytes 4/8-bit CUDA
path (reference: inference.py:133-156, skipping visual_model — N5 in
SURVEY.md section 2.6). Per-output-channel symmetric int8: kernels are
stored as int8 + an f32 scale row; the matmul runs with the int8 weights
cast to the compute dtype at load (XLA fuses the cast into the dot), so
HBM weight traffic and footprint drop 2x vs bf16 / 4x vs f32.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _w8a8_kernel(xq_ref, w_ref, sx_ref, sw_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    sx = sx_ref[...][:, :1]          # (BM, 1) f32 (col 0 of the tile)
    sw = sw_ref[...][:1, :]          # (1, BN) f32 (row 0 of the pad-8)
    o_ref[...] = (acc.astype(jnp.float32) * sx * sw).astype(o_ref.dtype)


def pallas_int8_matmul(xq: jnp.ndarray, q: jnp.ndarray, s_x: jnp.ndarray,
                       scale: jnp.ndarray, dtype=jnp.bfloat16,
                       bm: int = 256, bn: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """int8 x int8 -> int32 tiled Pallas matmul with fused dual rescale.

    xq (M, K) int8 activations, q (K, N) int8 kernel, s_x (M, 1) f32
    per-token activation scales, scale (N,) f32 per-channel weight
    scales. Scale operands ride as sublane/lane-aligned tiles ((M, 128)
    broadcast / (8, N) broadcast) because Mosaic blocks need 8/128-
    aligned trailing dims; the broadcast traffic is ~0.1% of the weight
    bytes."""
    from jax.experimental import pallas as pl

    M, K = xq.shape
    N = q.shape[1]
    if M == 0:
        return jnp.zeros((0, N), dtype)
    mp = (-M) % bm
    if mp:
        xq = jnp.pad(xq, ((0, mp), (0, 0)))
        s_x = jnp.pad(s_x, ((0, mp), (0, 0)), constant_values=1.0)
    npad = (-N) % bn
    if npad:
        q = jnp.pad(q, ((0, 0), (0, npad)))
        scale = jnp.pad(scale, (0, npad))
    Mp, Np = M + mp, N + npad
    sx_t = jnp.broadcast_to(s_x, (Mp, 128))
    sw_t = jnp.broadcast_to(scale[None, :], (8, Np))
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
            pl.BlockSpec((bm, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((8, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), dtype),
        interpret=interpret,
    )(xq, q, sx_t, sw_t)
    return out[:M, :N]


def _unpack_int4(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed bytes -> (lo, hi) signed int32 nibble planes (the inverse
    of quantize_kernel_int4's `lo | hi << 4`). Shared by the XLA dequant
    and the Pallas kernel so the packing convention lives in one place."""
    p = p.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return lo, hi


def _w4a16_kernel(xa_ref, xb_ref, p_ref, sc_ref, o_ref, acc_ref, *,
                  g2: int, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_int4(p_ref[...])           # (bk2, bn) nibble planes
    k2, bn = lo.shape
    ng = k2 // g2
    sc = sc_ref[...][:ng]                       # (ng, bn) f32 (sublane pad-8)
    dt = xa_ref.dtype
    wlo = (lo.reshape(ng, g2, bn) * sc[:, None, :]).reshape(k2, bn).astype(dt)
    whi = (hi.reshape(ng, g2, bn) * sc[:, None, :]).reshape(k2, bn).astype(dt)
    acc = jax.lax.dot_general(xa_ref[...], wlo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xb_ref[...], whi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + acc

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[...] = acc_ref[:].astype(o_ref.dtype)


def pallas_int4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                       scale: jnp.ndarray, group: int = 64,
                       dtype=jnp.bfloat16, bm: int = 256, bn: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused W4A16 matmul: nibbles unpack INSIDE the kernel, so weight
    HBM traffic stays packed-int4 (0.5 byte/elem). The XLA per-layer
    dequant path (QDense uint8 branch) either re-dequantizes every scan
    step or — if XLA hoists the loop-invariant dequant out of a decode
    scan — materializes the full bf16 weight matrix; both lose int4's
    traffic/footprint advantage exactly where it matters (13B decode is
    weight-bound). Reference analog: bitsandbytes fused 4-bit CUDA
    kernels (inference.py:133-156).

    x (M, K) float activations; packed (K/2, N) uint8 with row r holding
    K-rows 2r (lo nibble) / 2r+1 (hi nibble) — quantize_kernel_int4's
    layout; scale (K/group, N) f32 group scales. The interleave never
    happens on-chip: x splits even/odd K outside the kernel and the two
    halves hit the MXU as separate dots against the lo/hi nibble planes
    (rows 2r and 2r+1 share a group since group is even, so one expanded
    scale tile serves both).

    K is tiled (innermost grid dim, f32 accumulator scratch): the
    in-kernel int32 unpack intermediates are (bk2, bn) — untiled, 13B's
    down_proj (K2=6912) needs ~14 MB of VMEM for lo+hi alone and blows
    the 16 MB scoped-vmem limit (observed at prefill AND decode; the
    intermediates are M-independent)."""
    from jax.experimental import pallas as pl
    from functools import partial

    M, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2 and group % 16 == 0 and K % group == 0, (
        x.shape, packed.shape, group)
    g2 = group // 2
    ng = K2 // g2
    if M == 0:
        return jnp.zeros((0, N), dtype)
    xa = x[:, 0::2].astype(dtype)               # (M, K2) even K-rows
    xb = x[:, 1::2].astype(dtype)
    bm = min(bm, max(8, M + (-M) % 8))
    mp = (-M) % bm
    if mp:
        xa = jnp.pad(xa, ((0, mp), (0, 0)))
        xb = jnp.pad(xb, ((0, mp), (0, 0)))
    npad = (-N) % bn
    if npad:
        packed = jnp.pad(packed, ((0, 0), (0, npad)))
        scale = jnp.pad(scale, ((0, 0), (0, npad)), constant_values=1.0)
    # K block: largest divisor of K2 that fits the per-step VMEM budget
    # and keeps whole (8-sublane-aligned) scale-group blocks. Budget
    # model per K element of a step: packed u8 double-buffered (2·bn) +
    # int32 unpack intermediates (8·bn) + bf16 dequant planes (4·bn) +
    # xa/xb bf16 double-buffered (8·bm); ~10 MB of the 16 MB scoped
    # VMEM is left after the (bm, bn) accumulator/output. Bigger blocks
    # matter at decode (fewer grid steps, measured 1.04 vs 2.2 ms at
    # (8, 5120, 13824) for nk=1 vs nk=5); the cap keeps 13B's down_proj
    # (K2=6912) from blowing scoped VMEM. Falls back to one K block
    # with a padded scale tile when K2 is small or indivisible.
    cap = int(10e6 // (14 * bn + 8 * bm))
    cap -= cap % (8 * g2)
    bk2 = 0
    for cand in range(min(K2, max(cap, 8 * g2)), 0, -8 * g2):
        if cand % (8 * g2) == 0 and K2 % cand == 0:
            bk2 = cand
            break
    if bk2:
        nk = K2 // bk2
        ngb = bk2 // g2
        sc = scale.astype(jnp.float32)
    else:
        nk = 1
        bk2 = K2
        ngb = ng + ((-ng) % 8)                  # Mosaic sublane alignment
        sc = jnp.pad(scale, ((0, ngb - ng), (0, 0)),
                     constant_values=1.0).astype(jnp.float32)
    Mp, Np = M + mp, N + npad
    out = pl.pallas_call(
        partial(_w4a16_kernel, g2=g2, nk=nk),
        grid=(Mp // bm, Np // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk2), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk2, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((ngb, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(xa, xb, packed, sc)
    return out[:M, :N]


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                group: int, dtype=None) -> jnp.ndarray:
    """W4A16 matmul on a packed-int4 kernel.

    Regime-split dispatch on tpu/axon: SMALL M (decode steps, verify
    chunks — weight-streaming bound) takes the fused Pallas kernel
    (packed weight HBM traffic): 0.95 vs 1.50 ms (XLA bitcast) vs
    5.6 ms (old XLA int32-unpack dequant, which made 13B int4 serving
    decode-bound at 0.295 fps e2e) at the 13B decode shape
    (8, 5120, 13824), scalar-readback timing on v5e. LARGE M (prefill,
    batched eval — MXU bound) takes the XLA path: 4.62 ms vs 5.06
    Pallas vs 4.38 pure-bf16 floor at (2304, 5120, 13824); the Pallas
    kernel re-reads and re-unpacks weights once per M tile, so its edge
    inverts as M grows. HAFF_INT4_PALLAS=0 forces XLA everywhere, =1
    forces Pallas everywhere (interpret mode off-TPU, used by tests).

    The XLA path is the bitcast-plane formulation: packed bytes bitcast
    to native s4 nibble planes (element 0 = even in-row, 1 = odd — no
    interleave relayout), activations split even/odd along K, two dots.
    Scale math in f32 matches dequantize_kernel_int4 bit-for-bit."""
    import os

    dtype = dtype or x.dtype
    K2, N = packed.shape
    g2 = group // 2
    mode = os.environ.get("HAFF_INT4_PALLAS", "")
    eligible = group % 16 == 0 and K2 % g2 == 0
    m_flat = int(np.prod(x.shape[:-1]))
    small_m = m_flat <= 256
    if eligible and (mode == "1" or (mode != "0" and small_m
                                     and jax.default_backend()
                                     in ("tpu", "axon"))):
        lead = x.shape[:-1]
        y = pallas_int4_matmul(
            x.reshape(-1, 2 * K2), packed, scale,
            group=group, dtype=dtype,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        return y.reshape(*lead, N)
    ng = K2 // g2
    w4 = jax.lax.bitcast_convert_type(packed, jnp.int4)   # (K2, N, 2)
    sc = scale[:, None, :].astype(jnp.float32)
    wlo = (w4[..., 0].astype(jnp.float32).reshape(ng, g2, N)
           * sc).reshape(K2, N).astype(dtype)
    whi = (w4[..., 1].astype(jnp.float32).reshape(ng, g2, N)
           * sc).reshape(K2, N).astype(dtype)
    xa = x[..., 0::2].astype(dtype)
    xb = x[..., 1::2].astype(dtype)
    nd = xa.ndim - 1
    return (jax.lax.dot_general(xa, wlo, (((nd,), (0,)), ((), ())))
            + jax.lax.dot_general(xb, whi, (((nd,), (0,)), ((), ()))))


def _int8_matmul_impl(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                      dtype) -> jnp.ndarray:
    import os

    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.where(amax == 0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    if (os.environ.get("HAFF_INT8_PALLAS") == "1" and xq.ndim >= 2
            and q.shape[0] % 128 == 0):
        lead = xq.shape[:-1]
        y = pallas_int8_matmul(
            xq.reshape(-1, q.shape[0]), q,
            s_x.reshape(-1, 1).astype(jnp.float32),
            scale.astype(jnp.float32), dtype=dtype,
            interpret=jax.default_backend() not in ("tpu", "axon"))
        return y.reshape(*lead, q.shape[1])
    y = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * scale)).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _int8_matmul_ste(x, q, scale, dtype):
    return _int8_matmul_impl(x, q, scale, dtype)


def _int8_matmul_ste_fwd(x, q, scale, dtype):
    # Residual: q + scale (for the dequantized-weight backward dot) and a
    # zero-size marker carrying x's dtype so the cotangent matches.
    return (_int8_matmul_impl(x, q, scale, dtype),
            (q, scale, jnp.zeros((0,), x.dtype)))


def _int8_matmul_ste_bwd(dtype, res, dy):
    import numpy as _np
    from jax import dtypes as _dtypes

    q, scale, xmark = res
    # Straight-through estimator: d/dx runs against the DEQUANTIZED
    # weight (bf16/f32 dot), ignoring the activation-quant rounding —
    # the standard QLoRA/AQT training convention. q int8 and scale are
    # frozen serving params by contract; their cotangents are
    # zero/float0 (training a quantized kernel through this op is
    # unsupported — requantize from float masters instead).
    w = (q.astype(jnp.float32) * scale).astype(dy.dtype)
    dx = jax.lax.dot_general(
        dy, w, (((dy.ndim - 1,), (1,)), ((), ())))
    return (dx.astype(xmark.dtype),
            _np.zeros(q.shape, _dtypes.float0),
            jnp.zeros_like(scale))


_int8_matmul_ste.defvjp(_int8_matmul_ste_fwd, _int8_matmul_ste_bwd)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                dtype=None) -> jnp.ndarray:
    """W8A8 matmul: dynamic per-token symmetric activation quantization,
    int8 x int8 -> int32 dot, then rescale by (act_scale * weight_scale).

    x: (..., in) float; q: (in, out) int8 kernel; scale: (out,) f32
    per-output-channel weight scales (from quantize_kernel).

    Differentiable w.r.t. x via a straight-through custom_vjp (backward
    is a bf16 dot against the dequantized weight) so a QLoRA-style
    in-tree-quantized frozen base can sit UNDER trainable adapters
    without the activation-quant `round` zeroing the gradient path
    (reference train_ds.py:57-58 bitsandbytes load + LoRA). q/scale get
    zero cotangents — quantized kernels are frozen by contract.

    HAFF_INT8_PALLAS=1 routes the dot through the Pallas tiled kernel
    (pallas_int8_matmul) instead of XLA's dot_general — measured A/B on
    chip decides the default (see tools/mxu_bench.py notes: XLA's int8
    dot does not raise the MXU rate on v5e)."""
    return _int8_matmul_ste(x, q, scale, dtype or x.dtype)


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


def quantize_kernel_int4(w: jnp.ndarray, group: int = 64
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(in, out) kernel -> (packed uint8 (in/2, out), f32 scales
    (in/group, out)). Group-wise symmetric int4 (the TPU analog of
    bitsandbytes nf4 4-bit, reference inference.py:133-156): two signed
    nibbles per byte along the in dim; in must divide by `group`."""
    w = jnp.asarray(w, jnp.float32)
    din, dout = w.shape
    assert din % group == 0 and group % 2 == 0, (din, group)
    g = w.reshape(din // group, group, dout)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(g / scale), -8, 7).astype(jnp.int32)
    q = q.reshape(din, dout)
    lo = q[0::2] & 0xF
    hi = (q[1::2] & 0xF) << 4
    packed = (lo | hi).astype(jnp.uint8)          # (in/2, out)
    return packed, scale[:, 0].astype(jnp.float32)  # (in/group, out)


def dequantize_kernel_int4(packed: jnp.ndarray, scale: jnp.ndarray,
                           group: int = 64, dtype=jnp.bfloat16
                           ) -> jnp.ndarray:
    """Inverse of quantize_kernel_int4; runs inside jit (unpack + scale
    fuse into the consuming matmul's operand load)."""
    lo, hi = _unpack_int4(packed)
    din2, dout = packed.shape
    q = jnp.stack([lo, hi], axis=1).reshape(2 * din2, dout)
    q = q.reshape(scale.shape[0], group, dout).astype(jnp.float32)
    return (q * scale[:, None, :]).reshape(2 * din2, dout).astype(dtype)


def quantize_tree(params: Dict,
                  should_quantize: Callable[[Tuple[str, ...]], bool],
                  bits: int = 8, group: int = 64) -> Tuple[Dict, Dict]:
    """Quantize selected 2D kernels in a param tree (boxed or raw).

    Returns (new_params, qinfo) where quantized kernels are replaced by
    int8 (bits=8) or packed-int4 (bits=4) arrays and qinfo maps the
    flattened keys to scale metadata consumed by dequantize_tree."""
    assert bits in (4, 8)
    flat = dict(traverse_util.flatten_dict(params))
    scales = {}
    for k, v in list(flat.items()):
        arr = _unboxed(v)
        if (k[-1] == "kernel" and getattr(arr, "ndim", 0) == 2
                and should_quantize(k)):
            if bits == 4 and arr.shape[0] % group == 0:
                q, s = quantize_kernel_int4(arr, group)
                flat[k] = _rebox(v, q)
                scales[k] = ("int4", s, group)
            else:
                q, s = quantize_kernel(arr)
                flat[k] = _rebox(v, q)
                scales[k] = ("int8", s, None)
    return traverse_util.unflatten_dict(flat), scales


def dequantize_tree(params: Dict, scales: Dict,
                    dtype=jnp.bfloat16) -> Dict:
    """Materialize compute-dtype kernels from a quantized tree (inside
    jit, XLA keeps weights int8/int4 in HBM and fuses the casts)."""
    flat = dict(traverse_util.flatten_dict(params))
    for k, meta_ in scales.items():
        if not isinstance(meta_, tuple):      # legacy: bare int8 scales
            meta_ = ("int8", meta_, None)
        kind, s, group = meta_
        v = flat[k]
        if kind == "int4":
            flat[k] = _rebox(v, dequantize_kernel_int4(
                _unboxed(v), s, group, dtype))
        else:
            flat[k] = _rebox(v, dequantize_kernel(_unboxed(v), s, dtype))
    return traverse_util.unflatten_dict(flat)


def quantize_dense_tree(params: Dict,
                        should_quantize: Callable[[Tuple[str, ...]], bool],
                        bits: int = 8, group: int = 64) -> Dict:
    """Replace selected 2D Dense kernels with quantized values plus an
    IN-TREE sibling 'scale' leaf. Consumed by layers.QDense, which
    detects the kernel dtype + scale at apply time and switches to the
    W8A8 int8-MXU path (int8 kernel, 1D scales) or the W4A16 per-layer
    dequant path (packed uint8 kernel, 2D group scales). Unlike
    quantize_tree, no external scale dict is needed — the quantized tree
    is a drop-in params tree."""
    assert bits in (4, 8)
    flat = dict(traverse_util.flatten_dict(params))
    for k, v in list(flat.items()):
        arr = _unboxed(v)
        if (k[-1] == "kernel" and getattr(arr, "ndim", 0) == 2
                and should_quantize(k)):
            if bits == 4 and arr.shape[0] % group == 0:
                q, s = quantize_kernel_int4(arr, group)
            else:
                q, s = quantize_kernel(arr)
            flat[k] = _rebox(v, q)
            flat[k[:-1] + ("scale",)] = s
    return traverse_util.unflatten_dict(flat)


def sam_encoder_predicate(path: Tuple[str, ...],
                          skip_blocks: Tuple[int, ...] = ()
                          ) -> bool:
    """int8-quantize the SAM ViT encoder's transformer matmuls (qkv,
    proj, MLP) in ALL blocks. The patch embed, neck convs and
    everything outside the blocks stay bf16 (cheap; the neck is fp32
    for overflow parity, sam_image_encoder.py:209).

    History: with the OLD per-head global attention path, int8 global
    blocks measured SLOWER (74.1 vs 71.3 ms at batch 24) and
    skip_blocks defaulted to the ViT-H global_attn_indexes; with the
    natural-layout global kernel (sam_global_attention_qkv) the
    activation-quantize pass fuses cleanly and int8 wins there too
    (17.0 vs 18.3 ms/layer at b8, v5e) — default is now to quantize
    every block. Pass skip_blocks=(7, 15, 23, 31) to restore the old
    split for A/B."""
    blk = next((str(p) for p in path if str(p).startswith("blocks_")),
               None)
    if blk is None:
        return False
    if int(blk.split("_")[1]) in skip_blocks:
        return False
    return len(path) >= 2 and path[-2] in ("qkv", "proj", "lin1", "lin2")


def lisa_serving_predicate(path: Tuple[str, ...]) -> bool:
    """Whole-model W8A8 serving set: the SAM encoder transformer matmuls
    plus the LLM projections (embeddings, norms, decoders, CLIP stay
    bf16). Used by the flagship single-chip serving configuration —
    LLaMA-7B bf16 alone exceeds a v5e's 16 GB HBM, int8 fits
    (reference analog: the bnb 8-bit load, inference.py:133-156)."""
    p = set(str(x) for x in path)
    if "image_encoder" in p:
        return sam_encoder_predicate(path)
    if "vision_tower" in p or "embed_tokens" in p or "wte" in p:
        return False
    # LLM projections only: the mask decoders' TwoWayTransformer also
    # has {q,k,v}_proj Dense layers, but those are plain nn.Dense (no
    # quantized-kernel read path) and the reference's bnb 8-bit load
    # quantizes the LLM alone (inference.py:133-156) — the round-4
    # trained-weight accuracy run caught the old predicate matching
    # them. "Wqkv"/"out_proj" cover the MPT backend's fused projections.
    if "llm" not in p:
        return False
    return any(n in p for n in (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
        "down_proj", "lm_head", "Wqkv", "out_proj"))


def random_quantized_like(shapes: Dict,
                          predicate: Callable[[Tuple[str, ...]], bool],
                          key=None, big_bf16: int = 1_000_000,
                          bits: int = 8, group: int = 64) -> Dict:
    """Materialize a random params tree directly in serving precision
    from a jax.eval_shape pytree: predicate'd 2D kernels become int8
    (bits=8, + in-tree 1D 'scale') or packed int4 (bits=4, (in/2, out)
    uint8 + 2D group scales), any other leaf larger than `big_bf16`
    elements becomes bf16, the rest keeps its dtype. The float model is
    NEVER materialized — this is how the 7B/13B benches fit a 16 GB chip
    for weight-agnostic throughput measurement."""
    import jax

    assert bits in (4, 8)
    key = jax.random.PRNGKey(0) if key is None else key
    flat = traverse_util.flatten_dict(shapes)

    def gen(key):
        out = {}
        for i, (k, v) in enumerate(sorted(flat.items())):
            sub = jax.random.fold_in(key, i)
            arr = _unboxed(v)
            shape = arr.shape
            if (k[-1] == "kernel" and len(shape) == 2 and predicate(k)):
                if bits == 4 and shape[0] % group == 0:
                    out[k] = jax.random.randint(
                        sub, (shape[0] // 2, shape[1]), 0, 256,
                        dtype=jnp.int32).astype(jnp.uint8)
                    out[k[:-1] + ("scale",)] = jnp.full(
                        (shape[0] // group, shape[1]),
                        0.02 / max(shape[0], 1) ** 0.5, jnp.float32)
                    continue
                out[k] = jax.random.randint(sub, shape, -127, 128,
                                            dtype=jnp.int8)
                out[k[:-1] + ("scale",)] = jnp.full(
                    (shape[-1],), 0.02 / max(shape[0], 1) ** 0.5,
                    jnp.float32)
                continue
            dt = (jnp.bfloat16 if int(np.prod(shape)) > big_bf16
                  else arr.dtype)
            if jnp.issubdtype(arr.dtype, jnp.floating):
                out[k] = (jax.random.normal(sub, shape, jnp.float32)
                          * 0.02).astype(dt)
            else:
                out[k] = jnp.zeros(shape, arr.dtype)
        return traverse_util.unflatten_dict(out)

    return jax.jit(gen)(key)


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
