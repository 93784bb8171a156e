"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's two GPU attention paths
(reference: 2Haff/model/llava/model/language_model/mpt/flash_attn_triton.py
— the vendored Triton kernel — and the flash-attn CUDA monkey patch in
llava/train/llama_flash_attn_monkey_patch.py). Written fresh for the MXU
with the canonical Mosaic structure:

  * 3D grid (batch*heads, q_blocks, k_blocks), k fastest. All block
    slicing happens in BlockSpec index maps, so K/V stream HBM->VMEM
    double-buffered by the Pallas pipeline and no in-kernel dynamic
    slices need alignment proofs.
  * Online-softmax state (acc, m, l) lives in VMEM scratch and persists
    across the sequential k-block steps; outputs are written on the last
    k step of each q block.
  * fp32 softmax statistics; QK^T / PV on the MXU via
    preferred_element_type=float32.
  * Supports causal masking (with compute skipped above the diagonal),
    additive bias (broadcastable over batch/heads — ALiBi etc.), and
    padding/packing via q/k segment ids (the varlen capability of the
    reference's unpadded CUDA path, N2 in SURVEY.md section 2.6).
  * Backward = separate dq (same grid) and dkv (grid transposed to
    (bh, k_blocks, q_blocks)) kernels using the saved logsumexp.

Sequence dims are padded to block multiples (masked via segment ids);
non-TPU backends and degenerate shapes fall back to a pure-XLA reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ---------------------------------------------------------------------------
# XLA reference (tests, CPU fallback, decode step)
# ---------------------------------------------------------------------------

def mha_reference(q, k, v, bias=None, q_segment_ids=None, kv_segment_ids=None,
                  causal=False, sm_scale=None):
    """Plain XLA attention. q: (B, Lq, H, D); k/v: (B, Lk, H, D);
    bias broadcastable to (B, H, Lq, Lk); segment ids (B, L) int32 where 0
    marks padding. Returns (B, Lq, H, D)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    mask = None
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        qi = jnp.arange(lq)[:, None] + (lk - lq)
        ki = jnp.arange(lk)[None, :]
        mask = ki <= qi
    if q_segment_ids is not None or kv_segment_ids is not None:
        qs = q_segment_ids if q_segment_ids is not None else jnp.ones(
            q.shape[:2], jnp.int32)
        ks = kv_segment_ids if kv_segment_ids is not None else jnp.ones(
            k.shape[:2], jnp.int32)
        seg = (qs[:, None, :, None] == ks[:, None, None, :]) & (
            ks[:, None, None, :] != 0)
        mask = seg if mask is None else (mask[None, None] & seg)
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        logits = jnp.where(mask, logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    if mask is not None:
        # Fully-masked rows (all-padding queries) output zeros, matching
        # the kernel (softmax of an all-masked row is otherwise uniform).
        row_any = jnp.broadcast_to(mask, logits.shape).any(-1, keepdims=True)
        probs = jnp.where(row_any, probs, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _block_mask(qi, ki, block_q, block_k, q_offset, causal,
                qseg_ref, kseg_ref):
    """(block_q, block_k) bool mask for this grid step + per-row validity."""
    mask = jnp.ones((block_q, block_k), jnp.bool_)
    if causal:
        q_ids = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0) + q_offset
        k_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = mask & (k_ids <= q_ids)
    if kseg_ref is not None:
        qseg = qseg_ref[0, 0, 0, :]
        kseg = kseg_ref[0, 0, 0, :]
        mask = mask & (qseg[:, None] == kseg[None, :]) & (kseg[None, :] != 0)
    return mask


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref,
                o_ref, lse_ref, acc_ref, m_ref, l_ref, *, sm_scale, causal,
                q_offset, num_kb):
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Causal: skip compute for blocks fully above the diagonal.
    run = jnp.bool_(True)
    if causal:
        run = (ki * block_k) <= (q_offset + (qi + 1) * block_q - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0].astype(jnp.float32) * sm_scale
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        mask = _block_mask(qi, ki, block_q, block_k, q_offset, causal,
                           qseg_ref, kseg_ref)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # Explicit zeroing: a fully-masked block would otherwise give
        # m_new == MASK_VALUE and p == exp(0) == 1 (uniform attention).
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        l_i = l_ref[:]
        m_i = m_ref[:]
        # Fully-masked rows (all-padding) have l == 0; emit zeros, and
        # store lse = 0.0 (not -inf) so backward gets p = exp(MASK) = 0.
        l_safe = jnp.where(l_i == 0.0, 1.0, l_i)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse = (m_i + jnp.log(l_safe))[:, 0]
        lse_ref[0, 0, 0] = jnp.where(l_i[:, 0] == 0.0, 0.0, lse)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref,
                   do_ref, lse_ref, delta_ref, dq_ref, dq_acc_ref, *,
                   sm_scale, causal, q_offset, num_kb):
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    run = jnp.bool_(True)
    if causal:
        run = (ki * block_k) <= (q_offset + (qi + 1) * block_q - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, 0][:, None]
        delta = delta_ref[0, 0, 0][:, None]
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jnp.dot(q * sm_scale, k_blk.T,
                    preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        mask = _block_mask(qi, ki, block_q, block_k, q_offset, causal,
                           qseg_ref, kseg_ref)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        dq_acc_ref[:] = dq_acc_ref[:] + jnp.dot(
            ds, k_blk, preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        dq_ref[0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    dk_acc_ref, dv_acc_ref, *, sm_scale, causal, q_offset,
                    num_qb):
    # grid = (bh, k_blocks, q_blocks): q fastest.
    block_k = k_ref.shape[1]
    block_q = q_ref.shape[1]
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    run = jnp.bool_(True)
    if causal:
        run = (ki * block_k) <= (q_offset + (qi + 1) * block_q - 1)

    @pl.when(run)
    def _step():
        q = q_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, 0][:, None]
        delta = delta_ref[0, 0, 0][:, None]
        k_blk = k_ref[0].astype(jnp.float32)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jnp.dot(q * sm_scale, k_blk.T,
                    preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        mask = _block_mask(qi, ki, block_q, block_k, q_offset, causal,
                           qseg_ref, kseg_ref)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_acc_ref[:] = dv_acc_ref[:] + jnp.dot(
            p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * sm_scale
        dk_acc_ref[:] = dk_acc_ref[:] + jnp.dot(
            ds.T, q, preferred_element_type=jnp.float32)

    @pl.when(qi == num_qb - 1)
    def _finalize():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

def _pick_block(n, target):
    """Largest block <= target dividing n; multiples of 8 only (callers
    pad sequences first)."""
    for b in (target, 256, 128, 64, 32, 16, 8):
        if b <= target and n % b == 0:
            return b
    raise ValueError(f"sequence length {n} not 8-aligned; pad first")


def _flatten_heads(x):  # (B, L, H, D) -> (B*H, L, D)
    b, l, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, l, d)


def _vec4(x, block):
    """(R, L) -> (R, L/block, 1, block): per-row vectors in a layout whose
    block (1, 1, 1, block) satisfies Mosaic tiling for any block size."""
    r, l = x.shape
    return x.reshape(r, l // block, 1, block)


def _common_specs(b, h, lq, lk, d, block_q, block_k, bias, q_seg, k_seg,
                  qi_of, ki_of):
    """Input specs/args shared by fwd and dq kernels. qi_of/ki_of map grid
    ids -> (q block, k block) indices."""
    specs = [
        pl.BlockSpec((1, block_q, d),
                     lambda g0, g1, g2: (g0, qi_of(g1, g2), 0)),      # q
        pl.BlockSpec((1, block_k, d),
                     lambda g0, g1, g2: (g0, ki_of(g1, g2), 0)),      # k
        pl.BlockSpec((1, block_k, d),
                     lambda g0, g1, g2: (g0, ki_of(g1, g2), 0)),      # v
    ]
    args = []
    if bias is not None:
        bias_f = jnp.broadcast_to(bias, (b, h, lq, lk)).reshape(
            b * h, lq, lk)
        specs.append(pl.BlockSpec(
            (1, block_q, block_k),
            lambda g0, g1, g2: (g0, qi_of(g1, g2), ki_of(g1, g2))))
        args.append(bias_f)
    if k_seg is not None:
        qs = q_seg if q_seg is not None else jnp.ones((b, lq), jnp.int32)
        qs = _vec4(jnp.repeat(qs, h, axis=0), block_q)
        ks = _vec4(jnp.repeat(k_seg, h, axis=0), block_k)
        specs.append(pl.BlockSpec(
            (1, 1, 1, block_q),
            lambda g0, g1, g2: (g0, qi_of(g1, g2), 0, 0)))
        specs.append(pl.BlockSpec(
            (1, 1, 1, block_k),
            lambda g0, g1, g2: (g0, ki_of(g1, g2), 0, 0)))
        args.extend([qs, ks])
    return specs, args


def _fwd_impl(q, k, v, bias, q_seg, k_seg, causal, sm_scale, block_q,
              block_k, interpret):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    block_q = _pick_block(lq, block_q)
    block_k = _pick_block(lk, block_k)
    nq, nk = lq // block_q, lk // block_k
    q_offset = lk - lq if causal else 0
    has_bias = bias is not None
    has_seg = k_seg is not None

    qf, kf, vf = _flatten_heads(q), _flatten_heads(k), _flatten_heads(v)
    specs, extra = _common_specs(
        b, h, lq, lk, d, block_q, block_k, bias, q_seg, k_seg,
        qi_of=lambda g1, g2: g1, ki_of=lambda g1, g2: g2)
    args = [qf, kf, vf] + extra

    def kernel(*refs):
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        qseg_ref = refs[i] if has_seg else None
        kseg_ref = refs[i + 1] if has_seg else None
        i += 2 * int(has_seg)
        o_ref, lse_ref = refs[i], refs[i + 1]
        acc_ref, m_ref, l_ref = refs[i + 2], refs[i + 3], refs[i + 4]
        _fwd_kernel(refs[0], refs[1], refs[2], bias_ref, qseg_ref, kseg_ref,
                    o_ref, lse_ref, acc_ref, m_ref, l_ref,
                    sm_scale=sm_scale, causal=causal, q_offset=q_offset,
                    num_kb=nk)

    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, nq, nk),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda g0, g1, g2: (g0, g1, 0)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda g0, g1, g2: (g0, g1, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    out = out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    return out, lse.reshape(b * h, lq)


def _bwd_impl(res, g, causal, sm_scale, block_q, block_k, interpret):
    q, k, v, bias, q_seg, k_seg, out, lse = res
    b, lq, h, d = q.shape
    lk = k.shape[1]
    block_q = _pick_block(lq, block_q)
    block_k = _pick_block(lk, block_k)
    nq, nk = lq // block_q, lk // block_k
    q_offset = lk - lq if causal else 0
    has_bias = bias is not None
    has_seg = k_seg is not None

    qf, kf, vf = _flatten_heads(q), _flatten_heads(k), _flatten_heads(v)
    dof = _flatten_heads(g)
    of = _flatten_heads(out)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)  # (B*H, Lq)
    lse4 = _vec4(lse, block_q)
    delta4 = _vec4(delta, block_q)

    # ---- dq: grid (bh, nq, nk) ----
    specs, extra = _common_specs(
        b, h, lq, lk, d, block_q, block_k, bias, q_seg, k_seg,
        qi_of=lambda g1, g2: g1, ki_of=lambda g1, g2: g2)
    specs.extend([
        pl.BlockSpec((1, block_q, d), lambda g0, g1, g2: (g0, g1, 0)),  # do
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda g0, g1, g2: (g0, g1, 0, 0)),                # lse
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda g0, g1, g2: (g0, g1, 0, 0)),                # delta
    ])
    args = [qf, kf, vf] + extra + [dof, lse4, delta4]

    def dq_kernel(*refs):
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        qseg_ref = refs[i] if has_seg else None
        kseg_ref = refs[i + 1] if has_seg else None
        i += 2 * int(has_seg)
        _bwd_dq_kernel(refs[0], refs[1], refs[2], bias_ref, qseg_ref,
                       kseg_ref, refs[i], refs[i + 1], refs[i + 2],
                       refs[i + 3], refs[i + 4], sm_scale=sm_scale,
                       causal=causal, q_offset=q_offset, num_kb=nk)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, nq, nk),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda g0, g1, g2: (g0, g1, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*args)

    # ---- dk/dv: grid (bh, nk, nq), q fastest ----
    specs2, extra2 = _common_specs(
        b, h, lq, lk, d, block_q, block_k, bias, q_seg, k_seg,
        qi_of=lambda g1, g2: g2, ki_of=lambda g1, g2: g1)
    specs2.extend([
        pl.BlockSpec((1, block_q, d), lambda g0, g1, g2: (g0, g2, 0)),  # do
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda g0, g1, g2: (g0, g2, 0, 0)),                # lse
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda g0, g1, g2: (g0, g2, 0, 0)),                # delta
    ])
    args2 = [qf, kf, vf] + extra2 + [dof, lse4, delta4]

    def dkv_kernel(*refs):
        i = 3
        bias_ref = refs[i] if has_bias else None
        i += int(has_bias)
        qseg_ref = refs[i] if has_seg else None
        kseg_ref = refs[i + 1] if has_seg else None
        i += 2 * int(has_seg)
        _bwd_dkv_kernel(refs[0], refs[1], refs[2], bias_ref, qseg_ref,
                        kseg_ref, refs[i], refs[i + 1], refs[i + 2],
                        refs[i + 3], refs[i + 4], refs[i + 5], refs[i + 6],
                        sm_scale=sm_scale, causal=causal, q_offset=q_offset,
                        num_qb=nq)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, nk, nq),
        in_specs=specs2,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda g0, g1, g2: (g0, g1, 0)),
            pl.BlockSpec((1, block_k, d), lambda g0, g1, g2: (g0, g1, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args2)

    unflatten = lambda x, l: x.reshape(b, h, l, d).transpose(0, 2, 1, 3)  # noqa: E731
    return unflatten(dq, lq), unflatten(dk, lk), unflatten(dv, lk)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash_attention(q, k, v, bias, q_seg, k_seg, causal, sm_scale,
                     block_q, block_k, interpret):
    out, _ = _fwd_impl(q, k, v, bias, q_seg, k_seg, causal, sm_scale,
                       block_q, block_k, interpret)
    return out


def _flash_fwd_rule(q, k, v, bias, q_seg, k_seg, causal, sm_scale, block_q,
                    block_k, interpret):
    out, lse = _fwd_impl(q, k, v, bias, q_seg, k_seg, causal, sm_scale,
                         block_q, block_k, interpret)
    return out, (q, k, v, bias, q_seg, k_seg, out, lse)


def _flash_bwd_rule(causal, sm_scale, block_q, block_k, interpret, res, g):
    dq, dk, dv = _bwd_impl(res, g, causal, sm_scale, block_q, block_k,
                           interpret)
    # bias is treated as constant (ALiBi-style, non-trainable).
    dbias = None if res[3] is None else jnp.zeros_like(res[3])
    return dq, dk, dv, dbias, None, None


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, bias=None, q_segment_ids=None,
                    kv_segment_ids=None, causal=False, sm_scale=None,
                    block_q=128, block_k=128, force_xla=False,
                    interpret=None):
    """Flash attention. q: (B, Lq, H, D), k/v: (B, Lk, H, D).

    bias: broadcastable to (B, H, Lq, Lk), constant in backward (no dbias).
    segment ids: (B, L) int32, 0 = padding. Returns (B, Lq, H, D).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    backend = jax.default_backend()
    small = q.shape[1] < 8 or k.shape[1] < 8
    if force_xla or small:
        return mha_reference(q, k, v, bias=bias,
                             q_segment_ids=q_segment_ids,
                             kv_segment_ids=kv_segment_ids, causal=causal,
                             sm_scale=sm_scale)
    if interpret is None:
        interpret = backend != "tpu"
    if q_segment_ids is not None and kv_segment_ids is None:
        kv_segment_ids = q_segment_ids

    # Pad sequence dims to block multiples (masked via segment ids).
    # Self-attention (lq == lk) keeps its causal offset under equal
    # padding; unaligned causal cross-attention falls back to XLA.
    lq, lk = q.shape[1], k.shape[1]
    mult_q = 128 if lq >= 256 else 8
    mult_k = 128 if lk >= 256 else 8
    pad_q = (-lq) % mult_q
    pad_k = (-lk) % mult_k
    if pad_q or pad_k:
        if causal and lq != lk:
            return mha_reference(q, k, v, bias=bias,
                                 q_segment_ids=q_segment_ids,
                                 kv_segment_ids=kv_segment_ids,
                                 causal=causal, sm_scale=sm_scale)
        if q_segment_ids is None:
            q_segment_ids = jnp.ones(q.shape[:2], jnp.int32)
        if kv_segment_ids is None:
            kv_segment_ids = jnp.ones(k.shape[:2], jnp.int32)
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        q_segment_ids = jnp.pad(q_segment_ids, ((0, 0), (0, pad_q)))
        kv_segment_ids = jnp.pad(kv_segment_ids, ((0, 0), (0, pad_k)))
        if bias is not None:
            bias = jnp.broadcast_to(bias, bias.shape[:2] + (lq, lk))
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))
    out = _flash_attention(q, k, v, bias, q_segment_ids, kv_segment_ids,
                           causal, sm_scale, block_q, block_k, interpret)
    if pad_q:
        out = out[:, :lq]
    return out
