"""Ring attention — sequence-parallel flash attention over a mesh axis.

Beyond-parity capability: the reference has no sequence parallelism at
all (SURVEY.md section 5.7 — its longest context is 575 tokens), but a
TPU-native framework scales context by sharding the sequence dimension
over ICI. This module implements ring attention the TPU way:

  * activations are sequence-sharded over a mesh axis; each device holds
    a (B, L/n, H, D) chunk of q, k, v,
  * K/V chunks rotate around the ring via `lax.ppermute` (neighbor
    transfers ride ICI) while every device accumulates online-softmax
    partial results for its local queries,
  * per-chunk compute reuses the Pallas flash kernels unchanged
    (kernels/flash_attention.py): `_fwd_impl` already returns the
    logsumexp needed for the cross-chunk merge, and `_bwd_impl` applied
    with the GLOBAL (merged) out/lse against a single K/V chunk yields
    exactly the distributed-flash partial gradients,
  * causal masking is resolved per ring step by chunk relation via
    `lax.switch`: past chunks run the dense kernel, the diagonal chunk
    runs the causal kernel, and future chunks are skipped outright — the
    causal ring does no wasted chunk matmuls,
  * backward is a hand-written second ring pass (custom_vjp): dK/dV
    accumulators travel around the ring with their chunk and arrive back
    at the owner after n steps. Residuals are O(L/n) per device — the
    memory scaling that makes sequence parallelism worthwhile. A
    `jax.checkpoint`-style rematerialisation is unnecessary: nothing
    larger than one chunk is ever saved.

Call `ring_attention` inside `jax.shard_map` (see
`sequence_sharded_attention` for the canonical wrapper).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.flash_attention import (DEFAULT_MASK_VALUE, _bwd_impl,
                                       _fwd_impl)


def _weights_for_out(w, b, h, lq):
    """lse-space weight (B*H, Lq) -> (B, Lq, H, 1) matching out layout."""
    return w.reshape(b, h, lq).transpose(0, 2, 1)[..., None]


def _merge(o1, lse1, o2, lse2, b, h, lq):
    """Merge two online-softmax partials over disjoint key sets.

    o: (B, Lq, H, D) fp32 (already per-chunk normalized), lse: (B*H, Lq)
    fp32. Fully-masked partials carry lse ~= DEFAULT_MASK_VALUE and
    contribute weight exp(MASK - valid) == 0.
    """
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    lse = m + jnp.log(w1 + w2)
    wo1 = _weights_for_out(w1, b, h, lq)
    wo2 = _weights_for_out(w2, b, h, lq)
    o = (o1 * wo1 + o2 * wo2) / (wo1 + wo2)
    return o, lse


def _fix_seg_lse(lse, q_seg, k_seg, h):
    """Rows whose q segment has NO match in this k/v chunk must merge
    with zero weight. The kernel emits lse == 0.0 for its l == 0 rows
    (the right sentinel for all-padding q rows, whose backward needs
    p == exp(MASK - 0) == 0) — but for a VALID q row that merely has no
    key in this chunk, lse == 0.0 would out-weigh real chunks, so push
    it down to the mask sentinel. All-padding q rows keep 0.0."""
    match = ((q_seg[:, :, None] == k_seg[:, None, :])
             & (k_seg[:, None, :] != 0)).any(-1)          # (B, Lq)
    no_valid = (q_seg != 0) & ~match
    return jnp.where(jnp.repeat(no_valid, h, axis=0), DEFAULT_MASK_VALUE,
                     lse)


def _chunk_fwd(q, k_c, v_c, q_seg, k_seg, rel, causal, sm_scale, block_q,
               block_k, interpret):
    """One ring step's partial (out fp32, lse) via the Pallas kernel.
    rel selects the chunk relation: 0 = strictly past (dense), 1 =
    diagonal (causal), 2 = strictly future (skipped)."""
    b, lq, h, _ = q.shape

    def dense(_):
        return _fwd_impl(q, k_c, v_c, None, q_seg, k_seg, False, sm_scale,
                         block_q, block_k, interpret)

    def diag(_):
        return _fwd_impl(q, k_c, v_c, None, q_seg, k_seg, True, sm_scale,
                         block_q, block_k, interpret)

    def skip(_):
        return (jnp.zeros(q.shape, q.dtype),
                jnp.full((b * h, lq), DEFAULT_MASK_VALUE, jnp.float32))

    if causal:
        out, lse = lax.switch(rel, (dense, diag, skip), None)
    else:
        out, lse = dense(None)
    if k_seg is not None:
        qs = (q_seg if q_seg is not None
              else jnp.ones((b, lq), jnp.int32))
        lse = _fix_seg_lse(lse, qs, k_seg, h)
    return out.astype(jnp.float32), lse


def _chunk_bwd(q, k_c, v_c, q_seg, k_seg, out, lse, g, rel, causal,
               sm_scale, block_q, block_k, interpret):
    """Partial (dq, dk_chunk, dv_chunk) for one ring step. Feeding the
    GLOBAL merged out/lse to the single-device backward against one K/V
    chunk gives the distributed-flash partials directly: p = exp(s -
    lse_global) is the globally-normalized probability and delta =
    rowsum(dout * out_global) is the global correction term."""

    def run(is_causal):
        def f(_):
            res = (q, k_c, v_c, None, q_seg, k_seg, out, lse)
            return _bwd_impl(res, g, is_causal, sm_scale, block_q, block_k,
                             interpret)
        return f

    def skip(_):
        return (jnp.zeros(q.shape, q.dtype), jnp.zeros(k_c.shape, k_c.dtype),
                jnp.zeros(v_c.shape, v_c.dtype))

    if causal:
        return lax.switch(rel, (run(False), run(True), skip), None)
    return run(False)(None)


def _relation(idx, src, n):
    """0 past, 1 diagonal, 2 future — with the chunk index taken mod n
    (src arrives as idx - s which may be negative)."""
    src = src % n
    return jnp.where(src == idx, 1, jnp.where(src < idx, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def ring_attention(q, k, v, q_segment_ids, kv_segment_ids, axis_name,
                   causal=False, sm_scale=None, block_q=128, block_k=128,
                   interpret=None):
    """Sequence-parallel flash attention. MUST run inside shard_map.

    q/k/v: the LOCAL sequence chunk, (B, L/n, H, D), sharded over
    `axis_name`; segment ids (B, L/n) int32 (0 = padding) or None.
    Returns the local output chunk (B, L/n, H, D).

    For causal=True, q and kv must be the same sequence (equal global
    lengths, aligned chunks).
    """
    out, _ = _ring_fwd(q, k, v, q_segment_ids, kv_segment_ids, axis_name,
                       causal, sm_scale, block_q, block_k, interpret)
    return out


def _defaults(q, sm_scale, interpret):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return sm_scale, interpret


def _ring_fwd(q, k, v, q_seg, k_seg, axis_name, causal, sm_scale, block_q,
              block_k, interpret):
    sm_scale, interpret = _defaults(q, sm_scale, interpret)
    b, lq, h, d = q.shape
    assert k.shape[1] == lq or not causal, (
        "causal ring attention needs aligned equal-length q/kv chunks")
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def compute(k_c, v_c, kseg_c, o, lse, s):
        rel = _relation(idx, idx - s, n)
        o_s, lse_s = _chunk_fwd(q, k_c, v_c, q_seg, kseg_c, rel, causal,
                                sm_scale, block_q, block_k, interpret)
        return _merge(o, lse, o_s, lse_s, b, h, lq)

    def step(carry, s):
        k_c, v_c, kseg_c, o, lse = carry
        o, lse = compute(k_c, v_c, kseg_c, o, lse, s)
        k_c = lax.ppermute(k_c, axis_name, perm)
        v_c = lax.ppermute(v_c, axis_name, perm)
        if kseg_c is not None:
            kseg_c = lax.ppermute(kseg_c, axis_name, perm)
        return (k_c, v_c, kseg_c, o, lse), None

    o0 = jnp.zeros((b, lq, h, d), jnp.float32)
    lse0 = jnp.full((b * h, lq), DEFAULT_MASK_VALUE, jnp.float32)
    # The last chunk needs no rotation afterwards — peel it out of the
    # scan so 1/n of the ring K/V traffic never happens.
    (k_c, v_c, kseg_c, o, lse), _ = lax.scan(
        step, (k, v, k_seg, o0, lse0), jnp.arange(n - 1))
    o, lse = compute(k_c, v_c, kseg_c, o, lse, n - 1)
    out = o.astype(q.dtype)
    return out, (q, k, v, q_seg, k_seg, out, lse)


def _ring_bwd(axis_name, causal, sm_scale, block_q, block_k, interpret,
              res, g):
    q, k, v, q_seg, k_seg, out, lse = res
    sm_scale, interpret = _defaults(q, sm_scale, interpret)
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def compute(k_c, v_c, kseg_c, dk_c, dv_c, dq, s):
        rel = _relation(idx, idx - s, n)
        dq_s, dk_s, dv_s = _chunk_bwd(q, k_c, v_c, q_seg, kseg_c, out, lse,
                                      g, rel, causal, sm_scale, block_q,
                                      block_k, interpret)
        return (dk_c + dk_s.astype(jnp.float32),
                dv_c + dv_s.astype(jnp.float32),
                dq + dq_s.astype(jnp.float32))

    def step(carry, s):
        k_c, v_c, kseg_c, dk_c, dv_c, dq = carry
        dk_c, dv_c, dq = compute(k_c, v_c, kseg_c, dk_c, dv_c, dq, s)
        # dK/dV accumulators travel WITH their chunk; after n rotations
        # each chunk (and its gradient) is home again.
        k_c = lax.ppermute(k_c, axis_name, perm)
        v_c = lax.ppermute(v_c, axis_name, perm)
        dk_c = lax.ppermute(dk_c, axis_name, perm)
        dv_c = lax.ppermute(dv_c, axis_name, perm)
        if kseg_c is not None:
            kseg_c = lax.ppermute(kseg_c, axis_name, perm)
        return (k_c, v_c, kseg_c, dk_c, dv_c, dq), None

    zkv = jnp.zeros(k.shape, jnp.float32)
    dq0 = jnp.zeros(q.shape, jnp.float32)
    # Peel the last step: only dK/dV need the final hop home — K/V and
    # segment ids are done rotating.
    (k_c, v_c, kseg_c, dk, dv, dq), _ = lax.scan(
        step, (k, v, k_seg, zkv, jnp.zeros(v.shape, jnp.float32), dq0),
        jnp.arange(n - 1))
    dk, dv, dq = compute(k_c, v_c, kseg_c, dk, dv, dq, n - 1)
    dk = lax.ppermute(dk, axis_name, perm)
    dv = lax.ppermute(dv, axis_name, perm)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


def _ring_fwd_rule(q, k, v, q_seg, k_seg, axis_name, causal, sm_scale,
                   block_q, block_k, interpret):
    out, res = _ring_fwd(q, k, v, q_seg, k_seg, axis_name, causal, sm_scale,
                         block_q, block_k, interpret)
    return out, res


ring_attention.defvjp(_ring_fwd_rule, _ring_bwd)


def sequence_sharded_attention(mesh: Mesh, axis: str, q, k, v,
                               q_segment_ids=None, kv_segment_ids=None,
                               causal: bool = False,
                               sm_scale: Optional[float] = None,
                               block_q: int = 128, block_k: int = 128,
                               interpret: Optional[bool] = None,
                               batch_axes=None, heads_axis=None):
    """Canonical shard_map wrapper: q/k/v (B, L, H, D) logically global,
    sequence-sharded over mesh axis `axis` (L must divide by its size,
    and L/n must be 8-aligned for the Pallas kernel). `batch_axes`
    optionally names mesh axes sharding the batch dim and `heads_axis`
    the mesh axis sharding heads (TP x SP composition: heads are
    independent, so each tensor-shard rings over its own heads)."""
    n = mesh.shape[axis]
    for name, length in (("q", q.shape[1]), ("kv", k.shape[1])):
        if length % n or (length // n) % 8:
            raise ValueError(
                f"{name} sequence {length} must split into 8-aligned "
                f"chunks over {n} '{axis}' devices")
    qkv_spec = P(batch_axes, axis, heads_axis, None)
    seg_spec = P(batch_axes, axis)
    fn = functools.partial(ring_attention, axis_name=axis, causal=causal,
                           sm_scale=sm_scale, block_q=block_q,
                           block_k=block_k, interpret=interpret)
    if q_segment_ids is None and kv_segment_ids is None:
        shardmapped = jax.shard_map(
            lambda q, k, v: fn(q, k, v, None, None), mesh=mesh,
            in_specs=(qkv_spec,) * 3, out_specs=qkv_spec, check_vma=False)
        return shardmapped(q, k, v)
    if kv_segment_ids is None:
        kv_segment_ids = q_segment_ids
    if q_segment_ids is None:
        q_segment_ids = jnp.ones(q.shape[:2], jnp.int32)
    shardmapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec, seg_spec),
        out_specs=qkv_spec, check_vma=False)
    return shardmapped(q, k, v, q_segment_ids, kv_segment_ids)
