"""Fused decomposed-rel-pos flash attention for SAM's global layers.

The reference materializes the full (L, L) attention matrix plus a
decomposed relative-position bias per head (reference:
segment_anything/modeling/image_encoder.py:354-392) — at ViT-H's global
layers L = 64*64 = 4096, that is ~1 GB of fp32 transients per image per
layer. TPU-native reformulation:

    bias[i, j] = r_q[i] . Rh[qh_i - kh_j]  +  r_q[i] . Rw[qw_i - kw_j]
               = Bh[i, kh_j] + Bw[i, kw_j]

where Bh = einsum(q, Rh) is only (L, H) and Bw = einsum(q, Rw) is (L, W)
— a few MB. The bias is then folded INTO the QK matmul by augmenting the
feature dimension:

    [q * scale, Bh, Bw] @ [k, OneHotRow, OneHotCol]^T
        = scale * q k^T + Bh[i, row(j)] + Bw[i, col(j)]

OneHotRow[j, r] = (row(j) == r), OneHotCol[j, c] = (col(j) == c). The
head dim grows 80 -> 80+H+W, which the MXU pads toward 128/256 lanes
anyway, so on TPU the bias costs (nearly) nothing: no (L, L) bias is
ever materialized, no gather, no bias operand streaming — a plain
flash-attention kernel consumes the augmented operands, and the matmuls
run in the compute dtype (bf16 on chip) instead of fp32.

The backward runs as a k-row-banded XLA scan (same O(L*W) working set).
Gradients flow to q (including through the bias), k and v; the rel-pos
TABLES get zero gradients — matching the reference training recipe where
the SAM encoder is frozen (train_ds.py:236-244 unfreezes only the mask
decoders). Pass train_rel_pos=True to force the XLA path when the tables
must be trained.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import mha_reference
from ..nn.sam_image_encoder import decomposed_rel_pos_bias, get_rel_pos


def _band_tables(q, rel_h, rel_w, hw: Tuple[int, int]):
    """q: (B, L, nh, d) -> Bh (B, nh, L, H), Bw (B, nh, L, W), fp32."""
    H, W = hw
    b, l, nh, d = q.shape
    Rh = get_rel_pos(H, H, rel_h).astype(jnp.float32)  # (H, H, d)
    Rw = get_rel_pos(W, W, rel_w).astype(jnp.float32)  # (W, W, d)
    r_q = q.reshape(b, H, W, nh, d).astype(jnp.float32)
    Bh = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh).reshape(b, nh, l, H)
    Bw = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw).reshape(b, nh, l, W)
    return Bh, Bw


def _expanders(hw: Tuple[int, int], dtype):
    """One-hot row/col expanders (L, H) and (L, W): static constants."""
    H, W = hw
    rows = np.arange(H * W) // W
    cols = np.arange(H * W) % W
    Eh = (rows[:, None] == np.arange(H)[None, :]).astype(np.float32)
    Ew = (cols[:, None] == np.arange(W)[None, :]).astype(np.float32)
    return jnp.asarray(Eh, dtype), jnp.asarray(Ew, dtype)


def _fused_kernel(q_ref, k_ref, bh_ref, bw_ref, v_ref, eh_ref, ew_ref,
                  o_ref, acc_ref, m_ref, l_ref, *, num_kb, sm_scale):
    # q/k/v refs (1, blk, d); bh/bw (1, block_q, H/W) band tables;
    # eh/ew (block_k, H/W) one-hot expander slices (shared across the
    # batch grid dim — materializing the broadcast qa/ka in HBM instead
    # measured 17.5 vs 14.2 ms/layer). The augmented operands
    # [q*scale, Bh, Bw] and [k, Eh, Ew] are concatenated in VMEM and
    # the bias rides the QK matmul.
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    qs = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    qa = jnp.concatenate([qs, bh_ref[0], bw_ref[0]], axis=1)
    ka = jnp.concatenate([k_ref[0], eh_ref[...], ew_ref[...]], axis=1)
    s = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    v_blk = v_ref[0]
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _fused_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, block_q, interpret,
               block_k: int = 2048):
    H, W = hw
    b, l, nh, d = q.shape
    assert l == H * W
    Bh, Bw = _band_tables(q, rel_h, rel_w, hw)    # fp32 (B, nh, L, H/W)
    bh = Bh.astype(q.dtype).reshape(b * nh, l, H)
    bw = Bw.astype(q.dtype).reshape(b * nh, l, W)
    qf = q.transpose(0, 2, 1, 3).reshape(b * nh, l, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * nh, l, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * nh, l, d)
    Eh, Ew = _expanders(hw, q.dtype)              # (L, H), (L, W)

    block_q = min(block_q, l)
    while l % block_q:
        block_q //= 2
    block_k = min(block_k, l)
    while l % block_k:
        block_k //= 2
    nq = l // block_q
    nk = l // block_k

    out = pl.pallas_call(
        functools.partial(_fused_kernel, num_kb=nk, sm_scale=sm_scale),
        grid=(b * nh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda g0, g1, g2: (g0, g1, 0)),
            pl.BlockSpec((1, block_k, d), lambda g0, g1, g2: (g0, g2, 0)),
            pl.BlockSpec((1, block_q, H), lambda g0, g1, g2: (g0, g1, 0)),
            pl.BlockSpec((1, block_q, W), lambda g0, g1, g2: (g0, g1, 0)),
            pl.BlockSpec((1, block_k, d), lambda g0, g1, g2: (g0, g2, 0)),
            pl.BlockSpec((block_k, H), lambda g0, g1, g2: (g2, 0)),
            pl.BlockSpec((block_k, W), lambda g0, g1, g2: (g2, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda g0, g1, g2: (g0, g1, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, l, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, bh, bw, vf, Eh, Ew)
    return out.reshape(b, nh, l, d).transpose(0, 2, 1, 3)


def _banded_bwd(res, g, hw, sm_scale):
    """k-row-banded attention backward in XLA: O(L*W) working set."""
    q, k, v, rel_h, rel_w, out = res
    H, W = hw
    b, l, nh, d = q.shape
    Bh, Bw = _band_tables(q, rel_h, rel_w, hw)  # (B,nh,L,H), (B,nh,L,W)
    Rh = get_rel_pos(H, H, rel_h).astype(jnp.float32)  # (H, H, d)
    Rw = get_rel_pos(W, W, rel_w).astype(jnp.float32)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32).reshape(b, H, W, nh, d)
    vf = v.astype(jnp.float32).reshape(b, H, W, nh, d)
    do = g.astype(jnp.float32)
    delta = jnp.sum(do * out.astype(jnp.float32), axis=-1)  # (B, L, nh)

    def band_logits(kb):
        k_band = kf[:, kb]                      # (B, W, nh, d)
        s = jnp.einsum("blnd,bwnd->bnlw", qf * sm_scale, k_band)
        s = s + Bh[:, :, :, kb][..., None] + Bw
        return s, k_band

    # pass 1: lse via banded max/logsumexp
    def max_body(kb, m):
        s, _ = band_logits(kb)
        return jnp.maximum(m, jnp.max(s, axis=-1))

    m = jax.lax.fori_loop(
        0, H, max_body,
        jnp.full((b, nh, l), -jnp.inf, jnp.float32))

    def sum_body(kb, acc):
        s, _ = band_logits(kb)
        return acc + jnp.sum(jnp.exp(s - m[..., None]), axis=-1)

    denom = jax.lax.fori_loop(
        0, H, sum_body, jnp.zeros((b, nh, l), jnp.float32))
    lse = m + jnp.log(denom)

    # pass 2: gradients
    qh = jnp.arange(l) // W  # (L,)

    def grad_body(kb, carry):
        dq, dk, dv = carry
        s, k_band = band_logits(kb)
        p = jnp.exp(s - lse[..., None])          # (B, nh, L, W)
        v_band = vf[:, kb]                       # (B, W, nh, d)
        dv_band = jnp.einsum("bnlw,blnd->bwnd", p, do)
        dp = jnp.einsum("blnd,bwnd->bnlw", do, v_band)
        ds = p * (dp - delta.transpose(0, 2, 1)[..., None])
        dq = dq + sm_scale * jnp.einsum("bnlw,bwnd->blnd", ds, k_band)
        dk_band = sm_scale * jnp.einsum("bnlw,blnd->bwnd", ds, qf)
        # bias-through-q: dBh[i] = sum_w ds[i, w]; dBw[i, w] = ds[i, w]
        dbh = jnp.sum(ds, axis=-1)               # (B, nh, L)
        Rh_rows = Rh[qh, kb]                      # (L, d) static gather
        dq = dq + jnp.einsum("bnl,ld->blnd", dbh, Rh_rows)
        qw = jnp.arange(l) % W
        # dBw contribution: ds[i, w] * Rw[qw_i, w]
        Rw_q = Rw[qw]                             # (L, W, d)
        dq = dq + jnp.einsum("bnlw,lwd->blnd", ds, Rw_q)
        dk = dk.at[:, kb].add(dk_band)
        dv = dv.at[:, kb].add(dv_band)
        return dq, dk, dv

    dq0 = jnp.zeros_like(qf)
    dk0 = jnp.zeros_like(kf)
    dv0 = jnp.zeros_like(vf)
    dq, dk, dv = jax.lax.fori_loop(0, H, grad_body, (dq0, dk0, dv0))
    return (dq.astype(q.dtype),
            dk.reshape(b, l, nh, d).astype(k.dtype),
            dv.reshape(b, l, nh, d).astype(v.dtype),
            jnp.zeros_like(rel_h), jnp.zeros_like(rel_w))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(q, k, v, rel_h, rel_w, hw, sm_scale, block_q, interpret):
    return _fused_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, block_q,
                      interpret)


def _fused_fwd_rule(q, k, v, rel_h, rel_w, hw, sm_scale, block_q,
                    interpret):
    out = _fused_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, block_q,
                     interpret)
    return out, (q, k, v, rel_h, rel_w, out)


def _fused_bwd_rule(hw, sm_scale, block_q, interpret, res, g):
    return _banded_bwd(res, g, hw, sm_scale)


_fused.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def _window_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                   o_ref, *, sm_scale):
    """A group of whole windows*heads per grid step, batched through
    Mosaic's batched dot_general (verified supported on v5e).

    q/k/v/o refs (G, L, d); bh/bw (G, L, wh/ww) band tables; eh/ew
    (L, wh/ww) one-hot expanders. The decomposed bias is folded into the
    QK matmul IN KERNEL by feature augmentation:

        [q*scale, Bh, Bw] @ [k, Eh, Ew]^T = scale*q k^T + bias

    so the (BW, nh, L, L) bias is never materialized in HBM (that
    materialization plus its re-read was ~20% of the old kernel's time;
    an (L,L)-bias operand variant measured 4.8 ms/layer, this one 4.6,
    the old one-window-per-step bias-operand kernel 5.9). The VMEM
    concat is cheap at window size; the attention matrix itself never
    touches HBM — that is the win over the XLA path (17.5 ms/block)."""
    qq = (q_ref[...].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    g = qq.shape[0]
    qa = jnp.concatenate([qq, bh_ref[...], bw_ref[...]], axis=2)
    eh = jnp.broadcast_to(eh_ref[...][None], (g,) + eh_ref.shape)
    ew = jnp.broadcast_to(ew_ref[...][None], (g,) + ew_ref.shape)
    ka = jnp.concatenate([k_ref[...], eh, ew], axis=2)
    s = jax.lax.dot_general(
        qa, ka, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (G, L, L)
    v = v_ref[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # normalize on the (L, d) output, not the (L, L) tile (fewer VPU
    # divides; bitwise-equivalent up to fp rounding).
    l_sum = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (G, L, d)
    o_ref[...] = (o / l_sum).astype(o_ref.dtype)


def _window_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, interpret):
    """q/k/v: (BW, L, nh, d), L = wh*ww (one window per leading row).

    Windows*heads are flattened into one batched dim and processed in
    groups per grid step. Group size is VMEM-bound: the in-flight
    (G, L, L) fp32 logits plus double-buffered operand blocks must stay
    under the 16 MB scoped-vmem budget (G=16 bf16 compiles; G=16 fp32
    OOMs at 19.75M — hence the itemsize-dependent cap)."""
    wh, ww = hw
    bw_, l, nh, d = q.shape
    Bh, Bw = _band_tables(q, rel_h, rel_w, hw)    # fp32 (BW, nh, L, *)
    bh = Bh.astype(q.dtype).reshape(bw_ * nh, l, wh)
    bw = Bw.astype(q.dtype).reshape(bw_ * nh, l, ww)
    qf = q.transpose(0, 2, 1, 3).reshape(bw_ * nh, l, d)
    kf = k.transpose(0, 2, 1, 3).reshape(bw_ * nh, l, d)
    vf = v.transpose(0, 2, 1, 3).reshape(bw_ * nh, l, d)
    Eh, Ew = _expanders(hw, q.dtype)              # (L, wh), (L, ww)

    g = bw_ * nh
    group = 16 if jnp.dtype(q.dtype).itemsize <= 2 else 8
    group = min(group, g)
    while g % group:
        group //= 2

    out = pl.pallas_call(
        functools.partial(_window_kernel, sm_scale=sm_scale),
        grid=(g // group,),
        in_specs=[
            pl.BlockSpec((group, l, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, wh), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, ww), lambda i: (i, 0, 0)),
            pl.BlockSpec((l, wh), lambda i: (0, 0)),
            pl.BlockSpec((l, ww), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((group, l, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, l, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bh, bw, Eh, Ew)
    return out.reshape(bw_, nh, l, d).transpose(0, 2, 1, 3)


def _window_xla(q, k, v, rel_h, rel_w, hw, sm_scale):
    # NOTE: adding the decomposed bias as lazy 6D broadcasts (avoiding
    # the materialized (L, L) bias) measured SLOWER on v5e (979 vs 835 ms
    # full encoder) — the reshape between einsum and softmax breaks XLA's
    # fusion. Materialized bias stays.
    bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw, hw)
    return mha_reference(q, k, v, bias=bias, sm_scale=sm_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _window_fused(q, k, v, rel_h, rel_w, hw, sm_scale, interpret):
    return _window_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, interpret)


def _window_fwd_rule(q, k, v, rel_h, rel_w, hw, sm_scale, interpret):
    out = _window_fwd(q, k, v, rel_h, rel_w, hw, sm_scale, interpret)
    return out, (q, k, v, rel_h, rel_w)


def _window_bwd_rule(hw, sm_scale, interpret, res, g):
    """Backward via the XLA path's VJP (the SAM encoder is frozen in the
    reference recipe; this path exists for correctness, not speed)."""
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, rh, rw: _window_xla(q_, k_, v_, rh, rw, hw,
                                               sm_scale),
        q, k, v, rel_h, rel_w)
    return vjp(g)


_window_fused.defvjp(_window_fwd_rule, _window_bwd_rule)


def _natural_band_tables(q_nat, rel_h, rel_w, hw: Tuple[int, int],
                         kp: int, mask_pad: bool = False):
    """Band tables in the qkv dense's NATURAL layout.

    q_nat: (BW, L, nh, d) — no head transpose. L may exceed hw[0]*hw[1]
    (tile-pad rows, see window_partition lpad): pad rows get row index
    clipped to H-1 — their tables are garbage, but pad QUERIES are
    dropped by the caller and pad KEYS are -inf-masked in the kernel.
    Returns Bh/Bw as (BW, L, nh*kp) with the key index padded 14 -> kp
    by zero columns (zero-padded Rh/Rw columns are never selected by the
    in-kernel one-hot expanders, so the padding is inert).

    The einsum "bhwnc,hkc->bhwnk" keeps l-major output order — unlike
    the head-major "bhwnc,hkc->bnhwk" of _band_tables, XLA needs no
    relayout of the 300 MB q operand (measured 5.4 -> ~1 ms/layer at
    batch 24)."""
    H, W = hw
    bw_, l, nh, d = q_nat.shape
    Rh = get_rel_pos(H, H, rel_h)                     # (H, H, d)
    Rw = get_rel_pos(W, W, rel_w)                     # (W, W, d)
    Rh = jnp.pad(Rh, ((0, 0), (0, kp - H), (0, 0))).astype(q_nat.dtype)
    Rw = jnp.pad(Rw, ((0, 0), (0, kp - W), (0, 0))).astype(q_nat.dtype)
    # Pre-gathered (L, kp, d) tables + l-batched einsum: the q operand
    # stays in its natural l-major layout with NO reshape to (H, W)
    # spatial form, so XLA emits no relayout. A/B on v5e at batch 24
    # (tools/bench_kernels.py bandforms): this form 4.75 ms/layer vs
    # 5.85 for the h/w-batched spatial form and 5.08 for a fused-concat
    # variant; the tiny kp=16 output width bounds the MXU rate in every
    # formulation, so the layout is the whole difference.
    rows = np.minimum(np.arange(l) // W, H - 1)
    cols = np.minimum(np.arange(l) % W, W - 1)
    Bh = jnp.einsum("blnc,lkc->blnk", q_nat, Rh[rows],
                    preferred_element_type=jnp.float32)
    Bw = jnp.einsum("blnc,lkc->blnk", q_nat, Rw[cols],
                    preferred_element_type=jnp.float32)
    if mask_pad:
        # Tile-pad KEY masking for free: a pad key j (j >= H*W) has
        # row(j) >= H, so its one-hot expander column selects a Bh
        # column in [H, (l-1)//W] — which content keys (row < H) never
        # select. Writing -1e30 there adds -inf to every query's logit
        # against pad keys with ZERO in-kernel mask work.
        rmax = (l - 1) // W
        assert kp > rmax, (kp, rmax)
        Bh = Bh.at[..., H:rmax + 1].set(-1e30)
    return (Bh.astype(q_nat.dtype).reshape(bw_, l, nh * kp),
            Bw.astype(q_nat.dtype).reshape(bw_, l, nh * kp))


def _natural_band_tables_cat(q_nat, rel_h, rel_w, hw: Tuple[int, int],
                             kp: int, mask_pad: bool = False):
    """Combined band tables: ONE einsum over a concatenated (L, 2kp, d)
    table instead of two passes over the 300 MB q operand (measured
    5.26 -> 4.40 ms/layer at batch 24 on v5e, production lpad layout).

    Returns (BW, L, nh*2kp) with per-head lane order [Bh(kp) | Bw(kp)]
    — the order the kernels' K-side augmentation [k | eh | ew] expects,
    so the per-head slice is one contiguous 2kp lane block."""
    H, W = hw
    bw_, l, nh, d = q_nat.shape
    Rh = get_rel_pos(H, H, rel_h)                     # (H, H, d)
    Rw = get_rel_pos(W, W, rel_w)                     # (W, W, d)
    Rh = jnp.pad(Rh, ((0, 0), (0, kp - H), (0, 0))).astype(q_nat.dtype)
    Rw = jnp.pad(Rw, ((0, 0), (0, kp - W), (0, 0))).astype(q_nat.dtype)
    rows = np.minimum(np.arange(l) // W, H - 1)
    cols = np.minimum(np.arange(l) % W, W - 1)
    Rcat = jnp.concatenate([Rh[rows], Rw[cols]], axis=1)  # (L, 2kp, d)
    B = jnp.einsum("blnc,lkc->blnk", q_nat, Rcat,
                   preferred_element_type=jnp.float32)
    if mask_pad:
        # Tile-pad KEY masking for free (see _natural_band_tables): the
        # Bh half occupies cat columns [0, kp), so the poisoned columns
        # [H, rmax] stay inside the first half.
        rmax = (l - 1) // W
        assert kp > rmax, (kp, rmax)
        B = B.at[..., H:rmax + 1].set(-1e30)
    return B.astype(q_nat.dtype).reshape(bw_, l, nh * 2 * kp)


def _key_pad_mask(l, lcont):
    """(l, l) fp32 additive mask: -inf on key columns >= lcont (the
    tile-pad rows appended by window_partition's lpad). None when the
    window has no pad rows."""
    if lcont >= l:
        return None
    kcol = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    return jnp.where(kcol < lcont, 0.0, -1e30).astype(jnp.float32)


def _window_qkv_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *,
                       nh, d, kp, hw, lcont, sm_scale):
    """Natural-layout windowed attention: one grid step processes a
    group of whole windows with ALL heads via an unrolled head loop on
    lane slices. q/k/v refs are (G, L, nh*d) lane-blocks of the SAME
    qkv dense output (BlockSpec lane-block aliasing — no HBM transpose,
    slice, or per-head relayout ever happens). b is the COMBINED
    (G, L, nh*2kp) band table, per-head lane order [Bh | Bw]
    (_natural_band_tables_cat). The one-hot key expanders are built
    in-kernel from iota (they are (L, kp) constants; as operands their
    lane dim would break Mosaic's 128-alignment rule)."""
    H, W = hw
    g, l, _ = q_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 1)
    eh = (rows // W == ridx).astype(q_ref.dtype)      # (L, kp)
    ew = (rows % W == ridx).astype(q_ref.dtype)
    ehg = jnp.broadcast_to(eh[None], (g, l, kp))
    ewg = jnp.broadcast_to(ew[None], (g, l, kp))
    kmask = _key_pad_mask(l, lcont)
    for h in range(nh):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        vh = v_ref[:, :, h * d:(h + 1) * d]
        bc = b_ref[:, :, h * 2 * kp:(h + 1) * 2 * kp]  # [Bh | Bw]
        qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
        qa = jnp.concatenate([qs, bc], axis=2)        # (G, L, d+2kp)
        ka = jnp.concatenate([kh, ehg, ewg], axis=2)
        s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if kmask is not None:
            s = s + kmask[None]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # normalize on the (L, d) output, not the (L, L) tile: ~2.5x
        # fewer VPU divides (d=80 -> 128 lanes vs L=196 -> 256).
        l_sum = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, h * d:(h + 1) * d] = (o / l_sum).astype(o_ref.dtype)


def _window_qkv_kernel_db(q_ref, k_ref, v_ref, b_ref, o_ref, *,
                          hh, d, kp, hw, lcont, sm_scale):
    """Dot-batched natural-layout windowed attention: the grid carries a
    head-half dim, and the hh heads of the step are stacked into the
    BATCH dim of ONE batched dot_general (hh*G dots per MXU issue), so
    Mosaic amortizes MXU fill latency across all heads instead of
    issuing nh sequential (L, d+2kp) dots. Measured 6.45 vs 10.87
    ms/layer against the head-loop kernel at batch 24 on v5e
    (tools/bench_kernels.py winvar). Refs are (G, L, hh*d) lane blocks
    of the SAME qkv dense output (no HBM relayout); b is the COMBINED
    (G, L, hh*2kp) band-table lane block, per-head [Bh | Bw]."""
    H, W = hw
    g, l, _ = q_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 1)
    eh = (rows // W == ridx).astype(q_ref.dtype)      # (L, kp)
    ew = (rows % W == ridx).astype(q_ref.dtype)
    qa_list, ka_list, v_list = [], [], []
    for h in range(hh):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        v_list.append(v_ref[:, :, h * d:(h + 1) * d])
        bc = b_ref[:, :, h * 2 * kp:(h + 1) * 2 * kp]  # [Bh | Bw]
        qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
        qa_list.append(jnp.concatenate([qs, bc], axis=2))
        ka_list.append(jnp.concatenate(
            [kh, jnp.broadcast_to(eh[None], (g, l, kp)),
             jnp.broadcast_to(ew[None], (g, l, kp))], axis=2))
    qa = jnp.concatenate(qa_list, axis=0)             # (hh*G, L, d+2kp)
    ka = jnp.concatenate(ka_list, axis=0)
    vv = jnp.concatenate(v_list, axis=0)              # (hh*G, L, d)
    s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    kmask = _key_pad_mask(l, lcont)
    if kmask is not None:
        s = s + kmask[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l_sum = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(vv.dtype), vv,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o / l_sum                                     # (hh*G, L, d)
    for h in range(hh):
        o_ref[:, :, h * d:(h + 1) * d] = \
            o[h * g:(h + 1) * g].astype(o_ref.dtype)


def _rel_band_operand(rel_h, rel_w, hw: Tuple[int, int], kp: int, dtype):
    """All-rows rel-pos operand for the in-kernel band computation:
    (d, 2*H*kp) with lane order [Rh row-blocks | Rw col-blocks],
    Rall[c, r*kp + k] = R[r, k, c]. A few hundred KB — broadcast to
    every grid step, replacing the (BW, L, nh*2kp) HBM band tables."""
    H, W = hw
    Rh = get_rel_pos(H, H, rel_h)                      # (H, H, d)
    Rw = get_rel_pos(W, W, rel_w)                      # (W, W, d)
    Rh = jnp.pad(Rh, ((0, 0), (0, kp - H), (0, 0)))
    Rw = jnp.pad(Rw, ((0, 0), (0, kp - W), (0, 0)))
    d = Rh.shape[-1]
    cat = jnp.concatenate([Rh.reshape(H * kp, d),
                           Rw.reshape(W * kp, d)], axis=0)
    return cat.T.astype(dtype)                         # (d, 2*H*kp)


def _window_qkv_kernel_db_iband(q_ref, k_ref, v_ref, r_ref, o_ref, *,
                                hh, d, kp, hw, lcont, sm_scale,
                                band_mask):
    """Dot-batched windowed attention with the band tables computed
    IN-KERNEL (VERDICT r4 item 1: the XLA band einsum was ~5.1 ms/layer
    at batch 32 — the largest unfused block left in the encoder hot
    path — and its (BW, L, nh*2kp) output is a full HBM round trip).

    Instead of the l-batched gather-einsum, each head computes the
    ALL-ROWS bias dot  B_all = q_h @ Rall  — (G*L, d) x (d, 2*H*kp), an
    MXU-shaped matmul against the tiny broadcast operand `r_ref`
    (_rel_band_operand) — then reduces it to the (G, L, 2kp) per-query
    band with a query-side row/col MASK (VPU elementwise) and a fixed
    one-hot SELECTION matmul (no lane slicing, no gather):

        bc[l, k]        = sum_r 1[row(l) == r] * B_all[l, r*kp + k]
        (and the col half likewise)

    This computes H x the minimal band FLOPs, but at full MXU rate the
    whole pass costs ~1-2 ms/layer vs 5.1 ms for the layout-bound XLA
    einsum — and the band never touches HBM. Bit-compatibility: same
    bf16 operands, f32 accumulation, exact one-hot select, same -1e30
    tile-pad poison as _natural_band_tables_cat(mask_pad=True)."""
    H, W = hw
    g, l, _ = q_ref.shape
    P = H * kp
    dt = q_ref.dtype
    # K-side one-hot expanders (as in _window_qkv_kernel_db).
    rows_k = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 1)
    eh = (rows_k // W == ridx).astype(dt)
    ew = (rows_k % W == ridx).astype(dt)
    # Query-side row/col mask over the all-rows band: (G*L, 2P).
    # NOTE: no boolean-select (`where` over i1 branches) — Mosaic on
    # v5e rejects the i1 select lowering ("Unsupported target bitwidth
    # for truncation"; the chipless AOT check accepted it). Masks are
    # composed as f32 products of individually-cast comparisons.
    gl = g * l
    qrow = jax.lax.broadcasted_iota(jnp.int32, (gl, 2 * P), 0) % l
    jlane = jax.lax.broadcasted_iota(jnp.int32, (gl, 2 * P), 1)
    rblk = (jlane % P) // kp
    is_row_half = (jlane < P).astype(jnp.float32)
    mask = (is_row_half * (qrow // W == rblk).astype(jnp.float32)
            + (1.0 - is_row_half)
            * (qrow % W == rblk).astype(jnp.float32))
    # Selection matrix (2P, 2kp): row half -> first kp lanes, col half
    # -> last kp lanes, preserving the in-block key index.
    sj = jax.lax.broadcasted_iota(jnp.int32, (2 * P, 2 * kp), 0)
    so = jax.lax.broadcasted_iota(jnp.int32, (2 * P, 2 * kp), 1)
    sel = ((sj < P).astype(jnp.float32)
           * (so < kp).astype(jnp.float32)
           * (sj % kp == so).astype(jnp.float32)
           + (sj >= P).astype(jnp.float32)
           * (so >= kp).astype(jnp.float32)
           * (sj % kp == so - kp).astype(jnp.float32))
    # Tile-pad key poison lanes (Bh half, key rows [H, rmax]).
    if band_mask:
        rmax = (l - 1) // W
        pl_lane = jax.lax.broadcasted_iota(jnp.int32, (l, 2 * kp), 1)
        poison = (pl_lane < kp) & (pl_lane >= H) & (pl_lane <= rmax)
    kmask = None if band_mask else _key_pad_mask(l, lcont)
    qa_list, ka_list, v_list = [], [], []
    for h in range(hh):
        qh = q_ref[:, :, h * d:(h + 1) * d]
        kh = k_ref[:, :, h * d:(h + 1) * d]
        v_list.append(v_ref[:, :, h * d:(h + 1) * d])
        b_all = jax.lax.dot_general(
            qh.reshape(gl, d), r_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (G*L, 2P)
        bsel = jax.lax.dot_general(
            b_all * mask, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (G*L, 2kp)
        bc = bsel.reshape(g, l, 2 * kp)
        if band_mask:
            bc = jnp.where(poison[None], -1e30, bc)
        qs = (qh.astype(jnp.float32) * sm_scale).astype(dt)
        qa_list.append(jnp.concatenate([qs, bc.astype(dt)], axis=2))
        ka_list.append(jnp.concatenate(
            [kh, jnp.broadcast_to(eh[None], (g, l, kp)),
             jnp.broadcast_to(ew[None], (g, l, kp))], axis=2))
    qa = jnp.concatenate(qa_list, axis=0)              # (hh*G, L, d+2kp)
    ka = jnp.concatenate(ka_list, axis=0)
    vv = jnp.concatenate(v_list, axis=0)
    s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if kmask is not None:
        s = s + kmask[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l_sum = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(vv.dtype), vv,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o / l_sum
    for h in range(hh):
        o_ref[:, :, h * d:(h + 1) * d] = \
            o[h * g:(h + 1) * g].astype(o_ref.dtype)


def _window_qkv_band_fwd(operands, rel_h, rel_w, hw, nh, sm_scale,
                         interpret, split):
    """In-kernel-band forward. operands = (qkv,) for the fused dense
    output or (q3, kv3) for the column-split projection; both reuse
    _window_qkv_kernel_db_iband with different BlockSpecs. Caller
    guarantees db_ok-style alignment (checked again here)."""
    wh, ww = hw
    if split:
        q3, kv3 = operands
        bw_, l, c = q3.shape
    else:
        (qkv,) = operands
        bw_, l, f = qkv.shape
        c = f // 3
    d = c // nh
    lcont = wh * ww
    kp = 16
    # kp must also cover the window side: the band tables pad the
    # (wh, wh, d) rel-pos slices out to kp keys (ADVICE r4 finding 1 —
    # previously a negative jnp.pad for window_size > 16).
    while kp < max(wh, ww) or (nh * kp) % 128:
        kp += 16
    band_mask = l > lcont and kp > (l - 1) // ww
    kernel_lcont = l if band_mask else lcont
    rall = _rel_band_operand(rel_h, rel_w, hw,
                             kp, qkv.dtype if not split else q3.dtype)

    group = _window_group(bw_, rall.dtype)
    pad = (-bw_) % group
    if pad:
        if split:
            q3 = jnp.pad(q3, ((0, pad), (0, 0), (0, 0)))
            kv3 = jnp.pad(kv3, ((0, pad), (0, 0), (0, 0)))
        else:
            qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
    bwp = bw_ + pad

    hh = nh // 2
    hc = hh * d
    P2 = 2 * wh * kp
    kern = functools.partial(
        _window_qkv_kernel_db_iband, hh=hh, d=d, kp=kp, hw=hw,
        lcont=kernel_lcont, sm_scale=sm_scale, band_mask=band_mask)
    rspec = pl.BlockSpec((d, P2), lambda i, h: (0, 0))
    common = dict(
        grid=(bwp // group, 2),
        out_specs=pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
        out_shape=jax.ShapeDtypeStruct((bwp, l, c), rall.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret)
    if split:
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 2 + h)),
                rspec,
            ],
            **common,
        )(q3, kv3, kv3, rall)
    else:
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 4 + h)),
                rspec,
            ],
            **common,
        )(qkv, qkv, qkv, rall)
    return out[:bw_] if pad else out


def _ikband_enabled():
    import os

    return os.environ.get("HAFF_WINDOW_IKBAND", "1") == "1"


def _pick_group(bw_, default):
    """Trace-time group-size choice: deviate from the tuned default
    only when a smaller group saves MEANINGFUL pad work (>10% of the
    padded window total) — shallower groups cost per-step operand
    bandwidth and pipeline depth, so near-ties go to the default.
    Candidates stop at default//2 (never the degenerate G=1/2 for
    awkward counts). Large batches keep the default (600/800 windows
    % 8 == 0, zero pad); batch 1 (25 windows) picks G=5 (zero pad),
    measured 1.055 vs 1.219 ms/layer against padded G=8 on v5e
    (winprof b1) — the single-frame-serving fix of VERDICT r2 item 3;
    batch 4 (100 windows) keeps G=8 (4% pad is cheaper than dropping
    to G=5)."""
    default = min(default, bw_)
    best = default
    default_total = -(-bw_ // default) * default
    best_total = default_total
    for g in range(default - 1, max(default // 2, 1) - 1, -1):
        total = -(-bw_ // g) * g
        if total < best_total and total < 0.9 * default_total:
            best, best_total = g, total
    return best


def _window_group(bw_, dtype):
    """Resolve the window-kernel group size: tuned dtype default,
    HAFF_WINDOW_GROUP override (malformed values keep the default),
    padding-aware shrink via _pick_group. Shared by the fused and
    split-operand forward variants so their tuning cannot diverge."""
    import os

    group = 8 if jnp.dtype(dtype).itemsize <= 2 else 4
    env_g = os.environ.get("HAFF_WINDOW_GROUP", "")
    if env_g.strip().isdigit():
        return max(1, min(int(env_g), bw_))
    return _pick_group(bw_, group)


def _global_kp(hw, nh):
    """Key-index pad for the global band tables: >= max(H, W) and
    (nh * kp) 128-lane aligned. Shared by sam_global_attention_qkv's
    alignment guard and _global_qkv_fwd — the guard is only valid while
    both use the same kp."""
    kp = 16
    while kp < max(hw) or (nh * kp) % 128:
        kp += 16
    return kp


def _window_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret):
    """qkv: (BW, L, 3*nh*d) natural dense output, feature order
    [q | k | v] each head-major (nh, d). L may exceed hw[0]*hw[1]: the
    extra rows are window_partition's tile-pad rows (lpad) — their key
    columns are -inf-masked in-kernel and their output rows are garbage
    the caller drops. Returns (BW, L, nh*d)."""
    wh, ww = hw
    bw_, l, f = qkv.shape
    c = f // 3
    d = c // nh
    lcont = wh * ww
    # kp: key-index pad so the bh/bw lane dim (nh*kp) is 128-aligned.
    kp = 16
    # kp must also cover the window side: the band tables pad the
    # (wh, wh, d) rel-pos slices out to kp keys (ADVICE r4 finding 1 —
    # previously a negative jnp.pad for window_size > 16).
    while kp < max(wh, ww) or (nh * kp) % 128:
        kp += 16
    hh_ = nh // 2
    if (_ikband_enabled() and nh % 2 == 0 and (hh_ * d) % 128 == 0
            and (hh_ * kp) % 128 == 0 and wh == ww and kp >= wh):
        return _window_qkv_band_fwd((qkv,), rel_h, rel_w, hw, nh,
                                    sm_scale, interpret, split=False)
    # Slice q through the flat 2D view: with lpad the qkv tensor IS a
    # row-major 2D matmul output, and phrasing the slice on that view
    # measured 4.40 vs 5.26 ms/layer for the band stage at batch 24
    # (tools/bench_kernels.py + _band_exp A/B, v5e).
    q_nat = qkv.reshape(bw_ * l, f)[:, :c].reshape(bw_, l, nh, d)
    # Pad keys are masked through the band table's -1e30 column when
    # possible (zero kernel cost; also avoids a Mosaic vector-layout
    # crash the in-kernel (L, L) iota mask triggers at L=200); the
    # in-kernel kmask is the fallback for windows >= kp.
    band_mask = l > lcont and kp > (l - 1) // ww
    bt = _natural_band_tables_cat(q_nat, rel_h, rel_w, hw, kp,
                                  mask_pad=band_mask)
    kernel_lcont = l if band_mask else lcont

    # Default G=8 with parallel grid semantics + a raised scoped-VMEM
    # limit (tools/bench_kernels.py winvar: v6-params G=8 3.79 ms/layer
    # vs the previous G=2 default 4.21 at batch 24 on v5e; G>2 without
    # the compiler params fails Mosaic's default scoped-VMEM budget).
    # HAFF_WINDOW_GROUP overrides for A/B at other batch shapes.
    group = _window_group(bw_, qkv.dtype)
    # Pad the window dim up to a group multiple rather than shrinking to
    # G=1 (which halves per-step operand bandwidth and pipeline depth);
    # _pick_group balances pad waste against group depth. Zero-padded
    # windows produce a uniform softmax over zero values -> zero output
    # rows, discarded below.
    pad = (-bw_) % group
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        bt = jnp.pad(bt, ((0, pad), (0, 0), (0, 0)))
    bwp = bw_ + pad

    # Dot-batched structure (one giant batched dot across a head-half
    # grid dim) when the half-head lane blocks are 128-aligned; falls
    # back to the unrolled head-loop kernel otherwise (tiny test
    # configs, odd head counts).
    hh = nh // 2
    db_ok = (nh % 2 == 0 and (hh * d) % 128 == 0
             and (hh * kp) % 128 == 0)
    if db_ok:
        hc, hb = hh * d, hh * 2 * kp
        out = pl.pallas_call(
            functools.partial(_window_qkv_kernel_db, hh=hh, d=d, kp=kp,
                              hw=hw, lcont=kernel_lcont, sm_scale=sm_scale),
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 4 + h)),
                pl.BlockSpec((group, l, hb), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, l, hc),
                                   lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, l, c), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(qkv, qkv, qkv, bt)
        return out[:bw_] if pad else out

    out = pl.pallas_call(
        functools.partial(_window_qkv_kernel, nh=nh, d=d, kp=kp, hw=hw,
                          lcont=kernel_lcont, sm_scale=sm_scale),
        grid=(bwp // group,),
        in_specs=[
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 1)),
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 2)),
            pl.BlockSpec((group, l, nh * 2 * kp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bwp, l, c), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, bt)
    return out[:bw_] if pad else out


def _window_qkv_split_fwd(q3, kv3, rel_h, rel_w, hw, nh, sm_scale,
                          interpret):
    """Split-operand variant of _window_qkv_fwd: q3 (BW, L, C) and
    kv3 (BW, L, 2C) are the outputs of a COLUMN-SPLIT qkv projection
    (layers.QDense out_split=(C, 2C)). Same kernels, two-operand
    BlockSpecs — still zero HBM relayouts. The point is the band-table
    einsum: on the fused (BW, L, 3C) output it reads q as a strided
    slice, which costs ~5x a contiguous operand (tools/bench_kernels.py
    attnpath: band-slice 5.38 vs band-dense 1.12 ms/layer, batch 24,
    v5e). Here q3 IS that contiguous operand."""
    wh, ww = hw
    bw_, l, c = q3.shape
    d = c // nh
    lcont = wh * ww
    kp = 16
    # kp must also cover the window side: the band tables pad the
    # (wh, wh, d) rel-pos slices out to kp keys (ADVICE r4 finding 1 —
    # previously a negative jnp.pad for window_size > 16).
    while kp < max(wh, ww) or (nh * kp) % 128:
        kp += 16
    hh_ = nh // 2
    if (_ikband_enabled() and nh % 2 == 0 and (hh_ * d) % 128 == 0
            and (hh_ * kp) % 128 == 0 and wh == ww and kp >= wh):
        return _window_qkv_band_fwd((q3, kv3), rel_h, rel_w, hw, nh,
                                    sm_scale, interpret, split=True)
    q_nat = q3.reshape(bw_, l, nh, d)          # contiguous view — free
    band_mask = l > lcont and kp > (l - 1) // ww
    bt = _natural_band_tables_cat(q_nat, rel_h, rel_w, hw, kp,
                                  mask_pad=band_mask)
    kernel_lcont = l if band_mask else lcont

    group = _window_group(bw_, q3.dtype)
    pad = (-bw_) % group
    if pad:
        q3 = jnp.pad(q3, ((0, pad), (0, 0), (0, 0)))
        kv3 = jnp.pad(kv3, ((0, pad), (0, 0), (0, 0)))
        bt = jnp.pad(bt, ((0, pad), (0, 0), (0, 0)))
    bwp = bw_ + pad

    hh = nh // 2
    db_ok = (nh % 2 == 0 and (hh * d) % 128 == 0
             and (hh * kp) % 128 == 0)
    if db_ok:
        hc, hb = hh * d, hh * 2 * kp
        out = pl.pallas_call(
            functools.partial(_window_qkv_kernel_db, hh=hh, d=d, kp=kp,
                              hw=hw, lcont=kernel_lcont, sm_scale=sm_scale),
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, l, hc), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, l, hb), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, l, hc),
                                   lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, l, c), q3.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(q3, kv3, kv3, bt)
        return out[:bw_] if pad else out

    out = pl.pallas_call(
        functools.partial(_window_qkv_kernel, nh=nh, d=d, kp=kp, hw=hw,
                          lcont=kernel_lcont, sm_scale=sm_scale),
        grid=(bwp // group,),
        in_specs=[
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l, c), lambda i: (i, 0, 1)),
            pl.BlockSpec((group, l, nh * 2 * kp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bwp, l, c), q3.dtype),
        interpret=interpret,
    )(q3, kv3, kv3, bt)
    return out[:bw_] if pad else out


def _window_qkv_split_xla(q3, kv3, rel_h, rel_w, hw, nh, sm_scale):
    bw_, l, c = q3.shape
    d = c // nh
    lcont = hw[0] * hw[1]
    q = q3[:, :lcont].reshape(bw_, lcont, nh, d)
    kv5 = kv3[:, :lcont].reshape(bw_, lcont, 2, nh, d)
    out = _window_xla(q, kv5[:, :, 0], kv5[:, :, 1], rel_h, rel_w, hw,
                      sm_scale)
    out = out.reshape(bw_, lcont, c)
    if l > lcont:
        out = jnp.pad(out, ((0, 0), (0, l - lcont), (0, 0)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _window_qkv_split_fused(q3, kv3, rel_h, rel_w, hw, nh, sm_scale,
                            interpret):
    return _window_qkv_split_fwd(q3, kv3, rel_h, rel_w, hw, nh, sm_scale,
                                 interpret)


def _window_qkv_split_fwd_rule(q3, kv3, rel_h, rel_w, hw, nh, sm_scale,
                               interpret):
    out = _window_qkv_split_fwd(q3, kv3, rel_h, rel_w, hw, nh, sm_scale,
                                interpret)
    return out, (q3, kv3, rel_h, rel_w)


def _window_qkv_split_bwd_rule(hw, nh, sm_scale, interpret, res, g):
    """Backward via the XLA path's VJP (frozen-encoder recipe — matches
    _window_qkv_bwd_rule)."""
    q3, kv3, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda a, b, rh, rw: _window_qkv_split_xla(a, b, rh, rw, hw, nh,
                                                   sm_scale),
        q3, kv3, rel_h, rel_w)
    return vjp(g)


_window_qkv_split_fused.defvjp(_window_qkv_split_fwd_rule,
                               _window_qkv_split_bwd_rule)


def sam_window_attention_qkv_split(q3, kv3, rel_h, rel_w,
                                   hw: Tuple[int, int], num_heads: int,
                                   sm_scale=None, force_xla: bool = False,
                                   interpret=None,
                                   train_rel_pos: bool = False):
    """Windowed SAM attention over a COLUMN-SPLIT qkv projection:
    q3 (BW, L, C) and kv3 (BW, L, 2C), both natural 2D-matmul outputs
    (layers.QDense out_split). Equal values to
    sam_window_attention_qkv(concat([q3, kv3], -1), ...) — the split
    exists so the band-table einsum reads a contiguous q operand
    instead of a strided slice of the fused dense output."""
    wh, ww = hw
    c = q3.shape[-1]
    d = c // num_heads
    if sm_scale is None:
        sm_scale = d ** -0.5
    aligned = c % 128 == 0 and (
        q3.shape[1] == wh * ww
        or (q3.shape[1] > wh * ww and q3.shape[1] % 8 == 0))
    if force_xla or train_rel_pos or q3.shape[0] == 0 or not aligned:
        return _window_qkv_split_xla(q3, kv3, rel_h, rel_w, hw, num_heads,
                                     sm_scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _window_qkv_split_fused(q3, kv3, rel_h, rel_w, hw, num_heads,
                                   sm_scale, interpret)


def _window_qkv_xla(qkv, rel_h, rel_w, hw, nh, sm_scale):
    bw_, l, f = qkv.shape
    c = f // 3
    d = c // nh
    lcont = hw[0] * hw[1]
    qkv5 = qkv[:, :lcont].reshape(bw_, lcont, 3, nh, d)
    q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
    out = _window_xla(q, k, v, rel_h, rel_w, hw, sm_scale)
    out = out.reshape(bw_, lcont, c)
    if l > lcont:  # tile-pad rows: zero output (caller drops them)
        out = jnp.pad(out, ((0, 0), (0, l - lcont), (0, 0)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _window_qkv_fused(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret):
    return _window_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret)


def _window_qkv_fwd_rule(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret):
    out = _window_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret)
    return out, (qkv, rel_h, rel_w)


def _window_qkv_bwd_rule(hw, nh, sm_scale, interpret, res, g):
    """Backward via the XLA path's VJP (frozen-encoder recipe; exists
    for correctness, not speed — matches _window_bwd_rule)."""
    qkv, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda a, rh, rw: _window_qkv_xla(a, rh, rw, hw, nh, sm_scale),
        qkv, rel_h, rel_w)
    return vjp(g)


_window_qkv_fused.defvjp(_window_qkv_fwd_rule, _window_qkv_bwd_rule)


def sam_window_attention_qkv(qkv, rel_h, rel_w, hw: Tuple[int, int],
                             num_heads: int, sm_scale=None,
                             force_xla: bool = False, interpret=None,
                             train_rel_pos: bool = False):
    """Windowed SAM attention consuming the qkv projection output in its
    NATURAL layout (BW, L, 3*nh*d), L == hw[0]*hw[1]; returns
    (BW, L, nh*d) ready for the output projection.

    This is the zero-relayout path: the old sam_window_attention API
    required (BW, L, nh, d) per-head operands, which cost a q/k/v slice
    materialization + 3 head-major HBM transposes + a head-major band
    table einsum + an output transpose — ~11 ms/layer of pure data
    movement at batch 24 on v5e (measured; the kernel itself is ~7 ms).
    Falls back to the XLA path when the head layout cannot be
    lane-blocked (C not 128-aligned)."""
    wh, ww = hw
    c = qkv.shape[-1] // 3
    d = c // num_heads
    if sm_scale is None:
        sm_scale = d ** -0.5
    aligned = c % 128 == 0 and (
        qkv.shape[1] == wh * ww                            # legacy exact-L
        or (qkv.shape[1] > wh * ww and qkv.shape[1] % 8 == 0))  # lpad
    if force_xla or train_rel_pos or qkv.shape[0] == 0 or not aligned:
        return _window_qkv_xla(qkv, rel_h, rel_w, hw, num_heads, sm_scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _window_qkv_fused(qkv, rel_h, rel_w, hw, num_heads, sm_scale,
                             interpret)


def sam_window_attention(q, k, v, rel_h, rel_w, hw: Tuple[int, int],
                         sm_scale=None, force_xla: bool = False,
                         interpret=None, train_rel_pos: bool = False):
    """Windowed SAM attention: q/k/v (B*num_windows, L, nh, d) with
    L == hw[0]*hw[1]. Fused Pallas path keeps the per-window attention
    matrix in VMEM (the XLA path writes ~(BW, nh, L, L) fp32 transients
    to HBM every layer)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if force_xla or train_rel_pos or q.shape[0] == 0:
        return _window_xla(q, k, v, rel_h, rel_w, hw, sm_scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _window_fused(q, k, v, rel_h, rel_w, hw, sm_scale, interpret)


def sam_global_attention(q, k, v, rel_h, rel_w, hw: Tuple[int, int],
                         sm_scale=None, block_q: int = 512,
                         force_xla: bool = False, interpret=None,
                         train_rel_pos: bool = False):
    """q/k/v: (B, L, nh, d) with L == hw[0]*hw[1]. Returns (B, L, nh, d).

    Fused path needs zero (L, L) materialization; rel-pos tables are
    non-differentiable here (set train_rel_pos=True for the XLA path)."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    H, W = hw
    small = q.shape[1] < 256 or W % 8 != 0
    if force_xla or small or train_rel_pos:
        bias = decomposed_rel_pos_bias(q, rel_h, rel_w, hw, hw)
        return mha_reference(q, k, v, bias=bias, sm_scale=sm_scale)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused(q, k, v, rel_h, rel_w, hw, sm_scale, block_q, interpret)


# ---------------------------------------------------------------------------
# Natural-layout GLOBAL attention (qkv-form): the windowed kernels' zero-
# relayout design applied to the 4 global ViT-H layers (L = 4096)
# ---------------------------------------------------------------------------

def _global_qkv_kernel(q_ref, k_ref, v_ref, bt_ref, o_ref,
                       acc_ref, m_ref, l_ref, qa_ref=None, *,
                       hh, d, kp, W, blk, num_kb, sm_scale,
                       use_exp2=False):
    """Flash-style global attention over lane-blocked halves of the qkv
    dense output. Per (b, head-half, q-block) the kernel streams k
    blocks with online softmax; the hh heads of the half are stacked
    into the BATCH dim of one batched dot per block pair (the
    _window_qkv_kernel_db trick at L=4096). The decomposed rel-pos bias
    rides the QK matmul via feature augmentation [q*s, Bh, Bw] @
    [k, Eh, Ew]^T with the one-hot expanders built from iota + the
    absolute key offset of the current k block."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bt = bt_ref[0]
    koff = ki * blk
    rows = koff + jax.lax.broadcasted_iota(jnp.int32, (blk, kp), 0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (blk, kp), 1)
    eh = (rows // W == ridx).astype(q.dtype)          # (blk, kp)
    ew = (rows % W == ridx).astype(q.dtype)
    ka_list, v_list = [], []
    for h in range(hh):
        ka_list.append(jnp.concatenate(
            [k[:, h * d:(h + 1) * d], eh, ew], axis=1)[None])
        v_list.append(v[:, h * d:(h + 1) * d][None])
    ka = jnp.concatenate(ka_list, axis=0)             # (hh, blk, d+2kp)
    vv = jnp.concatenate(v_list, axis=0)              # (hh, blk, d)

    def _build_qa():
        qa_list = []
        for h in range(hh):
            qh = q[:, h * d:(h + 1) * d]
            qs = (qh.astype(jnp.float32) * sm_scale).astype(q.dtype)
            bc = bt[:, h * 2 * kp:(h + 1) * 2 * kp]   # [Bh | Bw]
            qa_list.append(jnp.concatenate([qs, bc], axis=1)[None])
        return jnp.concatenate(qa_list, axis=0)       # (hh, blq, d+2kp)

    if qa_ref is None:
        qa = _build_qa()
    else:
        # HAFF_GLOBAL_QAHOIST: qa depends only on the q block — build it
        # ONCE per q-block into VMEM scratch instead of re-concatenating
        # ~(hh, blq, d+2kp) on every k step (nk-1 redundant VPU passes).
        @pl.when(ki == 0)
        def _stash_qa():
            qa_ref[...] = _build_qa()

        qa = qa_ref[...]

    s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    if use_exp2:
        # exp(x) as the VPU-native exp2(x * log2 e): the softmax exp over
        # nh*L^2 elements is a VPU-bound candidate for the kernel's gap
        # vs its MXU flop bound (HAFF_GLOBAL_EXP2 A/B; last-ulp f32
        # differences vs jnp.exp).
        LOG2E = 1.4426950408889634
        p = jnp.exp2((s - m_new) * LOG2E)
        alpha = jnp.exp2((m_prev - m_new) * LOG2E)
    else:
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
    l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(vv.dtype), vv, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finalize():
        o = acc_ref[...] / l_ref[...]                 # (hh, blq, d)
        for h in range(hh):
            o_ref[0, :, h * d:(h + 1) * d] = o[h].astype(o_ref.dtype)


def _global_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret,
                    block_q: int = None, block_k: int = None):
    """qkv: (B, L, 3*nh*d) natural dense output, L == hw[0]*hw[1].
    Returns (B, L, nh*d). No HBM head transposes: q/k/v/band operands
    are lane-blocked views of the dense outputs (the old _fused path
    paid 3 head-major transposes of ~(B, 4096, 1280) + a head-major
    band einsum + an output transpose per layer)."""
    H, W = hw
    b, l, f = qkv.shape
    c = f // 3
    d = c // nh
    kp = _global_kp(hw, nh)
    q_nat = qkv.reshape(b * l, f)[:, :c].reshape(b, l, nh, d)
    bt = _natural_band_tables_cat(q_nat, rel_h, rel_w, hw, kp)

    import os

    # Defaults measured on v5e (bf16 sweep at the b8 ViT-H shape:
    # 1024/1024 12.39 ms/layer vs 512/1024 12.58, 512/2048 12.86,
    # 1024/512 15.51; 1024/2048 OOMs scoped vmem on register spills;
    # b32 confirms 1024/1024 49.6 vs 512/1024 51.4). Env knobs for A/B
    # — malformed or non-positive values keep the defaults, like
    # HAFF_WINDOW_GROUP.
    def _env_block(name, default):
        v = os.environ.get(name, "").strip()
        return int(v) if v.isdigit() and int(v) > 0 else default

    if block_q is None:
        block_q = _env_block("HAFF_GLOBAL_BQ", 1024)
    if block_k is None:
        block_k = _env_block("HAFF_GLOBAL_BK", 1024)
    block_q = min(block_q, l)
    while l % block_q:
        block_q //= 2
    block_k = min(block_k, l)
    while l % block_k:
        block_k //= 2
    nq = l // block_q
    nk = l // block_k

    hh = nh // 2
    hc, hb = hh * d, hh * 2 * kp
    qa_hoist = os.environ.get("HAFF_GLOBAL_QAHOIST") == "1"
    scratch = [
        pltpu.VMEM((hh, block_q, d), jnp.float32),
        pltpu.VMEM((hh, block_q, 1), jnp.float32),
        pltpu.VMEM((hh, block_q, 1), jnp.float32),
    ]
    if qa_hoist:
        scratch.append(pltpu.VMEM((hh, block_q, d + 2 * kp), qkv.dtype))
    out = pl.pallas_call(
        functools.partial(_global_qkv_kernel, hh=hh, d=d, kp=kp, W=W,
                          blk=block_k, num_kb=nk, sm_scale=sm_scale,
                          use_exp2=os.environ.get("HAFF_GLOBAL_EXP2")
                          == "1"),
        grid=(b, 2, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, hc),
                         lambda bi, hi, qi, ki: (bi, qi, hi)),
            pl.BlockSpec((1, block_k, hc),
                         lambda bi, hi, qi, ki: (bi, ki, 2 + hi)),
            pl.BlockSpec((1, block_k, hc),
                         lambda bi, hi, qi, ki: (bi, ki, 4 + hi)),
            pl.BlockSpec((1, block_q, hb),
                         lambda bi, hi, qi, ki: (bi, qi, hi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hc),
                               lambda bi, hi, qi, ki: (bi, qi, hi)),
        out_shape=jax.ShapeDtypeStruct((b, l, c), qkv.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv, qkv, qkv, bt)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _global_qkv(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret):
    return _global_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret)


def _global_qkv_fwd_rule(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret):
    out = _global_qkv_fwd(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret)
    return out, (qkv, rel_h, rel_w, out)


def _global_qkv_bwd_rule(hw, nh, sm_scale, interpret, res, g):
    qkv, rel_h, rel_w, out = res
    b, l, f = qkv.shape
    c = f // 3
    d = c // nh
    q = qkv[:, :, :c].reshape(b, l, nh, d)
    k = qkv[:, :, c:2 * c].reshape(b, l, nh, d)
    v = qkv[:, :, 2 * c:].reshape(b, l, nh, d)
    out4 = out.reshape(b, l, nh, d)
    g4 = g.reshape(b, l, nh, d)
    dq, dk, dv, drh, drw = _banded_bwd(
        (q, k, v, rel_h, rel_w, out4), g4, hw, sm_scale)
    dqkv = jnp.concatenate(
        [dq.reshape(b, l, c), dk.reshape(b, l, c), dv.reshape(b, l, c)],
        axis=-1)
    return dqkv, drh, drw


_global_qkv.defvjp(_global_qkv_fwd_rule, _global_qkv_bwd_rule)


def sam_global_attention_qkv(qkv, rel_h, rel_w, hw: Tuple[int, int],
                             num_heads: int, sm_scale=None,
                             force_xla: bool = False, interpret=None,
                             train_rel_pos: bool = False):
    """Global SAM attention consuming the qkv projection output in its
    NATURAL layout (B, L, 3*nh*d), L == hw[0]*hw[1]; returns
    (B, L, nh*d) ready for the output projection — the zero-relayout
    analog of sam_window_attention_qkv for the 4 global ViT-H layers
    (reference image_encoder.py:196-260 attention at layers
    {7,15,23,31})."""
    H, W = hw
    c = qkv.shape[-1] // 3
    d = c // num_heads
    nh = num_heads
    if sm_scale is None:
        sm_scale = d ** -0.5
    hh = nh // 2
    kp = _global_kp(hw, nh)
    aligned = (qkv.shape[1] == H * W and nh % 2 == 0
               and (hh * d) % 128 == 0 and (hh * 2 * kp) % 128 == 0
               and H * W >= 1024 and W % 8 == 0)
    if force_xla or train_rel_pos or qkv.shape[0] == 0 or not aligned:
        b, l, f = qkv.shape
        qkv5 = qkv.reshape(b, l, 3, nh, d)
        out = sam_global_attention(
            qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2], rel_h, rel_w,
            hw, sm_scale=sm_scale, force_xla=force_xla,
            interpret=interpret, train_rel_pos=train_rel_pos)
        return out.reshape(b, l, c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _global_qkv(qkv, rel_h, rel_w, hw, nh, sm_scale, interpret)
