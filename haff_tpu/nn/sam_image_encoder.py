"""SAM image encoder ViT, TPU-native.

Capability parity with reference segment_anything/modeling/image_encoder.py
(ViT-H: 32 blocks, embed 1280, 16 heads, window 14, global attention at
layers {7,15,23,31}, decomposed relative position bias, conv neck to 256ch).

Design differences from the reference (deliberate, TPU-first):
  * NHWC layout throughout (XLA's native conv layout on TPU).
  * The whole encoder is one jitted batched call — the reference loops
    images one at a time under no_grad with cuda.empty_cache()
    (reference: 2Haff/model/LISA.py:157-168, a GPU-memory workaround).
  * Windowed attention is batched over (batch x windows); relative
    position bias is computed in fp32 and added inside one fused
    einsum-attention; matmuls run in bf16 on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SamEncoderConfig
from .layers import ChannelLayerNorm, MLPBlock, QDense


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interpolate relative positional embeddings for a q/k pair
    (reference: image_encoder.py get_rel_pos). q_size == k_size for all
    SAM self-attention; interpolation handles checkpoint/size mismatch."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear")
    # q_size == k_size in practice; keep the general ratio math for parity.
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(np.int64)]


def decomposed_rel_pos_bias(
    q: jnp.ndarray,  # (B, qh*qw, num_heads, head_dim)
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Decomposed relative position bias added to attention logits
    (reference: image_encoder.py add_decomposed_rel_pos einsums).

    Returns (B, num_heads, qh*qw, kh*kw) fp32 bias.
    """
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = get_rel_pos(q_h, k_h, rel_pos_h).astype(jnp.float32)  # (qh, kh, hd)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w).astype(jnp.float32)  # (qw, kw, hd)

    b = q.shape[0]
    nh = q.shape[2]
    r_q = q.reshape(b, q_h, q_w, nh, -1).astype(jnp.float32)
    rel_h = jnp.einsum("bhwnc,hkc->bnhwk", r_q, Rh)  # (B, nh, qh, qw, kh)
    rel_w = jnp.einsum("bhwnc,wkc->bnhwk", r_q, Rw)  # (B, nh, qh, qw, kw)
    bias = rel_h[..., :, None] + rel_w[..., None, :]  # (B,nh,qh,qw,kh,kw)
    return bias.reshape(b, nh, q_h * q_w, k_h * k_w)


def window_partition(x: jnp.ndarray, window: int):
    """(B, H, W, C) -> (B*nW, win, win, C), padding bottom/right
    (reference: image_encoder.py window_partition)."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jnp.ndarray, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp * wp // window // window)
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def window_partition_l(x: jnp.ndarray, window: int):
    """(B, H, W, C) -> (B*nW, lpad, C): window_partition with the token
    dim flattened and TILE-PADDED to a multiple of 8 sublanes.

    With lpad % 8 == 0 every downstream (BW, lpad, C) <-> (BW*lpad, C)
    reshape is a layout bitcast, so the qkv projection can run as a 2D
    row-major matmul whose output feeds the Pallas windowed-attention
    kernel with NO relayout copy (XLA lays 3D dot outputs out {0,2,1}
    while tpu_custom_call constrains {2,1,0}: a 903 MB copy per layer at
    batch 24 before this change). Pad rows carry zeros here; the kernel
    -inf-masks their key columns and the caller drops their outputs."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    lw = window * window
    lpad = -(-lw // 8) * 8
    if lpad > lw:
        x = jnp.pad(x, ((0, 0), (0, lpad - lw), (0, 0)))
    return x, (hp, wp)


def window_unpartition_l(x: jnp.ndarray, window: int, pad_hw, hw):
    """Inverse of window_partition_l: (B*nW, lpad, C) -> (B, h, w, C),
    dropping the tile-pad rows (the slice fuses into the unpartition
    transpose — one relayout pass, same as the unpadded path)."""
    return window_unpartition(
        x[:, :window * window].reshape(-1, window, window, x.shape[-1]),
        window, pad_hw, hw)


class SamAttention(nn.Module):
    """Multi-head self-attention with optional decomposed rel-pos bias.

    Softmax in fp32, QK^T/PV on the MXU in the compute dtype.
    """

    num_heads: int
    use_rel_pos: bool = True
    input_hw: Tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, unpartition=None):
        # 3D input (BW, lpad, C): tile-padded window-partitioned tokens
        # (window_partition_l). The qkv projection runs as one 2D
        # row-major matmul — (BW*lpad, C) and (BW, lpad, 3C) views are
        # bitcasts of each other because lpad % 8 == 0 — so the fused
        # kernel consumes the dense output with zero relayout copies.
        if x.ndim == 3:
            import os

            bw_, lp, c = x.shape
            head_dim = c // self.num_heads
            scale = head_dim ** -0.5
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_hw[0] - 1, head_dim), self.param_dtype)
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_hw[1] - 1, head_dim), self.param_dtype)
            # HAFF_WINDOW_SPLIT (default 1): emit the qkv projection as
            # TWO column-split dots (same "qkv" param) so the band-table
            # einsum reads a CONTIGUOUS q operand instead of a strided
            # slice of the fused (.., 3C) output (band-slice 5.38 vs
            # band-dense 1.12 ms/layer at batch 24, tools/bench_kernels
            # attnpath). Confirmed with 3 interleaved A/B reps on the
            # int8 windowed block at batch 32 (round 3, ADVICE r2):
            # split 43.18/43.02/42.89 vs fused 44.30/44.03/43.89
            # ms/layer (~2.4%, outside run-to-run noise) — the split's
            # extra activation-quant pass costs less than the strided
            # band read. HAFF_WINDOW_SPLIT=0 restores the fused dot.
            split = os.environ.get("HAFF_WINDOW_SPLIT", "1") == "1"
            if split:
                from ..kernels.sam_attention import (
                    sam_window_attention_qkv_split,
                )

                q3, kv3 = QDense(3 * c, use_bias=True, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="qkv")(x.reshape(bw_ * lp, c),
                                             out_split=(c, 2 * c))
                out = sam_window_attention_qkv_split(
                    q3.reshape(bw_, lp, c), kv3.reshape(bw_, lp, 2 * c),
                    rel_pos_h, rel_pos_w, self.input_hw, self.num_heads,
                    sm_scale=scale)
            else:
                from ..kernels.sam_attention import sam_window_attention_qkv

                qkv = QDense(3 * c, use_bias=True, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="qkv")(x.reshape(bw_ * lp, c))
                qkv = qkv.reshape(bw_, lp, 3 * c)
                out = sam_window_attention_qkv(
                    qkv, rel_pos_h, rel_pos_w, self.input_hw, self.num_heads,
                    sm_scale=scale)
            # Drop window+tile padding BEFORE the output projection:
            # proj is rowwise; content rows are 64x64 = 4096 per image
            # vs 5x5x200 = 5000 padded (+22% proj FLOPs avoided).
            pad_hw, hw = unpartition
            out = window_unpartition_l(out, self.input_hw[0], pad_hw, hw)
            return QDense(c, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="proj")(out)

        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        qkv = QDense(3 * c, use_bias=True, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3 * c)

        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_hw[0] - 1, head_dim), self.param_dtype)
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_hw[1] - 1, head_dim), self.param_dtype)
            # Fused Pallas paths (kernels/sam_attention.py): global grids
            # stream k-row blocks with the factorized bias; windowed
            # grids consume the qkv dense output in its natural layout
            # (zero HBM relayouts) with heads as an unrolled in-kernel
            # lane-slice loop.
            from ..kernels.sam_attention import (
                sam_global_attention_qkv,
                sam_window_attention_qkv,
            )

            if h % 8 == 0 and w % 8 == 0 and h * w >= 1024:
                # natural qkv layout straight into the kernel — no
                # (B, L, 3, nh, d) slice/transpose materialization
                # (sam_global_attention_qkv falls back to the legacy
                # per-head path when lane blocking cannot apply).
                out = sam_global_attention_qkv(
                    qkv, rel_pos_h, rel_pos_w, (h, w), self.num_heads,
                    sm_scale=scale)
            else:
                out = sam_window_attention_qkv(
                    qkv, rel_pos_h, rel_pos_w, (h, w), self.num_heads,
                    sm_scale=scale)
        else:
            qkv5 = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
            q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
            logits = jnp.einsum("blnd,bmnd->bnlm", q * scale, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bnlm,bmnd->blnd", probs.astype(self.dtype), v)
        out = out.reshape(b, h, w, c)
        if unpartition is not None:
            # Drop the window padding BEFORE the output projection: proj
            # is rowwise, and the padded rows (70x70 vs 64x64 content at
            # ViT-H = +19.6%) were computed then discarded by the
            # caller's unpartition. Bit-identical, fewer proj FLOPs.
            pad_hw, hw = unpartition
            out = window_unpartition(out, h, pad_hw, hw)
        return QDense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="proj")(out)


class SamBlock(nn.Module):
    cfg: SamEncoderConfig
    window_size: int  # 0 => global attention
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        cfg = self.cfg
        shortcut = x
        # LN stats in fp32 (flax default), output cast straight to the
        # compute dtype: every consumer casts to bf16 anyway, so this is
        # bit-identical while halving the LN's HBM write traffic.
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="norm1")(x).astype(self.dtype)
        hw = x.shape[1:3]
        if self.window_size > 0:
            import os

            # Tile-padded 3D partition: enables the 2D qkv matmul +
            # zero-copy Pallas handoff (see window_partition_l).
            # Default ON: validated on chip (L=200 store variant passes
            # the Mosaic AOT check + bit-parity vs the 196-row XLA path;
            # headline bench 19.47 vs 18.02 fps at batch 24).
            # HAFF_WINDOW_LPAD=0 opts out (legacy 4D partition).
            use_lpad = (cfg.use_rel_pos
                        and os.environ.get("HAFF_WINDOW_LPAD", "1") == "1")
            if use_lpad:
                x, pad_hw = window_partition_l(x, self.window_size)
            else:
                x, pad_hw = window_partition(x, self.window_size)
            attn_hw = (self.window_size, self.window_size)
        else:
            attn_hw = (cfg.grid_size, cfg.grid_size)
        x = SamAttention(
            num_heads=cfg.num_heads, use_rel_pos=cfg.use_rel_pos,
            input_hw=attn_hw, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn")(
                x, unpartition=((pad_hw, hw) if self.window_size > 0
                                else None))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=self.param_dtype,
                         name="norm2")(x).astype(self.dtype)
        y = MLPBlock(int(cfg.embed_dim * cfg.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp")(y)
        return x + y


class SamImageEncoder(nn.Module):
    """ViT backbone + neck producing (B, 64, 64, 256) image embeddings."""

    cfg: SamEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):  # (B, image_size, image_size, 3)
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        pos = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, cfg.grid_size, cfg.grid_size, cfg.embed_dim), self.param_dtype)
        x = x + pos.astype(self.dtype)

        block_cls = nn.remat(SamBlock) if self.remat else SamBlock
        for i in range(cfg.depth):
            wsz = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = block_cls(cfg=cfg, window_size=wsz, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"blocks_{i}")(x)

        # Neck in fp32 (the reference guards fp16 overflow the same way,
        # image_encoder.py neck fp32 path).
        x = x.astype(jnp.float32)
        x = nn.Conv(cfg.out_chans, (1, 1), use_bias=False, dtype=jnp.float32,
                    param_dtype=self.param_dtype, name="neck_conv1")(x)
        x = ChannelLayerNorm(param_dtype=self.param_dtype, name="neck_ln1")(x)
        x = nn.Conv(cfg.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=jnp.float32, param_dtype=self.param_dtype,
                    name="neck_conv2")(x)
        x = ChannelLayerNorm(param_dtype=self.param_dtype, name="neck_ln2")(x)
        return x  # (B, grid, grid, out_chans)
