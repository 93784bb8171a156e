"""MPT decoder backend (alternative LLM, ALiBi attention).

Capability parity with reference llava/model/language_model/llava_mpt.py +
mpt/* (MPT-7B: no positional embeddings, ALiBi bias, fused Wqkv,
optional multi-query attention, low-precision LayerNorm, GELU MLP, tied
word embedding as the LM head; attn_impl torch/flash/triton — here the
single Pallas flash kernel serves, its additive-bias input carrying
ALiBi).

ALiBi on TPU: bias[h, i, j] = -slope_h * (i - j) decomposes as
slope_h * j plus a per-row constant that softmax cancels, so a
(1, nh, 1, Lk) column bias is exact — no (L, L) materialization
(the reference's triton kernel materializes full bias tiles).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention, mha_reference
from .layers import QDense


@dataclass(frozen=True)
class MptConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    multiquery: bool = False
    alibi_bias_max: int = 8
    layer_norm_eps: float = 1e-5
    # Reference mpt/attention.py:273-297 attn_config knobs:
    clip_qkv: Optional[float] = None   # clamp fused qkv to [-c, c]
    qk_ln: bool = False                # LayerNorm on q and k post-split
    # Prefix-LM (reference modeling_mpt.py:147,169-186): queries attend
    # causally PLUS bidirectionally into the prefix region.
    prefix_lm: bool = False
    # "torch" forces the dense reference attention (reference
    # attention.py scaled_multihead_dot_product_attention); "flash" uses
    # the Pallas kernel. Same math — a parity/debug knob.
    attn_impl: str = "flash"

    @staticmethod
    def preset(name: str) -> "MptConfig":
        if name == "7b":
            return MptConfig()
        if name == "tiny":
            return MptConfig(vocab_size=512, d_model=64, n_heads=4,
                             n_layers=2, max_seq_len=128)
        raise ValueError(name)

    @property
    def head_dim(self):
        return self.d_model // self.n_heads


def alibi_slopes(n_heads: int, alibi_bias_max: int = 8) -> jnp.ndarray:
    """MPT slope schedule (reference mpt/attention.py gen_slopes):
    slopes = 1 / 2^(ceil-pow2 geometric ladder), interleaved when n_heads
    is not a power of two."""
    ceil_p2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, ceil_p2 + 1, dtype=jnp.float32)
    m = m * (alibi_bias_max / ceil_p2)
    slopes = 1.0 / jnp.power(2.0, m)
    if ceil_p2 != n_heads:
        # interleave: odd entries first then evens, truncated
        slopes = jnp.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes


def alibi_column_bias(n_heads: int, k_len: int,
                      alibi_bias_max: int = 8) -> jnp.ndarray:
    """(1, nh, 1, k_len) exact-under-softmax ALiBi bias."""
    slopes = alibi_slopes(n_heads, alibi_bias_max)  # (nh,)
    cols = jnp.arange(k_len, dtype=jnp.float32)
    return (slopes[:, None] * cols[None, :])[None, :, None, :]


class MptAttention(nn.Module):
    cfg: MptConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, segment_ids=None, kv_cache=None,
                 cache_index=None, cache_kv_segment_ids=None,
                 prefix_mask=None):
        cfg = self.cfg
        b, l, _ = x.shape
        nh, hd = cfg.n_heads, cfg.head_dim
        nkv = 1 if cfg.multiquery else nh

        fused = QDense(cfg.d_model + 2 * nkv * hd, use_bias=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="Wqkv")(x)
        if cfg.clip_qkv:
            # reference attention.py:332-333 qkv.clamp_(±clip_qkv)
            fused = jnp.clip(fused, -cfg.clip_qkv, cfg.clip_qkv)
        q = fused[..., :cfg.d_model]
        k = fused[..., cfg.d_model:cfg.d_model + nkv * hd]
        v = fused[..., cfg.d_model + nkv * hd:]
        if cfg.qk_ln:
            # reference attention.py:294-297,336-338: LayerNorm over the
            # full projected widths before the head split (fp32 math,
            # matching the block norms).
            ln = lambda n: nn.LayerNorm(  # noqa: E731
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                param_dtype=self.param_dtype, name=n)
            q = ln("q_ln")(q).astype(self.dtype)
            k = ln("k_ln")(k).astype(self.dtype)
        q = q.reshape(b, l, nh, hd)
        k = k.reshape(b, l, nkv, hd)
        v = v.reshape(b, l, nkv, hd)

        from .quant import QuantArray, dequantize_activation, \
            quantize_activation

        new_cache = None
        if kv_cache is not None:
            ck, cv = kv_cache
            if cache_index is None:
                cache_index = jnp.zeros((b,), jnp.int32)
            write = jax.vmap(
                lambda c, kk, i: jax.lax.dynamic_update_slice(
                    c, kk, (i, 0, 0)))
            if isinstance(ck, QuantArray):
                # int8 KV cache (same scheme as the LLaMA backend).
                qk, qv = quantize_activation(k), quantize_activation(v)
                ck = QuantArray(write(ck.values, qk.values, cache_index),
                                write(ck.scales, qk.scales, cache_index))
                cv = QuantArray(write(cv.values, qv.values, cache_index),
                                write(cv.scales, qv.scales, cache_index))
            else:
                ck = write(ck, k.astype(ck.dtype), cache_index)
                cv = write(cv, v.astype(cv.dtype), cache_index)
            new_cache = (ck, cv)

        if kv_cache is not None and l == 1:
            ck, cv = new_cache
            if isinstance(ck, QuantArray):
                ck = dequantize_activation(ck, q.dtype)
                cv = dequantize_activation(cv, q.dtype)
            k_full = jnp.repeat(ck, nh // nkv, axis=2) if nkv != nh else ck
            v_full = jnp.repeat(cv, nh // nkv, axis=2) if nkv != nh else cv
            bias = alibi_column_bias(nh, ck.shape[1], cfg.alibi_bias_max)
            out = mha_reference(
                q, k_full.astype(q.dtype), v_full.astype(q.dtype),
                bias=bias, q_segment_ids=jnp.ones((b, 1), jnp.int32),
                kv_segment_ids=cache_kv_segment_ids, causal=False)
        else:
            kk = jnp.repeat(k, nh // nkv, axis=2) if nkv != nh else k
            vv = jnp.repeat(v, nh // nkv, axis=2) if nkv != nh else v
            bias = alibi_column_bias(nh, l, cfg.alibi_bias_max)
            if cfg.prefix_lm and prefix_mask is not None:
                # Prefix-LM: query i attends key j when j <= i OR j is in
                # the prefix (reference modeling_mpt.py _apply_prefix_mask;
                # the reference also builds ALiBi as a column bias, so the
                # column form stays exact here).
                ii = jnp.arange(l)[:, None]
                jj = jnp.arange(l)[None, :]
                allowed = (jj <= ii)[None] | (
                    prefix_mask.astype(bool)[:, None, :])     # (B, L, L)
                full = bias + jnp.where(
                    allowed[:, None, :, :], 0.0, -1e9)        # (B, nh, L, L)
                out = mha_reference(q, kk, vv, bias=full,
                                    q_segment_ids=segment_ids,
                                    kv_segment_ids=segment_ids,
                                    causal=False)
            elif cfg.attn_impl == "torch":
                out = mha_reference(q, kk, vv, bias=bias,
                                    q_segment_ids=segment_ids,
                                    kv_segment_ids=segment_ids,
                                    causal=True)
            else:
                out = flash_attention(q, kk, vv, bias=bias,
                                      q_segment_ids=segment_ids,
                                      kv_segment_ids=segment_ids,
                                      causal=True)
        out = out.reshape(b, l, cfg.d_model)
        out = QDense(cfg.d_model, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="out_proj")(out)
        return out, new_cache


class MptBlock(nn.Module):
    cfg: MptConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, segment_ids=None, kv_cache=None,
                 cache_index=None, cache_kv_segment_ids=None,
                 prefix_mask=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, use_bias=False, use_scale=True,
            dtype=jnp.float32, param_dtype=self.param_dtype, name=name)
        attn_out, new_cache = MptAttention(
            cfg=cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn")(ln("norm_1")(x).astype(self.dtype), segment_ids,
                         kv_cache, cache_index, cache_kv_segment_ids,
                         prefix_mask)
        x = x + attn_out
        h = ln("norm_2")(x).astype(self.dtype)
        h = QDense(cfg.expansion_ratio * cfg.d_model, use_bias=False,
                   dtype=self.dtype, param_dtype=self.param_dtype,
                   name="up_proj")(h)
        # Exact (erf) GELU: the reference MPT MLP is nn.GELU(
        # approximate="none") (mpt/blocks.py:17), NOT the tanh form —
        # caught by the round-4 HF-MPT e2e parity test.
        h = nn.gelu(h, approximate=False)
        h = QDense(cfg.d_model, use_bias=False, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="down_proj")(h)
        return x + h, new_cache


class MptForCausalLM(nn.Module):
    """MPT with tied word embeddings as the LM head (reference
    mpt/modeling_mpt.py MPTForCausalLM)."""

    cfg: MptConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.wte = nn.Embed(self.cfg.vocab_size, self.cfg.d_model,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype)
        self.blocks = [
            MptBlock(cfg=self.cfg, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"blocks_{i}")
            for i in range(self.cfg.n_layers)
        ]
        self.norm_f = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                   use_bias=False, dtype=jnp.float32,
                                   param_dtype=self.param_dtype)

    def embed(self, input_ids):
        return self.wte(input_ids)

    def __call__(self, inputs_embeds, positions=None, segment_ids=None,
                 kv_caches=None, cache_index=None,
                 cache_kv_segment_ids=None, deterministic=True,
                 prefix_mask=None):
        """positions accepted-and-ignored (ALiBi; keeps the llama
        interface so generate.py drives either backend). prefix_mask
        (B, L) marks bidirectional-prefix positions when cfg.prefix_lm."""
        x = inputs_embeds.astype(self.dtype)
        new_caches = []
        for i, block in enumerate(self.blocks):
            cache = kv_caches[i] if kv_caches is not None else None
            x, nc = block(x, segment_ids, cache, cache_index,
                          cache_kv_segment_ids, prefix_mask)
            new_caches.append(nc)
        x = self.norm_f(x).astype(self.dtype)
        logits = self.wte.attend(x)  # tied head
        return logits, x, (new_caches if kv_caches is not None else None)

    def init_all(self, input_ids):
        return self(self.embed(input_ids))

    def init_kv_caches(self, batch: int, max_len: int,
                       dtype=jnp.bfloat16):
        nkv = 1 if self.cfg.multiquery else self.cfg.n_heads
        return [
            (jnp.zeros((batch, max_len, nkv, self.cfg.head_dim), dtype),
             jnp.zeros((batch, max_len, nkv, self.cfg.head_dim), dtype))
            for _ in range(self.cfg.n_layers)
        ]
