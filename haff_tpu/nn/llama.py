"""LLaMA decoder, TPU-native.

Capability parity with the reference's HF LlamaModel usage (reference:
2Haff/model/llava/model/language_model/llava_llama.py — LLaMA-7B/13B with
causal LM head). Designed for jit/pjit from the start:

  * One batched forward with static shapes; padding via segment ids.
  * Pallas flash attention (kernels/flash_attention.py) for prefill and
    training; single-token decode uses an XLA KV-cache step (Lq == 1, no
    flash needed).
  * Weights carry flax logical-partitioning axis names so pjit can shard
    heads/MLP columns over the `tensor` mesh axis and everything over
    `fsdp` (the GSPMD equivalent of the reference's latent DeepSpeed
    tensor-parallel path, SURVEY.md section 2.7).
  * Final post-norm hidden states are always returned — the LISA [SEG]
    gather needs them (reference: LISA.py:258-278 uses hidden_states[-1]).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..kernels.flash_attention import flash_attention

# Logical axis names (mapped to mesh axes in parallel/sharding.py).
EMBED = "embed"
MLP = "mlp"
HEADS = "heads"
KV_HEADS = "kv_heads"
HEAD_DIM = "head_dim"
VOCAB = "vocab"


def _dense(features, name, kernel_axes, dtype, param_dtype, use_bias=False):
    # QDense == nn.Dense bit-for-bit with a float kernel (same param
    # names/init stream), but switches to the W8A8 int8-MXU matmul when
    # the params tree carries an int8 kernel + scale
    # (quant.quantize_dense_tree) — the serving path of the reference's
    # bnb 8-bit load (inference.py:133-156) without per-step dequant.
    from .layers import QDense

    return QDense(
        features, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
        kernel_axes=kernel_axes, name=name)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _embed_lookup(vocab, table_dtype, table, ids):
    return jnp.take(table, ids, axis=0)


def _embed_lookup_fwd(vocab, table_dtype, table, ids):
    return jnp.take(table, ids, axis=0), ids


def _embed_lookup_bwd(vocab, table_dtype, ids, ctg):
    import numpy as _np
    from jax import dtypes as _dtypes
    onehot = jax.nn.one_hot(ids, vocab, dtype=ctg.dtype)
    # HIGHEST precision: on TPU the default matmul precision would
    # bf16-truncate the fp32 cotangent through the MXU (measured ~1.4e-2
    # max-abs divergence vs an exact scatter-add backward; exact under
    # HIGHEST). The einsum is grad-path-only so the fp32 cost is free at
    # inference and negligible in training (ADVICE r3).
    g = jnp.einsum("...v,...e->ve", onehot, ctg,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return (g.astype(table_dtype),
            _np.zeros(ids.shape, dtype=_dtypes.float0))


_embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param(
            "weight",
            nn.with_logical_partitioning(nn.initializers.ones, (EMBED,)),
            (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(x.dtype)


def rope_table(head_dim: int, max_len: int, theta: float) -> jnp.ndarray:
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                             / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)  # (max_len, head_dim/2)
    return jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=0)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               table: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, H, D); positions: (B, L) int32; table: (2, max_len, D/2).

    HF-llama rotate-half convention: the hidden dim is split into two
    contiguous halves (x1, x2) and rotated as (x1*cos - x2*sin,
    x2*cos + x1*sin)."""
    cos = table[0][positions][:, :, None, :]  # (B, L, 1, D/2)
    sin = table[1][positions][:, :, None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin],
        axis=-1).astype(x.dtype)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # static (module attribute, not a traced call arg: nn.remat would
    # turn a bool argument into a tracer and break LoRA dropout gating)
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, positions, segment_ids=None, kv_cache=None,
                 cache_index=None, cache_kv_segment_ids=None):
        """x: (B, L, E).

        Two modes:
          * prefill/train (kv_cache may be given): attention runs over the
            L input tokens with flash attention; if a cache is given, the
            fresh k/v are ALSO written at per-row offsets `cache_index`
            (B,) so a decode loop can continue from the prompt.
          * decode (L == 1, kv_cache given): attend over the cache using
            `cache_kv_segment_ids` (B, max_len; 1 marks live slots
            INCLUDING the one just written — the caller maintains it).

        Returns (out, new_kv_cache)."""
        cfg = self.cfg
        b, l, _ = x.shape
        nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

        from .lora import LoraDense

        # LoRA adapters on the configured attention projections
        # (reference --lora_target_modules, default q_proj+v_proj,
        # train_ds.py:195-221). q/v keep the base/kernel layout even at
        # rank 0 so the default checkpoint tree never changes; k/o only
        # switch layout when explicitly targeted.
        def proj(inp, name, features, axes):
            targeted = name in cfg.lora_targets
            if targeted or name in ("q_proj", "v_proj"):
                return LoraDense(
                    features=features,
                    rank=cfg.lora_rank if targeted else 0,
                    alpha=cfg.lora_alpha, dropout=cfg.lora_dropout,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    kernel_axes=axes, name=name)(
                        inp, deterministic=self.deterministic)
            return _dense(features, name, axes, self.dtype,
                          self.param_dtype)(inp)

        q = proj(x, "q_proj", nh * hd,
                 (EMBED, HEADS)).reshape(b, l, nh, hd)
        k = proj(x, "k_proj", nkv * hd,
                 (EMBED, KV_HEADS)).reshape(b, l, nkv, hd)
        v = proj(x, "v_proj", nkv * hd,
                 (EMBED, KV_HEADS)).reshape(b, l, nkv, hd)

        table = rope_table(hd, cfg.max_seq_len, cfg.rope_theta)
        q = apply_rope(q, positions, table)
        k = apply_rope(k, positions, table)

        from .quant import QuantArray, quantize_activation

        new_cache = None
        if kv_cache is not None:
            ck, cv = kv_cache
            if cache_index is None:
                cache_index = jnp.zeros((b,), jnp.int32)
            write = jax.vmap(
                lambda c, kk, i: jax.lax.dynamic_update_slice(
                    c, kk, (i, 0, 0)))
            if isinstance(ck, QuantArray):
                # int8 KV cache: per token-head symmetric quantization
                # (the TPU analog of kv-cache 8-bit serving; halves the
                # cache footprint and decode-time HBM streaming).
                qk, qv = quantize_activation(k), quantize_activation(v)
                ck = QuantArray(write(ck.values, qk.values, cache_index),
                                write(ck.scales, qk.scales, cache_index))
                cv = QuantArray(write(cv.values, qv.values, cache_index),
                                write(cv.scales, qv.scales, cache_index))
            else:
                ck = write(ck, k.astype(ck.dtype), cache_index)
                cv = write(cv, v.astype(cv.dtype), cache_index)
            new_cache = (ck, cv)

        if kv_cache is not None and cache_kv_segment_ids is not None:
            # Decode modes: attend over live cache slots. L == 1 is the
            # classic single-token step (long caches stream through the
            # flash-decode kernel; int8 caches are dequantized in VMEM);
            # L > 1 is a speculative-verify chunk (infer/generate.py
            # speculative_generate) where each of the L draft tokens
            # attends over the cache up to its own position.
            from ..kernels.decode_attention import (chunk_decode_attention,
                                                    flash_decode_attention)

            ck, cv = new_cache
            if l == 1:
                out = flash_decode_attention(
                    q[:, 0], ck, cv, cache_kv_segment_ids)[:, None]
            else:
                out = chunk_decode_attention(
                    q, ck, cv, cache_kv_segment_ids, positions)
        else:
            if nkv != nh:
                rep = nh // nkv
                k = jnp.repeat(k, rep, axis=2)
                v = jnp.repeat(v, rep, axis=2)
            # Ring path covers BOTH train (no cache) and long-context
            # prefill (cache given, L > 1): the cache write above is
            # local either way, only the attention is distributed.
            out = None
            if cfg.sequence_parallel:
                out = self._ring_attention(q, k, v, segment_ids)
            if out is None:
                out = flash_attention(q, k, v, q_segment_ids=segment_ids,
                                      kv_segment_ids=segment_ids,
                                      causal=True)

        out = out.reshape(b, l, nh * hd)
        out = proj(out, "o_proj", cfg.hidden_size, (HEADS, EMBED))
        return out, new_cache

    def _ring_attention(self, q, k, v, segment_ids):
        """Sequence-parallel path (cfg.sequence_parallel): ring attention
        over the ambient mesh's "sp" axis, composed with TP over heads
        and DP over batch where the shapes divide. Returns None when no
        sp>1 mesh is ambient (caller falls back to single-device flash).
        Pads the sequence to an 8-aligned per-chunk multiple; padded
        positions carry segment id 0."""
        from ..core.mesh import (DATA_AXIS, FSDP_AXIS, SP_AXIS, TENSOR_AXIS,
                                 ambient_mesh)
        from ..parallel.ring_attention import sequence_sharded_attention

        mesh = ambient_mesh()
        if mesh is None or mesh.shape.get(SP_AXIS, 1) <= 1:
            import warnings

            warnings.warn(
                "sequence_parallel is set but no ambient mesh with an "
                "'sp' axis > 1 was found at trace time; falling back to "
                "single-device flash attention", stacklevel=2)
            return None
        sp = mesh.shape[SP_AXIS]
        b, l, nh, _ = q.shape
        seg = (segment_ids if segment_ids is not None
               else jnp.ones((b, l), jnp.int32))
        lp = -(-l // (sp * 8)) * (sp * 8)
        if lp != l:
            pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
            seg = jnp.pad(seg, ((0, 0), (0, lp - l)))
        dp_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS)
                        if mesh.shape.get(a, 1) > 1)
        dp = 1
        for a in dp_axes:
            dp *= mesh.shape[a]
        batch_axes = dp_axes if dp_axes and b % dp == 0 else None
        if dp > 1 and batch_axes is None:
            import warnings

            warnings.warn(
                f"ring attention: batch {b} does not divide data*fsdp="
                f"{dp}; the batch is replicated across those axes for "
                f"the attention region (correct but redundant compute)",
                stacklevel=2)
        tensor = mesh.shape.get(TENSOR_AXIS, 1)
        heads_axis = TENSOR_AXIS if (tensor > 1 and nh % tensor == 0) \
            else None
        out = sequence_sharded_attention(
            mesh, SP_AXIS, q, k, v, q_segment_ids=seg, causal=True,
            batch_axes=batch_axes, heads_axis=heads_axis)
        return out[:, :l]


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = _dense(cfg.intermediate_size, "gate_proj", (EMBED, MLP),
                      self.dtype, self.param_dtype)(x)
        up = _dense(cfg.intermediate_size, "up_proj", (EMBED, MLP),
                    self.dtype, self.param_dtype)(x)
        return _dense(cfg.hidden_size, "down_proj", (MLP, EMBED),
                      self.dtype, self.param_dtype)(nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    deterministic: bool = True
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, positions, segment_ids=None, kv_cache=None,
                 cache_index=None, cache_kv_segment_ids=None):
        cfg = self.cfg
        attn_out, new_cache = LlamaAttention(
            cfg=cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            deterministic=self.deterministic,
            name="self_attn")(
                RMSNorm(eps=cfg.rms_norm_eps,
                        param_dtype=self.param_dtype,
                        name="input_layernorm")(x),
                positions, segment_ids, kv_cache, cache_index,
                cache_kv_segment_ids)
        x = x + attn_out
        # MoE layers (cfg.moe_num_experts > 0, interleave via moe_every)
        # keep the param name "mlp" distinct ("moe") so dense checkpoints
        # never silently half-load into an MoE tree.
        is_moe = (cfg.moe_num_experts > 0
                  and self.layer_idx % cfg.moe_every == cfg.moe_every - 1)
        mlp_in = RMSNorm(eps=cfg.rms_norm_eps,
                         param_dtype=self.param_dtype,
                         name="post_attention_layernorm")(x)
        if is_moe:
            from .moe import MoEMLP

            # Serving paths (a KV cache is present) route per-row with
            # no-drop capacity so a token's experts never depend on its
            # co-batch; training keeps GShard global capacity. Padding
            # tokens (segment id 0) are masked out of routing + aux.
            serving = kv_cache is not None
            mask = None if segment_ids is None else (segment_ids > 0)
            mlp_out = MoEMLP(cfg=cfg, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             no_drop=serving, name="moe")(
                                 mlp_in, token_mask=mask)
        else:
            mlp_out = LlamaMLP(cfg=cfg, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="mlp")(mlp_in)
        return x + mlp_out, new_cache


class LlamaModel(nn.Module):
    """Decoder stack operating on input embeddings (the multimodal splice
    happens upstream, so embeddings — not token ids — are the interface,
    matching reference llava_arch.py prepare_inputs_labels_for_multimodal)."""

    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, inputs_embeds, positions, segment_ids=None,
                 kv_caches=None, cache_index=None,
                 cache_kv_segment_ids=None, deterministic=True):
        """Returns (hidden_states post-final-norm, new_kv_caches)."""
        x = inputs_embeds.astype(self.dtype)
        new_caches = []
        block_cls = LlamaBlock
        if self.remat:
            block_cls = nn.remat(
                LlamaBlock, static_argnums=(),
                policy=jax.checkpoint_policies.nothing_saveable)
        for i in range(self.cfg.num_layers):
            cache = kv_caches[i] if kv_caches is not None else None
            x, new_cache = block_cls(
                cfg=self.cfg, dtype=self.dtype,
                param_dtype=self.param_dtype,
                deterministic=bool(deterministic),
                layer_idx=i,
                name=f"layers_{i}")(
                    x, positions, segment_ids, cache, cache_index,
                    cache_kv_segment_ids)
            new_caches.append(new_cache)
        x = RMSNorm(eps=self.cfg.rms_norm_eps, param_dtype=self.param_dtype,
                    name="norm")(x)
        return x, (new_caches if kv_caches is not None else None)


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size, self.cfg.hidden_size,
            dtype=self.dtype, param_dtype=self.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), (VOCAB, EMBED)))
        self.model = LlamaModel(cfg=self.cfg, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                remat=self.remat)
        self.lm_head = _dense(self.cfg.vocab_size, "lm_head",
                              (EMBED, VOCAB), self.dtype, self.param_dtype)

    def embed(self, input_ids):
        # Forward is the plain row gather (bit-identical to nn.Embed);
        # the backward is a one-hot einsum so the table gradient is a
        # dot GSPMD can partition (local partials + reduce-scatter onto
        # the (vocab=tensor, embed=fsdp) table sharding). The scatter-add
        # backward of jnp.take forced "involuntary full
        # rematerialization" of the batch-sharded cotangent on a
        # (data, fsdp, tensor) mesh (MULTICHIP_r02 tail).
        table = self.embed_tokens.embedding
        return _embed_lookup(
            table.shape[0], jnp.dtype(table.dtype).name, table,
            input_ids).astype(self.dtype)

    def __call__(self, inputs_embeds, positions, segment_ids=None,
                 kv_caches=None, cache_index=None,
                 cache_kv_segment_ids=None, deterministic=True):
        """Returns (logits, hidden post-norm, new kv caches)."""
        hidden, new_caches = self.model(inputs_embeds, positions,
                                        segment_ids, kv_caches, cache_index,
                                        cache_kv_segment_ids, deterministic)
        logits = self.lm_head(hidden)
        return logits, hidden, new_caches

    def init_all(self, input_ids, positions):
        """Init helper: touches every submodule (flax creates params
        lazily, and __call__ alone never exercises embed_tokens)."""
        emb = self.embed(input_ids)
        return self(emb, positions)

    def init_kv_caches(self, batch: int, max_len: int,
                       dtype=jnp.bfloat16):
        cfg = self.cfg
        return [
            (jnp.zeros((batch, max_len, cfg.num_kv_heads, cfg.head_dim),
                       dtype),
             jnp.zeros((batch, max_len, cfg.num_kv_heads, cfg.head_dim),
                       dtype))
            for _ in range(cfg.num_layers)
        ]
