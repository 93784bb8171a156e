"""Greedy autoregressive generation with hidden-state capture.

The reference relies on HF generate(output_hidden_states=True) and then
gathers [SEG] rows with a hard-coded image-offset hack (reference:
LISA.py:432-485). Here decode is a lax.scan over a ragged KV cache with
static shapes; every step yields (emitted token, the post-final-norm
hidden state that emitted it), which is exactly what the [SEG] gather
needs — no offset hacks.

Supports right-padded batched prompts: each row tracks its own length;
cache writes use per-row offsets (nn/llama.py ragged cache).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray        # (B, T) emitted tokens (eos-padded)
    hiddens: jnp.ndarray       # (B, T, E) hidden state that emitted each
    lengths: jnp.ndarray       # (B,) tokens emitted before EOS (<= T)


def greedy_generate(cfg: LlamaConfig,
                    embed_fn: Callable,
                    llm_fn: Callable,
                    prompt_embeds, prompt_positions, prompt_segment_ids,
                    prompt_lengths, max_new_tokens: int,
                    eos_id: int, cache_dtype=jnp.bfloat16,
                    kv_cache_8bit: bool = False) -> GenerateResult:
    """embed_fn(tokens (B,1)) -> (B,1,E).
    llm_fn(embeds, positions, segment_ids, kv_caches, cache_index,
    cache_kv_segment_ids) -> (logits, hidden, kv_caches).

    prompt_*: spliced prompt arrays (B, L, ...); prompt_lengths (B,) real
    token counts (right padding). kv_cache_8bit stores the cache as int8
    with per token-head scales (nn/quant.QuantArray)."""
    b, l, _ = prompt_embeds.shape
    max_len = l + max_new_tokens

    shape = (b, max_len, cfg.num_kv_heads, cfg.head_dim)

    def one_cache():
        if kv_cache_8bit:
            from ..nn.quant import QuantArray

            return QuantArray(jnp.zeros(shape, jnp.int8),
                              jnp.ones(shape[:-1] + (1,), jnp.float32))
        return jnp.zeros(shape, cache_dtype)

    caches = [(one_cache(), one_cache()) for _ in range(cfg.num_layers)]

    # Prefill: flash attention over the prompt, k/v written into caches.
    logits, hidden, caches = llm_fn(
        prompt_embeds, prompt_positions, prompt_segment_ids, caches,
        jnp.zeros((b,), jnp.int32), None)

    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_logits = jnp.take_along_axis(
        logits, last_idx[:, None, None], axis=1)[:, 0]      # (B, V)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1)[:, 0]      # (B, E)

    kv_seg0 = (jnp.arange(max_len)[None, :]
               < prompt_lengths[:, None]).astype(jnp.int32)

    def scan_body(carry, _):
        caches, kv_seg, last_logits, last_hidden, lengths, done = carry
        token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        token = jnp.where(done, eos_id, token)
        emitted = (token, last_hidden, done)
        new_done = done | (token == eos_id)

        emb = embed_fn(token[:, None])                       # (B, 1, E)
        write_idx = lengths                                   # (B,)
        pos = lengths[:, None]                                # (B, 1)
        kv_seg = jnp.where(
            jnp.arange(max_len)[None, :] == write_idx[:, None], 1, kv_seg)
        logits, hidden, caches = llm_fn(
            emb, pos, None, caches, write_idx, kv_seg)
        lengths = jnp.where(new_done, lengths, lengths + 1)
        carry = (caches, kv_seg, logits[:, 0], hidden[:, 0], lengths,
                 new_done)
        return carry, emitted

    init = (caches, kv_seg0, last_logits, last_hidden, prompt_lengths,
            jnp.zeros((b,), bool))
    _, (tokens, hiddens, was_done) = jax.lax.scan(
        scan_body, init, None, length=max_new_tokens)

    tokens = tokens.T                                # (B, T)
    hiddens = hiddens.transpose(1, 0, 2)             # (B, T, E)
    gen_lengths = jnp.sum(~was_done.T, axis=1)
    return GenerateResult(tokens=tokens, hiddens=hiddens,
                          lengths=gen_lengths)
