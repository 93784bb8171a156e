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
    # decode forward passes taken (scalar; speculative_generate only —
    # tokens-emitted / steps is the measured speculation speedup)
    steps: jnp.ndarray = None


def _alloc_and_prefill(cfg, llm_fn, prompt_embeds, prompt_positions,
                       prompt_segment_ids, prompt_lengths, max_len,
                       cache_dtype, kv_cache_8bit):
    """Allocate per-layer KV caches and run the prompt prefill (flash
    attention; k/v written into the caches at offset 0). Shared by
    greedy_generate and speculative_generate — the exactness contract
    between them starts from an identical prefill.

    Returns (caches, last_logits (B, V), last_hidden (B, E)) gathered
    at each row's real prompt length (right padding)."""
    b = prompt_embeds.shape[0]
    shape = (b, max_len, cfg.num_kv_heads, cfg.head_dim)

    def one_cache():
        if kv_cache_8bit:
            from ..nn.quant import QuantArray

            return QuantArray(jnp.zeros(shape, jnp.int8),
                              jnp.ones(shape[:-1] + (1,), jnp.float32))
        return jnp.zeros(shape, cache_dtype)

    caches = [(one_cache(), one_cache()) for _ in range(cfg.num_layers)]
    logits, hidden, caches = llm_fn(
        prompt_embeds, prompt_positions, prompt_segment_ids, caches,
        jnp.zeros((b,), jnp.int32), None)
    last_idx = jnp.maximum(prompt_lengths - 1, 0)
    last_logits = jnp.take_along_axis(
        logits, last_idx[:, None, None], axis=1)[:, 0]      # (B, V)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1)[:, 0]      # (B, E)
    return caches, last_logits, last_hidden


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
    caches, last_logits, last_hidden = _alloc_and_prefill(
        cfg, llm_fn, prompt_embeds, prompt_positions, prompt_segment_ids,
        prompt_lengths, max_len, cache_dtype, kv_cache_8bit)

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


def make_lookup_corpus(token_rows, width: int, batch: int, pad_id: int):
    """Host-side helper: pack template token-id lists (e.g. tokenized
    data/prompts.py ANSWER_LIST answers) into a (batch, width) int32
    corpus + (batch,) live lengths for speculative_generate. Rows are
    concatenated in order and truncated/padded to `width`."""
    import numpy as np

    flat = [t for row in token_rows for t in row][:width]
    corpus = np.full((width,), pad_id, np.int32)
    corpus[:len(flat)] = np.asarray(flat, np.int32)
    return (np.broadcast_to(corpus, (batch, width)).copy(),
            np.full((batch,), len(flat), np.int32))


def answer_template_corpus(tokenizer, width: int = 128):
    """Tokenize the data/prompts.py ANSWER_LIST templates (each followed
    by EOS) into a (1, width) draft corpus + (1,) length for
    speculative_generate — these are exactly the strings a trained
    affordance model emits (reference answers, 2Haff utils/utils.py
    ANSWER_LIST), so lookup drafting accepts them nearly wholesale."""
    from ..data.prompts import ANSWER_LIST

    eos = tokenizer.eos_token_id
    rows = [list(tokenizer(a, add_special_tokens=False).input_ids) + [eos]
            for a in ANSWER_LIST]
    return make_lookup_corpus(rows, width, 1, eos)


def speculative_generate(cfg: LlamaConfig,
                         embed_fn: Callable,
                         llm_fn: Callable,
                         prompt_embeds, prompt_positions,
                         prompt_segment_ids, prompt_lengths,
                         max_new_tokens: int, eos_id: int,
                         draft_corpus, corpus_lengths=None,
                         draft_len: int = 8,
                         cache_dtype=jnp.bfloat16,
                         kv_cache_8bit: bool = False) -> GenerateResult:
    """Greedy generation with prompt-lookup speculative decoding.

    Emits EXACTLY the greedy_generate token stream (and the hidden
    states that emitted the live tokens) but costs ~emitted/accepted
    forward passes instead of one per token: each step drafts
    `draft_len` tokens by n-gram lookup (bigram, unigram fallback) over
    `draft_corpus` ++ accepted-so-far, verifies them in ONE chunked
    forward (nn/llama.py L>1 decode mode -> kernels/decode_attention.py
    chunk_decode_attention), and accepts the longest prefix that matches
    the model's own argmax. Draft quality only affects SPEED, never
    output: any rejected draft falls back to the verified token.

    TPU-first rationale: a decode step is weight-streaming bound, so an
    8-token verify chunk costs ~the same HBM time as a 1-token step —
    accepted draft tokens are nearly free. The reference serves with
    per-token HF generate (LISA.py:432-485); affordance answers are
    highly templated ("Sure, it is [SEG].", data/prompts.py
    ANSWER_LIST), which is the best case for prompt-lookup drafting.

    draft_corpus: (B, C) int32 token ids to draft from (templates +/or
    the text prompt); corpus_lengths (B,) live counts (default: all C).
    """
    b, l, _ = prompt_embeds.shape
    d = draft_len
    assert d >= 2, "draft_len must be >= 2 (1 == plain greedy)"
    t_out = max_new_tokens
    max_len = l + max_new_tokens + d      # chunk-overwrite slack
    e_dim = prompt_embeds.shape[-1]
    caches, last_logits, last_hidden = _alloc_and_prefill(
        cfg, llm_fn, prompt_embeds, prompt_positions, prompt_segment_ids,
        prompt_lengths, max_len, cache_dtype, kv_cache_8bit)

    # History buffer the drafts are looked up in: corpus ++ accepted.
    hist_w = draft_corpus.shape[1] + max_new_tokens + d
    hist = jnp.concatenate(
        [jnp.asarray(draft_corpus, jnp.int32),
         jnp.full((b, max_new_tokens + d), -1, jnp.int32)], axis=1)
    hist_len = (jnp.asarray(corpus_lengths, jnp.int32)
                if corpus_lengths is not None
                else jnp.full((b,), draft_corpus.shape[1], jnp.int32))

    harange = jnp.arange(hist_w)

    def draft_chunk(hist, hist_len, t0, t1):
        """(B, D) chunk starting with the verified token t1; d-1 drafts
        follow the most recent (t0, t1) bigram (unigram fallback) in
        hist. Fallback filler is t1 (sound: acceptance re-verifies)."""
        live = harange[None, :] < hist_len[:, None]
        big = jnp.concatenate(
            [jnp.zeros((b, 1), bool),
             (hist[:, :-1] == t0[:, None]) & (hist[:, 1:] == t1[:, None])],
            axis=1) & live
        uni = (hist == t1[:, None]) & live

        def last_pos(m):
            score = jnp.max(jnp.where(m, harange[None, :], -1), axis=1)
            return score >= 0, score

        hasb, jb = last_pos(big)
        hasu, ju = last_pos(uni)
        j = jnp.where(hasb, jb, ju)
        has = hasb | hasu
        offs = j[:, None] + 1 + jnp.arange(d - 1)[None, :]
        valid = has[:, None] & (offs < hist_len[:, None])
        got = jnp.take_along_axis(hist, jnp.clip(offs, 0, hist_w - 1),
                                  axis=1)
        drafts = jnp.where(valid, got, t1[:, None])
        return jnp.concatenate([t1[:, None], drafts], axis=1)

    slot = jnp.arange(max_len)
    drange = jnp.arange(d)

    out_tok0 = jnp.full((b, t_out + d), eos_id, jnp.int32)
    out_hid0 = jnp.zeros((b, t_out + d, e_dim),
                         dtype=last_hidden.dtype)

    def write_rows(buf, chunk, offs, n_emit):
        """Per-row dynamic write of chunk[:, :n_emit] at offs."""
        upd = jax.vmap(
            lambda bu, ch, of: jax.lax.dynamic_update_slice(
                bu, ch, (of,) + (0,) * (bu.ndim - 1)))(buf, chunk, offs)
        t = buf.shape[1]
        sel = ((jnp.arange(t)[None, :] >= offs[:, None])
               & (jnp.arange(t)[None, :] < (offs + n_emit)[:, None]))
        if buf.ndim == 3:
            sel = sel[..., None]
        return jnp.where(sel, upd, buf)

    def body(state):
        (caches, last_logits, last_hidden, cur, emitted, done, t_prev,
         hist, hist_len, out_tok, out_hid, steps) = state
        t1 = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        t1 = jnp.where(done, eos_id, t1)
        chunk = draft_chunk(hist, hist_len, t_prev, t1)       # (B, D)

        pos = cur[:, None] + drange[None, :]                   # (B, D)
        kv_seg = (slot[None, :] < (cur + d)[:, None]).astype(jnp.int32)
        emb = embed_fn(chunk)
        logits, hidden, caches = llm_fn(emb, pos, None, caches, cur,
                                        kv_seg)

        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # (B, D)
        match = chunk[:, 1:] == g[:, :-1]                      # (B, D-1)
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
        n_acc = 1 + jnp.sum(acc, axis=1)                       # (B,)
        iseos = chunk == eos_id
        in_acc = iseos & (drange[None, :] < n_acc[:, None])
        any_eos = in_acc.any(axis=1)
        first_eos = jnp.argmax(in_acc, axis=1)
        n_emit = jnp.where(any_eos, first_eos + 1, n_acc)
        n_emit = jnp.minimum(n_emit, max_new_tokens - emitted)
        n_emit = jnp.where(done, 0, n_emit)
        eos_emitted = (iseos & (drange[None, :] < n_emit[:, None])
                       ).any(axis=1)

        h_chunk = jnp.concatenate(
            [last_hidden[:, None, :], hidden[:, :-1]], axis=1)  # (B,D,E)
        out_tok = write_rows(out_tok, chunk, emitted, n_emit)
        out_hid = write_rows(out_hid, h_chunk, emitted, n_emit)
        hist = write_rows(hist, chunk, hist_len, n_emit)
        hist_len = hist_len + n_emit

        pick = jnp.maximum(n_emit, 1) - 1
        new_logits = jnp.take_along_axis(
            logits, pick[:, None, None], axis=1)[:, 0]
        new_hidden = jnp.take_along_axis(
            hidden, pick[:, None, None], axis=1)[:, 0]
        active = n_emit > 0
        last_logits = jnp.where(active[:, None], new_logits, last_logits)
        last_hidden = jnp.where(active[:, None], new_hidden, last_hidden)
        t_prev = jnp.where(
            active, jnp.take_along_axis(chunk, pick[:, None], axis=1)[:, 0],
            t_prev)
        cur = cur + n_emit
        emitted = emitted + n_emit
        done = done | eos_emitted
        return (caches, last_logits, last_hidden, cur, emitted, done,
                t_prev, hist, hist_len, out_tok, out_hid, steps + 1)

    def cond(state):
        _, _, _, _, emitted, done = state[:6]
        return jnp.any(~done & (emitted < max_new_tokens))

    state = (caches, last_logits, last_hidden, prompt_lengths,
             jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
             jnp.full((b,), -1, jnp.int32), hist, hist_len,
             out_tok0, out_hid0, jnp.zeros((), jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    emitted = state[4]
    out_tok = state[9][:, :t_out]
    out_hid = state[10][:, :t_out]
    return GenerateResult(tokens=out_tok, hiddens=out_hid,
                          lengths=emitted, steps=state[11])
