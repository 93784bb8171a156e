"""Prompt-lookup speculative decoding: exact greedy parity, chunked
verify attention vs step-by-step decode, speedup accounting, and the
evaluate() integration (infer/generate.py speculative_generate).

The contract under test: draft quality affects only the number of
decode forwards, NEVER the output — the token stream, gen lengths, and
live-prefix hidden states must equal greedy_generate's bit-for-bit
token-wise (hiddens to fp tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.core.config import IMAGE_TOKEN_INDEX, LlamaConfig, ModelConfig
from haff_tpu.infer.generate import (greedy_generate, make_lookup_corpus,
                                     speculative_generate)
from haff_tpu.nn.llama import LlamaForCausalLM


def _tiny_setup(b=2, lp=6, seed=0):
    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (b, lp)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(lp)[None], (b, lp))
    params = model.init(jax.random.PRNGKey(0), ids, pos, method="init_all")

    def embed_fn(tok):
        return model.apply(params, tok, method="embed")

    def llm_fn(emb, p, seg, caches, idx, kvseg):
        return model.apply(params, emb, p, seg, caches, idx, kvseg)

    return cfg, model, params, ids, pos, embed_fn, llm_fn


def _assert_parity(gen, spec, T):
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(gen.tokens))
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(gen.lengths))
    for r in range(gen.tokens.shape[0]):
        n = int(gen.lengths[r])
        np.testing.assert_allclose(
            np.asarray(spec.hiddens[r, :n]),
            np.asarray(gen.hiddens[r, :n]), rtol=2e-4, atol=2e-4,
            err_msg=f"row {r} live hiddens")


@pytest.mark.parametrize("eos", [0, 3])
def test_speculative_matches_greedy_junk_corpus(eos):
    """Worst case: the corpus is unrelated junk, every draft beyond the
    verified token is likely rejected — output must still be exact."""
    cfg, model, params, ids, pos, embed_fn, llm_fn = _tiny_setup()
    b, lp = ids.shape
    T = 6
    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    gen = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=eos, cache_dtype=jnp.float32)
    corpus = jnp.asarray(
        np.random.RandomState(7).randint(2, cfg.vocab_size, (b, 16)),
        jnp.int32)
    spec = speculative_generate(
        cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg, lengths, T,
        eos_id=eos, draft_corpus=corpus, draft_len=4,
        cache_dtype=jnp.float32)
    _assert_parity(gen, spec, T)


def test_speculative_oracle_corpus_fewer_steps():
    """Best case: the corpus contains the exact greedy continuation —
    the loop must finish in ceil(T / (D-1))-ish steps, far fewer than
    T, and the output must still be exact."""
    cfg, model, params, ids, pos, embed_fn, llm_fn = _tiny_setup(seed=1)
    b, lp = ids.shape
    T = 8
    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    gen = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=0, cache_dtype=jnp.float32)
    # Oracle: prepend the last prompt token so the bigram
    # (prompt[-1], first generated) hits immediately.
    corpus = jnp.concatenate([ids[:, -1:], gen.tokens], axis=1)
    spec = speculative_generate(
        cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg, lengths, T,
        eos_id=0, draft_corpus=corpus, draft_len=5,
        cache_dtype=jnp.float32)
    _assert_parity(gen, spec, T)
    # 8 tokens, 4 accepted-per-step max (D-1 drafts + 1 verified):
    # with an oracle corpus every draft is accepted -> 2-3 steps.
    assert int(spec.steps) <= 4, f"oracle corpus took {int(spec.steps)} steps"
    assert int(spec.steps) < T


def test_speculative_eos_mid_chunk():
    """Force EOS to land inside an accepted chunk: emission must stop
    at (and include) the EOS, matching greedy's done semantics."""
    cfg, model, params, ids, pos, embed_fn, llm_fn = _tiny_setup(seed=2)
    b, lp = ids.shape
    T = 8
    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    gen0 = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                           lengths, T, eos_id=0, cache_dtype=jnp.float32)
    # choose the row-0 token at step 2 as the EOS id -> greedy stops
    # row 0 after 3 tokens
    eos = int(gen0.tokens[0, 2])
    gen = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=eos, cache_dtype=jnp.float32)
    assert int(gen.lengths[0]) <= 3
    corpus = jnp.concatenate([ids[:, -1:], gen0.tokens], axis=1)
    spec = speculative_generate(
        cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg, lengths, T,
        eos_id=eos, draft_corpus=corpus, draft_len=5,
        cache_dtype=jnp.float32)
    _assert_parity(gen, spec, T)


def test_speculative_ragged_prompts_int8_kv():
    """Ragged right-padded prompts + int8 KV cache through the
    speculative path: parity vs greedy with the same cache dtype."""
    cfg, model, params, ids, pos, embed_fn, llm_fn = _tiny_setup(seed=3)
    b, lp = ids.shape
    T = 5
    lengths = jnp.asarray([lp, lp - 2], jnp.int32)
    seg = (jnp.arange(lp)[None, :] < lengths[:, None]).astype(jnp.int32)
    gen = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=0, kv_cache_8bit=True)
    corpus = jnp.asarray(
        np.random.RandomState(9).randint(2, cfg.vocab_size, (b, 12)),
        jnp.int32)
    spec = speculative_generate(
        cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg, lengths, T,
        eos_id=0, draft_corpus=corpus, draft_len=3, kv_cache_8bit=True)
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(gen.tokens))
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(gen.lengths))


def test_chunk_decode_matches_stepwise():
    """The L>1 decode mode (chunk verify attention over the cache) must
    produce the same logits as feeding the same tokens one step at a
    time through the classic decode path."""
    cfg, model, params, ids, pos, embed_fn, llm_fn = _tiny_setup(seed=4)
    b, lp = ids.shape
    D = 4
    max_len = lp + D
    shape = (b, max_len, cfg.num_kv_heads, cfg.head_dim)
    rng = np.random.RandomState(11)
    chunk = jnp.asarray(rng.randint(2, cfg.vocab_size, (b, D)), jnp.int32)

    def prefill(caches):
        return llm_fn(embed_fn(ids), pos, jnp.ones((b, lp), jnp.int32),
                      caches, jnp.zeros((b,), jnp.int32), None)

    # Path A: one chunked forward.
    caches = [(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
              for _ in range(cfg.num_layers)]
    _, _, caches = prefill(caches)
    cpos = lp + jnp.broadcast_to(jnp.arange(D)[None], (b, D))
    kv_seg = (jnp.arange(max_len)[None, :] < lp + D).astype(jnp.int32)
    kv_seg = jnp.broadcast_to(kv_seg, (b, max_len))
    logits_chunk, hidden_chunk, _ = llm_fn(
        embed_fn(chunk), cpos, None, caches,
        jnp.full((b,), lp, jnp.int32), kv_seg)

    # Path B: D single-token decode steps.
    caches = [(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
              for _ in range(cfg.num_layers)]
    _, _, caches = prefill(caches)
    step_logits = []
    for i in range(D):
        widx = jnp.full((b,), lp + i, jnp.int32)
        kseg = (jnp.arange(max_len)[None, :] <= lp + i).astype(jnp.int32)
        kseg = jnp.broadcast_to(kseg, (b, max_len))
        lg, hd, caches = llm_fn(embed_fn(chunk[:, i:i + 1]),
                                widx[:, None], None, caches, widx, kseg)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(logits_chunk),
                               np.asarray(step_logits),
                               rtol=2e-4, atol=2e-4)


def test_make_lookup_corpus():
    corpus, lens = make_lookup_corpus([[5, 6, 7], [8, 9]], width=8,
                                      batch=3, pad_id=0)
    assert corpus.shape == (3, 8) and lens.shape == (3,)
    np.testing.assert_array_equal(corpus[0], [5, 6, 7, 8, 9, 0, 0, 0])
    assert int(lens[0]) == 5
    trunc, tl = make_lookup_corpus([[1] * 10], width=4, batch=1, pad_id=0)
    assert trunc.shape == (1, 4) and int(tl[0]) == 4


def test_evaluate_with_draft_corpus_matches_plain():
    """Full evaluate(): speculative path returns identical output ids,
    lengths, and masks to the per-token path."""
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    T = 4
    args = (params, batch.images_sam, batch.images_clip,
            batch.input_ids[:2], batch.attention_mask[:2])
    plain = make_jitted_evaluate(model, T, eos_id=2)(*args)
    corpus, lens = make_lookup_corpus(
        [[3, 4, 5]], width=8, batch=2, pad_id=2)
    spec = make_jitted_evaluate(
        model, T, eos_id=2, draft_corpus=corpus, corpus_lengths=lens,
        draft_len=3)(*args)
    np.testing.assert_array_equal(np.asarray(spec.output_ids),
                                  np.asarray(plain.output_ids))
    np.testing.assert_array_equal(np.asarray(spec.gen_lengths),
                                  np.asarray(plain.gen_lengths))
    np.testing.assert_allclose(np.asarray(spec.pred_masks_left),
                               np.asarray(plain.pred_masks_left),
                               rtol=1e-3, atol=1e-3)


def test_predictor_speculative_matches_plain():
    """Predictor(speculative=True) — the serving path used by
    server/chat/app/robot_demo — produces the same answers and masks as
    the per-token path, with the ANSWER_LIST template corpus."""
    from haff_tpu.infer.generate import answer_template_corpus
    from haff_tpu.infer.predictor import Predictor

    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    kw = dict(model_preset="tiny", precision="fp32", max_new_tokens=4,
              max_text_len=96)
    plain = Predictor(**kw)
    corpus, lens = answer_template_corpus(plain.tok)
    assert corpus.shape[0] == 1 and int(lens[0]) > 0
    spec = Predictor(**kw, speculative=True, draft_len=4)
    # identical init seeds -> identical params -> identical outputs
    out_p = plain.predict_batch([img], ["open the drawer"])
    out_s = spec.predict_batch([img], ["open the drawer"])
    (ans_p, ml_p, mr_p, tax_p), (ans_s, ml_s, mr_s, tax_s) = out_p[0], out_s[0]
    assert ans_p == ans_s
    np.testing.assert_allclose(np.asarray(ml_p), np.asarray(ml_s),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tax_p), np.asarray(tax_s),
                               rtol=1e-4, atol=1e-4)


def test_speculative_with_moe_decoder():
    """MoE decoder MLPs route per-token with no-drop capacity in decode
    modes (nn/llama.py), so chunked verify and stepwise decode assign
    experts identically — speculative must stay exactly greedy."""
    import dataclasses

    cfg = dataclasses.replace(LlamaConfig.preset("tiny"),
                              moe_num_experts=4, moe_top_k=2)
    model = LlamaForCausalLM(cfg=cfg)
    b, lp, T = 2, 6, 6
    rng = np.random.RandomState(21)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (b, lp)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(lp)[None], (b, lp))
    params = model.init(jax.random.PRNGKey(1), ids, pos, method="init_all")

    def embed_fn(tok):
        return model.apply(params, tok, method="embed")

    def llm_fn(emb, p, seg, caches, idx, kvseg):
        return model.apply(params, emb, p, seg, caches, idx, kvseg)

    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    gen = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=0, cache_dtype=jnp.float32)
    corpus = jnp.concatenate([ids[:, -1:], gen.tokens], axis=1)  # oracle
    spec = speculative_generate(
        cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg, lengths, T,
        eos_id=0, draft_corpus=corpus, draft_len=4,
        cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(spec.tokens),
                                  np.asarray(gen.tokens))
    np.testing.assert_array_equal(np.asarray(spec.lengths),
                                  np.asarray(gen.lengths))
    assert int(spec.steps) < T  # oracle corpus actually accelerates


def test_speculative_with_w8a8_serving_params():
    """The serving composition the campaign benches (--load_in_8bit
    --speculative): chunk-verify forwards run through QDense int8
    kernels; output must equal the per-token path on the SAME quantized
    params."""
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import lisa_serving_predicate, quantize_dense_tree

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    qparams = {"params": quantize_dense_tree(params["params"],
                                             lisa_serving_predicate)}

    T = 4
    args = (qparams, batch.images_sam, batch.images_clip,
            batch.input_ids[:2], batch.attention_mask[:2])
    plain = make_jitted_evaluate(model, T, eos_id=2)(*args)
    corpus, lens = make_lookup_corpus([[3, 4, 5]], width=8, batch=1,
                                      pad_id=2)
    spec = make_jitted_evaluate(
        model, T, eos_id=2, draft_corpus=corpus[0], corpus_lengths=lens[:1],
        draft_len=3)(*args)
    np.testing.assert_array_equal(np.asarray(spec.output_ids),
                                  np.asarray(plain.output_ids))
    np.testing.assert_allclose(np.asarray(spec.pred_masks_left),
                               np.asarray(plain.pred_masks_left),
                               rtol=1e-3, atol=1e-3)
