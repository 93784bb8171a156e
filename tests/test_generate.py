"""Generation: scan-decode alignment vs full forward; evaluate() contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.core.config import IMAGE_TOKEN_INDEX, LlamaConfig, ModelConfig
from haff_tpu.infer.evaluate import make_jitted_evaluate
from haff_tpu.infer.generate import greedy_generate
from haff_tpu.nn.llama import LlamaForCausalLM


def test_generate_matches_full_forward():
    """Each emitted token must equal the argmax of a full (uncached)
    forward over prompt+generated-so-far, and the captured hidden must
    match the full-forward hidden at the emitting position."""
    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    b, lp, T = 2, 6, 4
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (b, lp)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(lp)[None], (b, lp))
    params = model.init(jax.random.PRNGKey(0), ids, pos,
                        method="init_all")

    def embed_fn(tok):
        return model.apply(params, tok, method="embed")

    def llm_fn(emb, p, seg, caches, idx, kvseg):
        return model.apply(params, emb, p, seg, caches, idx, kvseg)

    prompt_embeds = embed_fn(ids)
    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    eos = 0  # unlikely argmax for random weights
    gen = greedy_generate(cfg, embed_fn, llm_fn, prompt_embeds, pos, seg,
                          lengths, T, eos_id=eos, cache_dtype=jnp.float32)
    assert gen.tokens.shape == (b, T)
    assert gen.hiddens.shape == (b, T, cfg.hidden_size)

    # Re-run without cache over the full sequences.
    full_ids = jnp.concatenate([ids, gen.tokens], axis=1)
    full_emb = embed_fn(full_ids)
    full_pos = jnp.broadcast_to(jnp.arange(lp + T)[None], (b, lp + T))
    full_seg = jnp.ones((b, lp + T), jnp.int32)
    logits, hidden, _ = model.apply(params, full_emb, full_pos, full_seg)
    for t in range(T):
        # token t emitted from position lp-1+t
        expect = jnp.argmax(logits[:, lp - 1 + t], axis=-1)
        np.testing.assert_array_equal(np.asarray(gen.tokens[:, t]),
                                      np.asarray(expect), err_msg=f"t={t}")
        np.testing.assert_allclose(
            np.asarray(gen.hiddens[:, t]),
            np.asarray(hidden[:, lp - 1 + t]), rtol=5e-3, atol=5e-3)


def test_generate_ragged_prompts():
    """Rows with different prompt lengths decode independently."""
    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    rng = np.random.RandomState(1)
    lp, T = 8, 3
    ids_short = rng.randint(2, cfg.vocab_size, (1, 5)).astype(np.int32)
    # Batch: row0 = short prompt right-padded to 8; row1 = full 8.
    ids_b = np.concatenate(
        [np.pad(ids_short, ((0, 0), (0, 3))),
         rng.randint(2, cfg.vocab_size, (1, lp)).astype(np.int32)])
    seg = np.ones((2, lp), np.int32)
    seg[0, 5:] = 0
    pos = np.where(seg, np.cumsum(seg, 1) - 1, 0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_b),
                        jnp.asarray(pos), method="init_all")

    def embed_fn(tok):
        return model.apply(params, tok, method="embed")

    def llm_fn(emb, p, s, caches, idx, kvseg):
        return model.apply(params, emb, p, s, caches, idx, kvseg)

    lengths = jnp.asarray([5, 8], jnp.int32)
    gen_b = greedy_generate(cfg, embed_fn, llm_fn,
                            embed_fn(jnp.asarray(ids_b)), jnp.asarray(pos),
                            jnp.asarray(seg), lengths, T, eos_id=0,
                            cache_dtype=jnp.float32)

    # Single-row run of the short prompt alone must match row 0.
    pos_s = jnp.arange(5)[None, :]
    gen_s = greedy_generate(cfg, embed_fn, llm_fn,
                            embed_fn(jnp.asarray(ids_short)), pos_s,
                            jnp.ones((1, 5), jnp.int32),
                            jnp.asarray([5], jnp.int32), T, eos_id=0,
                            cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(gen_b.tokens[0]),
                                  np.asarray(gen_s.tokens[0]))


def test_evaluate_contract_tiny():
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    ev = make_jitted_evaluate(model, max_new_tokens=4, eos_id=2)
    # evaluate on the unique images with one prompt per image
    res = ev(params, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    S = cfg.sam_encoder.image_size
    assert res.output_ids.shape == (2, 4)
    assert res.pred_masks_left.shape == (2, S, S)
    assert res.pred_masks_right.shape == (2, S, S)
    assert res.taxonomies.shape == (2, 4)
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()
