"""LLaMA decoder: prefill-vs-decode consistency, padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from haff_tpu.core.config import LlamaConfig
from haff_tpu.nn.llama import LlamaForCausalLM, apply_rope, rope_table


def test_rope_rotation_preserves_norm():
    table = rope_table(16, 32, 10000.0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 2, 16)
                    .astype(np.float32))
    pos = jnp.arange(8)[None, :]
    y = apply_rope(x, pos, table)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-5)


def _tiny_model_and_params(batch=1, seqlen=16):
    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    embeds = jnp.zeros((batch, seqlen, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(seqlen)[None], (batch, seqlen))
    params = model.init(jax.random.PRNGKey(0), embeds, pos)
    return cfg, model, params


def test_prefill_then_decode_matches_full_forward():
    """Greedy decode with KV cache must agree with re-running the full
    sequence (validates the cache write/read path, and therefore the
    hidden-state capture the [SEG] gather relies on)."""
    cfg, model, params = _tiny_model_and_params(batch=2, seqlen=12)
    rng = np.random.RandomState(0)
    full_embeds = jnp.asarray(
        rng.randn(2, 12, cfg.hidden_size).astype(np.float32) * 0.1)
    prompt_len = 8
    max_len = 12

    # Full forward over all 12 tokens (no cache).
    pos = jnp.broadcast_to(jnp.arange(12)[None], (2, 12))
    seg = jnp.ones((2, 12), jnp.int32)
    logits_full, hidden_full, _ = model.apply(
        params, full_embeds, pos, seg)

    # Prefill 8 tokens (writing the cache), then decode 4 steps.
    caches = model.init_kv_caches(2, max_len, dtype=jnp.float32)
    pos_p = pos[:, :prompt_len]
    seg_p = seg[:, :prompt_len]
    logits_p, hidden_p, caches = model.apply(
        params, full_embeds[:, :prompt_len], pos_p, seg_p,
        kv_caches=caches, cache_index=jnp.zeros((2,), jnp.int32))

    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_full[:, :prompt_len]),
        rtol=2e-4, atol=2e-4)

    kv_seg = (jnp.arange(max_len)[None, :] < prompt_len).astype(jnp.int32)
    kv_seg = jnp.broadcast_to(kv_seg, (2, max_len))
    for t in range(prompt_len, 12):
        idx = jnp.full((2,), t, jnp.int32)
        kv_seg = kv_seg.at[:, t].set(1)
        logits_t, hidden_t, caches = model.apply(
            params, full_embeds[:, t:t + 1], pos[:, t:t + 1],
            kv_caches=caches, cache_index=idx,
            cache_kv_segment_ids=kv_seg)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(logits_full[:, t]),
            rtol=2e-4, atol=2e-4, err_msg=f"step {t}")
        np.testing.assert_allclose(
            np.asarray(hidden_t[:, 0]), np.asarray(hidden_full[:, t]),
            rtol=2e-4, atol=2e-4)


def test_padding_does_not_leak():
    """Right padding must not change real-token outputs."""
    cfg, model, params = _tiny_model_and_params(batch=1, seqlen=16)
    rng = np.random.RandomState(1)
    emb8 = jnp.asarray(rng.randn(1, 8, cfg.hidden_size).astype(np.float32))
    pos8 = jnp.arange(8)[None, :]
    seg8 = jnp.ones((1, 8), jnp.int32)
    logits8, _, _ = model.apply(params, emb8, pos8, seg8)

    emb16 = jnp.concatenate(
        [emb8, jnp.asarray(rng.randn(1, 8, cfg.hidden_size)
                           .astype(np.float32))], axis=1)
    pos16 = jnp.concatenate([pos8, jnp.zeros((1, 8), jnp.int32)], axis=1)
    seg16 = jnp.concatenate([seg8, jnp.zeros((1, 8), jnp.int32)], axis=1)
    logits16, _, _ = model.apply(params, emb16, pos16, seg16)

    np.testing.assert_allclose(
        np.asarray(logits8), np.asarray(logits16[:, :8]),
        rtol=2e-4, atol=2e-4)


def test_lora_target_modules_configurable():
    """lora_targets extends adapters beyond q/v (reference
    --lora_target_modules); zero-init lora_b keeps outputs unchanged at
    init, and untargeted q/v retain the stable base/kernel layout."""
    import dataclasses

    from flax import traverse_util

    cfg = dataclasses.replace(LlamaConfig.preset("tiny"), lora_rank=2,
                              lora_targets=("q_proj", "k_proj", "v_proj",
                                            "o_proj"))
    model = LlamaForCausalLM(cfg=cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (1, 8)).astype(np.int32))
    pos = jnp.arange(8)[None]
    params = model.init(jax.random.PRNGKey(0), ids, pos, method="init_all")
    flat = traverse_util.flatten_dict(params["params"])
    attn = [k for k in flat if "self_attn" in k and "lora_a" in k]
    projs = {k[k.index("self_attn") + 1] for k in attn}
    assert projs == {"q_proj", "k_proj", "v_proj", "o_proj"}, projs

    # default targets: k/o stay plain Dense (kernel directly, no base/)
    cfg0 = dataclasses.replace(LlamaConfig.preset("tiny"), lora_rank=2)
    p0 = LlamaForCausalLM(cfg=cfg0).init(jax.random.PRNGKey(0), ids, pos,
                                         method="init_all")
    flat0 = traverse_util.flatten_dict(p0["params"])
    k_keys = [k for k in flat0 if "k_proj" in k]
    assert all("base" not in k for k in k_keys), k_keys
