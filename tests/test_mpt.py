"""MPT backend: ALiBi exactness, prefill/decode consistency, multiquery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.nn.mpt import (
    MptConfig,
    MptForCausalLM,
    alibi_column_bias,
    alibi_slopes,
)


def test_alibi_slopes_power_of_two():
    s = np.asarray(alibi_slopes(8))
    np.testing.assert_allclose(s, [2 ** -1, 2 ** -2, 2 ** -3, 2 ** -4,
                                   2 ** -5, 2 ** -6, 2 ** -7, 2 ** -8])


def test_alibi_column_bias_equals_full_bias_under_softmax():
    """Column-only bias must give the same softmax as the full
    -slope*(i-j) bias."""
    nh, L = 4, 16
    slopes = np.asarray(alibi_slopes(nh))
    col = np.asarray(alibi_column_bias(nh, L))[0]  # (nh, 1, L)
    rng = np.random.RandomState(0)
    logits = rng.randn(nh, L, L).astype(np.float32)
    i = np.arange(L)[:, None]
    j = np.arange(L)[None, :]
    causal = j <= i
    full = logits - slopes[:, None, None] * (i - j)
    colb = logits + col
    for h in range(nh):
        a = np.where(causal, full[h], -1e9)
        b = np.where(causal, colb[h], -1e9)
        pa = np.exp(a - a.max(-1, keepdims=True))
        pa /= pa.sum(-1, keepdims=True)
        pb = np.exp(b - b.max(-1, keepdims=True))
        pb /= pb.sum(-1, keepdims=True)
        np.testing.assert_allclose(pa, pb, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("multiquery", [False, True])
def test_mpt_prefill_decode_consistency(multiquery):
    import dataclasses

    cfg = dataclasses.replace(MptConfig.preset("tiny"),
                              multiquery=multiquery)
    model = MptForCausalLM(cfg=cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (2, 12))
                      .astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), ids, method="init_all")

    emb = model.apply(params, ids, method="embed")
    seg = jnp.ones((2, 12), jnp.int32)
    logits_full, hidden_full, _ = model.apply(params, emb, None, seg)

    prompt_len, max_len = 8, 12
    caches = model.init_kv_caches(2, max_len, dtype=jnp.float32)
    logits_p, _, caches = model.apply(
        params, emb[:, :prompt_len], None, seg[:, :prompt_len],
        kv_caches=caches, cache_index=jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_full[:, :prompt_len]),
                               rtol=3e-4, atol=3e-4)

    kv_seg = (jnp.arange(max_len)[None, :] < prompt_len).astype(jnp.int32)
    kv_seg = jnp.broadcast_to(kv_seg, (2, max_len))
    for t in range(prompt_len, 12):
        kv_seg = kv_seg.at[:, t].set(1)
        logits_t, _, caches = model.apply(
            params, emb[:, t:t + 1], None, None, kv_caches=caches,
            cache_index=jnp.full((2,), t, jnp.int32),
            cache_kv_segment_ids=kv_seg)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(logits_full[:, t]),
            rtol=3e-4, atol=3e-4, err_msg=f"step {t}")


def test_lisa_with_mpt_backend():
    """Composite model with decoder='mpt': train forward + evaluate."""
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny").replace(decoder="mpt")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert np.isfinite(float(out.loss))

    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2)
    res = ev(params, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    assert res.output_ids.shape == (2, 3)
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()


def test_mpt_evaluate_int8_kv_cache():
    """--decoder mpt + --kv_cache_8bit: the MPT cache write/read must
    handle QuantArray caches (regression: only llama had the branch)."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny").replace(decoder="mpt")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2,
                              kv_cache_8bit=True)
    res = ev(params, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()

    # int8-cache decode tracks the fp-cache decode
    ref = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2)(
        params, batch.images_sam, batch.images_clip,
        batch.input_ids[:2], batch.attention_mask[:2])
    agree = (np.asarray(res.output_ids) == np.asarray(ref.output_ids)).mean()
    assert agree >= 0.5, agree


def test_mpt_clip_qkv_and_qk_ln():
    """attn_config knobs (reference mpt/attention.py:273-297,332-338):
    clip_qkv clamps the fused projection; qk_ln LayerNorms q/k over
    their full projected widths. Both must change outputs (knobs wired)
    and keep them finite; qk_ln adds q_ln/k_ln params."""
    import dataclasses

    import flax.traverse_util as tu

    base = MptConfig.preset("tiny")
    rng = np.random.RandomState(0)
    ids = rng.randint(0, base.vocab_size, (2, 12)).astype(np.int32)

    def run(cfg, seed=0):
        m = MptForCausalLM(cfg=cfg)
        p = jax.jit(lambda k, i: m.init(k, i, method="init_all"))(
            jax.random.PRNGKey(seed), jnp.asarray(ids))
        logits, _, _ = m.apply(p, m.apply(p, jnp.asarray(ids),
                                          method="embed"))
        return p, np.asarray(logits)

    p0, ref = run(base)
    # clip_qkv with a huge bound is a no-op; a tight bound changes logits
    _, same = run(dataclasses.replace(base, clip_qkv=1e6))
    np.testing.assert_allclose(same, ref, rtol=1e-6, atol=1e-6)
    _, clipped = run(dataclasses.replace(base, clip_qkv=0.05))
    assert np.isfinite(clipped).all() and not np.allclose(clipped, ref)

    p_ln, out_ln = run(dataclasses.replace(base, qk_ln=True))
    flat = tu.flatten_dict(p_ln["params"])
    assert any("q_ln" in k for k in flat) and any("k_ln" in k for k in flat)
    assert np.isfinite(out_ln).all()


def test_mpt_prefix_lm():
    """Prefix-LM (reference modeling_mpt.py _apply_prefix_mask): with a
    prefix mask, prefix keys are visible to ALL queries (bidirectional
    inside the prefix); non-prefix attention stays causal. Check against
    a dense softmax reference."""
    import dataclasses

    cfg = dataclasses.replace(MptConfig.preset("tiny"), prefix_lm=True,
                              attn_impl="torch")
    m = MptForCausalLM(cfg=cfg)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size, (1, 10)).astype(np.int32)
    p = jax.jit(lambda k, i: m.init(k, i, method="init_all"))(
        jax.random.PRNGKey(0), jnp.asarray(ids))
    emb = m.apply(p, jnp.asarray(ids), method="embed")
    prefix = np.zeros((1, 10), np.int32)
    prefix[:, :4] = 1

    # causal (no prefix) vs prefix-lm must differ INSIDE the prefix
    # (tokens 0..3 now see 0..3 bidirectionally) ...
    causal_logits, _, _ = m.apply(p, emb)
    pre_logits, _, _ = m.apply(p, emb, prefix_mask=jnp.asarray(prefix))
    causal_logits, pre_logits = map(np.asarray, (causal_logits, pre_logits))
    assert not np.allclose(pre_logits[0, :3], causal_logits[0, :3])
    assert np.isfinite(pre_logits).all()

    # Exactness: with a SINGLE block, the last row's attention inputs
    # (k/v from pre-attention states) are unchanged by the prefix mask,
    # so its logits must match causal exactly.
    cfg1 = dataclasses.replace(cfg, n_layers=1)
    m1 = MptForCausalLM(cfg=cfg1)
    p1 = jax.jit(lambda k, i: m1.init(k, i, method="init_all"))(
        jax.random.PRNGKey(0), jnp.asarray(ids))
    emb1 = m1.apply(p1, jnp.asarray(ids), method="embed")
    c1, _, _ = m1.apply(p1, emb1)
    pl1, _, _ = m1.apply(p1, emb1, prefix_mask=jnp.asarray(prefix))
    np.testing.assert_allclose(np.asarray(pl1)[0, -1], np.asarray(c1)[0, -1],
                               rtol=2e-5, atol=2e-5)
    # an all-zero prefix mask reduces exactly to causal
    zero, _, _ = m.apply(p, emb, prefix_mask=jnp.zeros((1, 10), jnp.int32))
    np.testing.assert_allclose(np.asarray(zero), causal_logits,
                               rtol=2e-5, atol=2e-5)


def test_mpt_attn_impl_torch_matches_flash():
    """attn_impl='torch' (dense reference attention) and the Pallas/XLA
    flash path must agree — same math, different schedule."""
    import dataclasses

    base = MptConfig.preset("tiny")
    rng = np.random.RandomState(2)
    ids = rng.randint(0, base.vocab_size, (2, 16)).astype(np.int32)
    m1 = MptForCausalLM(cfg=base)
    p = jax.jit(lambda k, i: m1.init(k, i, method="init_all"))(
        jax.random.PRNGKey(0), jnp.asarray(ids))
    emb = m1.apply(p, jnp.asarray(ids), method="embed")
    flash_logits, _, _ = m1.apply(p, emb)
    m2 = MptForCausalLM(cfg=dataclasses.replace(base, attn_impl="torch"))
    torch_logits, _, _ = m2.apply(p, emb)
    np.testing.assert_allclose(np.asarray(flash_logits),
                               np.asarray(torch_logits),
                               rtol=2e-4, atol=2e-4)
