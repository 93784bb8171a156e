"""int8 weight-only quantization: roundtrip error, end-to-end closeness."""

import jax
import jax.numpy as jnp
import numpy as np

from haff_tpu.nn.quant import (
    default_llm_predicate,
    dequantize_kernel,
    make_quantized_apply,
    quantize_kernel,
    quantized_matmul,
    quantize_tree,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_kernel(w)
    back = dequantize_kernel(q, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-channel symmetric: error <= scale/2 per element
    bound = np.asarray(s)[None, :] / 2 + 1e-6
    assert (err <= bound).all()


def test_quantized_matmul_close():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_kernel(w)
    ref = np.asarray(x @ w)
    out = np.asarray(quantized_matmul(x, q, s))
    rel = np.abs(out - ref) / (np.abs(ref) + 1.0)
    # int8 error accumulates over the 64-dim contraction: ~sqrt(64) *
    # scale/sqrt(12) ~= 0.05 absolute on unit-variance inputs
    assert rel.max() < 0.12, rel.max()
    assert np.median(rel) < 0.02


def test_llm_quantized_apply_close():
    from haff_tpu.core.config import LlamaConfig
    from haff_tpu.nn.llama import LlamaForCausalLM

    import flax.linen as nn

    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    ids = jnp.asarray(np.random.RandomState(0)
                      .randint(2, cfg.vocab_size, (1, 16)).astype(np.int32))
    pos = jnp.arange(16)[None]
    params = nn.unbox(model.init(jax.random.PRNGKey(0), ids, pos,
                                 method="init_all")["params"])
    emb = model.apply({"params": params}, ids, method="embed")
    seg = jnp.ones((1, 16), jnp.int32)
    ref_logits, _, _ = model.apply({"params": params}, emb, pos, seg)

    qparams, apply_fn = make_quantized_apply(model, params,
                                             dtype=jnp.float32)
    # embeddings untouched; projections int8
    assert qparams["model"]["layers_0"]["self_attn"]["k_proj"][
        "kernel"].dtype == jnp.int8
    assert qparams["embed_tokens"]["embedding"].dtype != jnp.int8
    q_logits, _, _ = apply_fn(qparams, emb, pos, seg)

    # top-1 agreement on most positions + bounded logit deviation
    top_ref = np.argmax(np.asarray(ref_logits), -1)
    top_q = np.argmax(np.asarray(q_logits), -1)
    assert (top_ref == top_q).mean() > 0.8
