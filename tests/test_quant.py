"""int8 weight-only quantization: roundtrip error, end-to-end closeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_int8_kv_cache_decode_close():
    """greedy_generate with an int8 KV cache tracks the fp32-cache run:
    identical first token (prefill logits are cache-independent) and
    close hiddens / mostly-identical tokens afterwards."""
    from haff_tpu.core.config import LlamaConfig
    from haff_tpu.infer.generate import greedy_generate
    from haff_tpu.nn.llama import LlamaForCausalLM

    cfg = LlamaConfig.preset("tiny")
    model = LlamaForCausalLM(cfg=cfg)
    b, lp, T = 2, 6, 4
    rng = np.random.RandomState(3)
    ids = jnp.asarray(rng.randint(2, cfg.vocab_size, (b, lp))
                      .astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(lp)[None], (b, lp))
    params = model.init(jax.random.PRNGKey(0), ids, pos, method="init_all")

    def embed_fn(tok):
        return model.apply(params, tok, method="embed")

    def llm_fn(emb, p, seg, caches, idx, kvseg):
        return model.apply(params, emb, p, seg, caches, idx, kvseg)

    seg = jnp.ones((b, lp), jnp.int32)
    lengths = jnp.full((b,), lp, jnp.int32)
    ref = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                          lengths, T, eos_id=0, cache_dtype=jnp.float32)
    q = greedy_generate(cfg, embed_fn, llm_fn, embed_fn(ids), pos, seg,
                        lengths, T, eos_id=0, kv_cache_8bit=True)
    np.testing.assert_array_equal(np.asarray(ref.tokens[:, 0]),
                                  np.asarray(q.tokens[:, 0]))
    agree = (np.asarray(ref.tokens) == np.asarray(q.tokens)).mean()
    assert agree >= 0.75, agree
    np.testing.assert_allclose(np.asarray(q.hiddens[:, 0]),
                               np.asarray(ref.hiddens[:, 0]),
                               rtol=0.1, atol=0.1)


def test_quantized_jitted_evaluate_runs():
    """The serving path: int8 weights at rest + int8 KV cache through
    make_jitted_evaluate produces the full contract on the tiny model."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    ref_ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2)
    ref = ref_ev(params, batch.images_sam, batch.images_clip,
                 batch.input_ids[:2], batch.attention_mask[:2])

    qparams, scales = quantize_tree(params, default_llm_predicate)
    assert scales, "tiny preset must have quantizable projections"
    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2,
                              quant_scales=scales,
                              quant_dtype=jnp.float32, kv_cache_8bit=True)
    res = ev(qparams, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    S = cfg.sam_encoder.image_size
    assert res.pred_masks_left.shape == (2, S, S)
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()
    # The (frozen, unquantized) SAM path sees only the projected [SEG]
    # embedding; int8 LLM error must not blow the masks apart.
    ref_l = np.asarray(ref.pred_masks_left, np.float32)
    q_l = np.asarray(res.pred_masks_left, np.float32)
    assert np.abs(q_l - ref_l).mean() < 1.0


def test_int4_roundtrip_error_bound():
    from haff_tpu.nn.quant import (dequantize_kernel_int4,
                                   quantize_kernel_int4)

    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(128, 32).astype(np.float32))
    p, s = quantize_kernel_int4(w, group=64)
    assert p.shape == (64, 32) and p.dtype == jnp.uint8
    assert s.shape == (2, 32)
    back = dequantize_kernel_int4(p, s, group=64, dtype=jnp.float32)
    # group-wise symmetric int4: |err| <= scale/2 per element
    bound = np.repeat(np.asarray(s), 64, axis=0) / 2 + 1e-6
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= bound).all(), err.max()


def test_int4_tree_and_jitted_evaluate():
    """4-bit weights through the serving path (reference load_in_4bit)."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    qparams, scales = quantize_tree(params, default_llm_predicate,
                                    bits=4, group=8)
    kinds = {m[0] for m in scales.values()}
    assert "int4" in kinds, kinds
    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2,
                              quant_scales=scales,
                              quant_dtype=jnp.float32)
    res = ev(qparams, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()


def test_int8_matmul_close():
    from haff_tpu.nn.quant import int8_matmul

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 10, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_kernel(w)
    ref = np.asarray(jnp.einsum("bld,do->blo", x, w))
    out = np.asarray(int8_matmul(x, q, s, dtype=jnp.float32))
    rel = np.abs(out - ref) / (np.abs(ref) + 1.0)
    # W8A8: both operands quantized; error ~2x the weight-only case
    assert np.median(rel) < 0.04, np.median(rel)
    assert rel.max() < 0.25, rel.max()
    # zero rows must not produce NaNs (amax==0 guard)
    z = np.asarray(int8_matmul(jnp.zeros((2, 64)), q, s, dtype=jnp.float32))
    assert (z == 0).all()


def test_qdense_float_path_matches_nn_dense():
    """QDense with a float kernel must be bit-identical to nn.Dense
    (same init RNG stream, same promote/dot/bias math) so every
    existing checkpoint, converter and parity test is unaffected."""
    import flax.linen as nn

    from haff_tpu.nn.layers import QDense

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(3, 7, 24).astype(np.float32), jnp.bfloat16)
    ref_m = nn.Dense(16, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    q_m = QDense(16, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    p_ref = ref_m.init(jax.random.PRNGKey(3), x)
    p_q = q_m.init(jax.random.PRNGKey(3), x)
    np.testing.assert_array_equal(
        np.asarray(p_ref["params"]["kernel"]),
        np.asarray(p_q["params"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(ref_m.apply(p_ref, x), np.float32),
        np.asarray(q_m.apply(p_q, x), np.float32))


def test_sam_encoder_int8_close():
    """quantize_dense_tree + QDense: the int8 SAM encoder tracks the
    float encoder closely (this is the accuracy gate for the int8
    mask-path bench; reference skips visual_model for bnb, but the TPU
    int8 MXU makes encoder quantization the single largest mask-path
    lever — gated here instead)."""
    from haff_tpu.core.config import ModelConfig
    from haff_tpu.nn.quant import quantize_dense_tree, sam_encoder_predicate
    from haff_tpu.nn.sam_image_encoder import SamImageEncoder

    cfg = ModelConfig.preset("tiny").sam_encoder
    model = SamImageEncoder(cfg=cfg)
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(1, cfg.image_size, cfg.image_size, 3)
                    .astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(model.apply({"params": params}, x))

    qparams = quantize_dense_tree(params, sam_encoder_predicate)
    import flax.traverse_util as tu

    flat = tu.flatten_dict(qparams)
    qkeys = [k for k, v in flat.items() if v.dtype == jnp.int8]
    assert qkeys, "tiny encoder must have quantized kernels"
    assert all(k[:-1] + ("scale",) in flat for k in qkeys)
    # patch embed + neck stay float
    assert flat[("patch_embed", "kernel")].dtype != jnp.int8

    out = np.asarray(model.apply({"params": qparams}, x))
    assert np.isfinite(out).all()
    err = np.abs(out - ref)
    denom = np.abs(ref).mean() + 1e-6
    assert err.mean() / denom < 0.1, err.mean() / denom


def test_random_quantized_like_lisa_serving():
    """Whole-model serving-precision materialization: eval_shape ->
    random_quantized_like(lisa_serving_predicate) -> full evaluate().
    This is the path the flagship 7B bench uses to fit a 16 GB chip
    without ever materializing the float model (bench_e2e.py;
    reference analog: bnb 8-bit load, inference.py:133-156)."""
    import flax.traverse_util as tu

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import (lisa_serving_predicate,
                                   random_quantized_like)
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16)
    batch = make_tiny_batch(cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    params = random_quantized_like(shapes, lisa_serving_predicate)

    flat = tu.flatten_dict(params["params"] if "params" in params
                           else params)
    int8 = [k for k, v in flat.items() if v.dtype == jnp.int8]
    # LLM projections AND SAM encoder matmuls are int8; embeddings,
    # CLIP tower and decoders stay float.
    assert any("q_proj" in k for k in int8)
    assert any("lin1" in k for k in int8)
    assert not any("embed_tokens" in k or "vision_tower" in k
                   for k in int8)
    for k in int8:
        assert k[:-1] + ("scale",) in flat, k

    ev = make_jitted_evaluate(model, max_new_tokens=2, eos_id=2)
    res = ev(params, batch.images_sam[:2], batch.images_clip[:2],
             batch.input_ids[:2], batch.attention_mask[:2])
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()
    assert np.isfinite(np.asarray(res.taxonomies)).all()


def test_qdense_int4_in_tree_matches_manual_dequant():
    """QDense W4A16: a packed uint8 kernel + 2D group scales in the
    params tree must reproduce x @ dequant(kernel) + b exactly (the
    per-layer dequant path used by --load_in_4bit serving)."""
    from haff_tpu.nn.layers import QDense
    from haff_tpu.nn.quant import (dequantize_kernel_int4,
                                   quantize_dense_tree)

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(4, 128).astype(np.float32))
    layer = QDense(32, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    qtree = quantize_dense_tree(params["params"], lambda k: True,
                                bits=4, group=64)
    assert qtree["kernel"].dtype == jnp.uint8
    assert qtree["kernel"].shape == (64, 32)
    assert qtree["scale"].shape == (2, 32)
    y = layer.apply({"params": qtree}, x)
    w = dequantize_kernel_int4(qtree["kernel"], qtree["scale"],
                               group=64, dtype=jnp.float32)
    ref = x @ w + qtree["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_int4_in_tree_jitted_evaluate_runs():
    """Whole-model serving with in-tree packed int4 LLM kernels (the
    QDense per-layer dequant path; reference load_in_4bit analog,
    inference.py:133-156) through the full jitted evaluate."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import quantize_dense_tree

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    inner = quantize_dense_tree(params["params"], default_llm_predicate,
                                bits=4, group=8)
    kernels = [v for k, v in jax.tree_util.tree_flatten_with_path(inner)[0]
               if getattr(v, "dtype", None) == jnp.uint8]
    assert kernels, "no int4 kernels produced"
    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2)
    res = ev({"params": inner}, batch.images_sam, batch.images_clip,
             batch.input_ids[:2], batch.attention_mask[:2])
    assert np.isfinite(np.asarray(res.pred_masks_left)).all()


def test_random_quantized_like_int4_shapes():
    from haff_tpu.nn.quant import random_quantized_like

    shapes = {
        "proj": {"kernel": jax.ShapeDtypeStruct((128, 16), jnp.float32),
                 "bias": jax.ShapeDtypeStruct((16,), jnp.float32)},
    }
    out = random_quantized_like(shapes, lambda k: True, bits=4)
    assert out["proj"]["kernel"].dtype == jnp.uint8
    assert out["proj"]["kernel"].shape == (64, 16)
    assert out["proj"]["scale"].shape == (2, 16)


def test_pallas_int8_matmul_matches_xla_path(monkeypatch):
    """HAFF_INT8_PALLAS=1 must be bit-compatible with the XLA W8A8 path
    (same quantization, same rescale; only the dot moves into Pallas)."""
    from haff_tpu.nn.quant import int8_matmul, quantize_kernel

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(40, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 48).astype(np.float32) * 0.05)
    q, s = quantize_kernel(w)
    ref = int8_matmul(x, q, s)
    monkeypatch.setenv("HAFF_INT8_PALLAS", "1")
    out = int8_matmul(x, q, s)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_pallas_int4_matmul_matches_xla_path(monkeypatch):
    """HAFF_INT4_PALLAS=1 (fused in-kernel nibble unpack) must match the
    XLA per-layer-dequant W4A16 path: same group dequant, same bf16
    weight rounding; only where the unpack happens moves."""
    from haff_tpu.nn.quant import int4_matmul, quantize_kernel_int4

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(40, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 72).astype(np.float32) * 0.05)
    p, s = quantize_kernel_int4(w, group=64)
    ref = int4_matmul(x.astype(jnp.bfloat16), p, s, group=64)
    monkeypatch.setenv("HAFF_INT4_PALLAS", "1")
    out = int4_matmul(x.astype(jnp.bfloat16), p, s, group=64)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_pallas_int4_matmul_k_tiled():
    """K2 above the VMEM-budget block cap exercises the K-tiled grid
    (innermost k dim + f32 accumulator scratch) — the untiled kernel
    blew scoped VMEM at 13B's down_proj (K2=6912). K=4096/group=128
    gives bk2=1024, nk=2 in interpret mode; exact vs explicit dequant."""
    from haff_tpu.nn.quant import (dequantize_kernel_int4,
                                   pallas_int4_matmul,
                                   quantize_kernel_int4)

    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(4096, 384).astype(np.float32) * 0.02)
    p, s = quantize_kernel_int4(w, group=128)
    x = jnp.asarray(rng.randn(24, 4096).astype(np.float32))
    out = pallas_int4_matmul(x, p, s, group=128, dtype=jnp.float32,
                             interpret=True)
    ref = x @ dequantize_kernel_int4(p, s, group=128, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_int4_qdense_in_tree(monkeypatch):
    """QDense routes a packed-int4 kernel through the fused Pallas path
    under the gate, with 3D (batch, seq, feat) inputs and bias."""
    import flax.linen as nn

    from haff_tpu.nn.layers import QDense
    from haff_tpu.nn.quant import quantize_dense_tree

    mod = QDense(48, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 5, 128),
                    jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    qtree = quantize_dense_tree({"d": params}, lambda k: True, bits=4)
    ref = mod.apply({"params": qtree["d"]}, x)
    monkeypatch.setenv("HAFF_INT4_PALLAS", "1")
    out = mod.apply({"params": qtree["d"]}, x)
    assert out.shape == (2, 5, 48)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_serving_under_gspmd_mesh(bits):
    """Quantized in-tree serving (W8A8 / W4A16) through the full jitted
    evaluate under a multi-device mesh with a data-sharded batch —
    BASELINE config 5's shape (sharded quantized inference). Quantized
    kernels + scales replicate; the batch shards over the data axis."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import MeshConfig, ModelConfig
    from haff_tpu.core.mesh import build_mesh
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import quantize_dense_tree
    from haff_tpu.parallel.sharding import shard_batch_tree

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg, b_img=2, b_conv=2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    inner = quantize_dense_tree(params["params"], default_llm_predicate,
                                bits=bits, group=8)
    mesh = build_mesh(MeshConfig(data=2, fsdp=1, tensor=2),
                      devices=jax.devices()[:4])
    ev = make_jitted_evaluate(model, max_new_tokens=3, eos_id=2)
    with mesh:
        sb = shard_batch_tree(
            mesh, (batch.images_sam, batch.images_clip,
                   batch.input_ids, batch.attention_mask))
        res = ev({"params": inner}, *sb)
    masks = np.asarray(res.pred_masks_left)
    assert masks.shape[0] == 2
    assert np.isfinite(masks).all()


def test_qdense_out_split_matches_fused_columns():
    """QDense(out_split=...) must return exactly the column slices of
    the fused output — float, int8-in-tree (W8A8/W8A16) and packed-int4
    kernels. The split feeds the SAM windowed-attention band-table path
    with a contiguous q operand."""
    from haff_tpu.nn.layers import QDense
    from haff_tpu.nn.quant import quantize_dense_tree

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(6, 128).astype(np.float32))
    layer = QDense(96, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(2), x)

    def check(tree, **tol):
        fused = layer.apply({"params": tree}, x)
        a, b = layer.apply({"params": tree}, x, out_split=(32, 64))
        assert a.shape == (6, 32) and b.shape == (6, 64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(fused[:, :32]),
                                   **tol)
        np.testing.assert_allclose(np.asarray(b), np.asarray(fused[:, 32:]),
                                   **tol)

    # float kernel: bit-identical (column split leaves K reduction alone)
    check(params["params"], rtol=0, atol=0)
    # int8 in-tree kernel (both W8A8 and W8A16 compute flavors)
    q8 = quantize_dense_tree(params["params"], lambda k: True, bits=8)
    assert q8["kernel"].dtype == jnp.int8
    check(q8, rtol=1e-5, atol=1e-5)
    import os
    old = os.environ.get("HAFF_W8_COMPUTE")
    os.environ["HAFF_W8_COMPUTE"] = "bf16"
    try:
        check(q8, rtol=1e-5, atol=1e-5)
    finally:
        if old is None:
            os.environ.pop("HAFF_W8_COMPUTE", None)
        else:
            os.environ["HAFF_W8_COMPUTE"] = old
    # packed-int4 kernel + 2D group scales
    q4 = quantize_dense_tree(params["params"], lambda k: True,
                             bits=4, group=64)
    assert q4["kernel"].dtype == jnp.uint8
    check(q4, rtol=1e-5, atol=1e-5)


def test_int8_matmul_grad_is_straight_through():
    """d/dx of the W8A8 matmul must be the dequantized-weight dot (STE):
    the activation-quant round would otherwise zero every gradient that
    crosses a quantized frozen layer (QLoRA, reference
    train_ds.py:57-58)."""
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.quant import int8_matmul, quantize_kernel

    rng = np.random.RandomState(0)
    w = rng.randn(64, 48).astype(np.float32) * 0.3
    q, scale = quantize_kernel(jnp.asarray(w))
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    dy = jnp.asarray(rng.randn(4, 48).astype(np.float32))

    def f(x):
        return jnp.sum(int8_matmul(x, q, scale, dtype=jnp.float32) * dy)

    g = jax.grad(f)(x)
    wd = np.asarray(q, np.float32) * np.asarray(scale)
    expected = np.asarray(dy) @ wd.T
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5,
                               atol=1e-5)
    # value path unchanged by the custom_vjp wrapper
    y = int8_matmul(x, q, scale, dtype=jnp.float32)
    ref = (np.asarray(x) @ wd)
    assert float(np.mean(np.abs(np.asarray(y) - ref))) < 0.05


def test_qlora_in_tree_quantized_frozen_step():
    """Train step with the frozen base quantized IN-TREE (QDense reads
    int8 kernels + scales directly; no whole-tree dequant materializes a
    float copy): finite loss, nonzero trainable grads THROUGH the
    quantized layers, quantized leaves untouched."""
    import jax
    import jax.numpy as jnp

    from haff_tpu.core.config import ModelConfig, TrainConfig
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import default_llm_predicate, quantize_dense_tree
    from haff_tpu.train.trainer import (init_train_state, make_train_step,
                                        partition_params)
    from test_lisa_model import make_tiny_batch

    import flax.linen as nn_

    cfg = ModelConfig.preset("tiny").replace(
        llama=__import__("dataclasses").replace(
            ModelConfig.preset("tiny").llama, lora_rank=4))
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)
    model = LisaModel(cfg=cfg, dtype=jnp.float32, remat=False)
    tb = make_tiny_batch(cfg)
    params = nn_.unbox(
        jax.jit(model.init)(jax.random.PRNGKey(0), tb)["params"])
    trainable, frozen = partition_params(params)
    frozen_q = quantize_dense_tree(frozen, default_llm_predicate, bits=8)
    state = init_train_state(tcfg, trainable)
    step = jax.jit(make_train_step(model, tcfg))
    state2, metrics = step(state, frozen_q, tb, jax.random.PRNGKey(1))
    # warmup starts the lr schedule at 0 — the second step applies a
    # real update
    state2, metrics = step(state2, frozen_q, tb, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # LoRA adapters sit under the quantized projections: their grads can
    # only be nonzero if the STE backward flows through int8 layers.
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.trainable, state2.trainable)
    flat = {"/".join(k): v for k, v in
            __import__("flax").traverse_util.flatten_dict(moved).items()}
    lora_moves = [v for k, v in flat.items() if "lora" in k.lower()]
    assert lora_moves and max(lora_moves) > 0
