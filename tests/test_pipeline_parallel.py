"""Pipeline parallelism (parallel/pipeline.py): GPipe engine parity on
the virtual 8-device CPU mesh — forward, gradients, LISA train step,
and composition with data/tensor axes. Beyond-parity capability (the
reference's DeepSpeed config is ZeRO-2 only, train_ds.py:344-393)."""

import dataclasses
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_lisa_model import make_tiny_batch  # noqa: E402

from haff_tpu.core.config import (
    LlamaConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from haff_tpu.core.mesh import build_mesh
from haff_tpu.model.lisa import LisaModel, TrainBatch
from haff_tpu.parallel.pipeline import (
    auto_microbatches,
    pipelined_llm_forward,
    stack_layer_params,
    unstack_layer_params,
)
from haff_tpu.train.trainer import (
    init_train_state,
    make_train_step,
    partition_params,
)


def test_stack_unstack_roundtrip():
    params = {
        f"layers_{i}": {"w": jnp.full((2, 3), i), "b": jnp.full((3,), -i)}
        for i in range(4)
    }
    stacked = stack_layer_params(params, 4)
    assert stacked["w"].shape == (4, 2, 3)
    back = unstack_layer_params(stacked, 4)
    for i in range(4):
        np.testing.assert_array_equal(back[f"layers_{i}"]["w"],
                                      params[f"layers_{i}"]["w"])
        np.testing.assert_array_equal(back[f"layers_{i}"]["b"],
                                      params[f"layers_{i}"]["b"])


def test_auto_microbatches():
    assert auto_microbatches(24, 4) == 8    # 2*stages divides
    assert auto_microbatches(6, 4) == 6     # batch < 2*stages
    assert auto_microbatches(9, 4) == 3     # largest divisor <= 8
    assert auto_microbatches(7, 4) == 7     # prime batch <= target
    assert auto_microbatches(1, 4) == 1
    # shard-aware: microbatch rows must still divide data*fsdp
    assert auto_microbatches(16, 4, shards=4) == 4   # nm=8 -> mb=2 < 4
    assert auto_microbatches(24, 4, shards=2) == 6   # nm=8 -> mb=3 odd
    assert auto_microbatches(9, 4, shards=2) == 3    # no fit: fallback


@pytest.fixture(scope="module")
def tiny_llm():
    cfg = LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=4, num_heads=4, num_kv_heads=4, head_dim=8,
                      max_seq_len=64)
    from haff_tpu.nn.llama import LlamaForCausalLM

    llm = LlamaForCausalLM(cfg=cfg)
    rng = np.random.RandomState(0)
    B, L = 4, 16
    ids = jnp.asarray(rng.randint(0, 128, (B, L)))
    pos = jnp.tile(jnp.arange(L), (B, 1))
    seg = jnp.ones((B, L), jnp.int32)
    params = llm.init(jax.random.PRNGKey(0), ids, pos,
                      method="init_all")["params"]
    emb = llm.apply({"params": params}, ids, method="embed")
    return cfg, llm, params, emb, pos, seg


def test_llama_pipeline_forward_parity(tiny_llm):
    cfg, llm, params, emb, pos, seg = tiny_llm
    mesh = build_mesh(MeshConfig(data=2, pp=4))
    with mesh:
        logits_ref, hidden_ref, _ = jax.jit(
            lambda p, e: llm.apply({"params": p}, e, pos, seg))(params, emb)
        logits_pp, hidden_pp = jax.jit(
            lambda p, e: pipelined_llm_forward(
                cfg, p, e, pos, seg, mesh=mesh,
                num_microbatches=2))(params, emb)
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden_pp),
                               np.asarray(hidden_ref), atol=2e-5)


def test_llama_pipeline_grad_parity(tiny_llm):
    cfg, llm, params, emb, pos, seg = tiny_llm
    mesh = build_mesh(MeshConfig(data=1, pp=2, tensor=2, fsdp=2))

    def loss_ref(p, e):
        lg, _, _ = llm.apply({"params": p}, e, pos, seg)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    def loss_pp(p, e):
        lg, _ = pipelined_llm_forward(cfg, p, e, pos, seg, mesh=mesh,
                                      num_microbatches=4)
        return jnp.mean(lg.astype(jnp.float32) ** 2)

    with mesh:
        g_ref = jax.jit(jax.grad(loss_ref))(params, emb)
        g_pp = jax.jit(jax.grad(loss_pp))(params, emb)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_uses_collective_permute(tiny_llm):
    """The stage hand-off must compile to point-to-point collective
    permutes (ppermute), not all-gathers."""
    cfg, llm, params, emb, pos, seg = tiny_llm
    mesh = build_mesh(MeshConfig(data=2, pp=4))
    with mesh:
        txt = jax.jit(
            lambda p, e: pipelined_llm_forward(
                cfg, p, e, pos, seg, mesh=mesh, num_microbatches=2)
        ).lower(params, emb).compile().as_text()
    assert "collective-permute" in txt


def test_pipeline_rejects_sequence_parallel(tiny_llm):
    cfg, llm, params, emb, pos, seg = tiny_llm
    cfg_sp = dataclasses.replace(cfg, sequence_parallel=True)
    mesh = build_mesh(MeshConfig(data=2, pp=4))
    with pytest.raises(ValueError, match="sequence_parallel"):
        pipelined_llm_forward(cfg_sp, params, emb, pos, seg, mesh=mesh,
                              num_microbatches=2)


def test_pipeline_divisibility_errors(tiny_llm):
    cfg, llm, params, emb, pos, seg = tiny_llm
    mesh = build_mesh(MeshConfig(data=1, pp=8))  # 4 layers, 8 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_llm_forward(cfg, params, emb, pos, seg, mesh=mesh,
                              num_microbatches=2)
    mesh = build_mesh(MeshConfig(data=2, pp=4))
    with pytest.raises(ValueError, match="num_microbatches"):
        pipelined_llm_forward(cfg, params, emb, pos, seg, mesh=mesh,
                              num_microbatches=3)  # batch 4 % 3 != 0


def test_mpt_pipeline_forward_parity():
    """The MPT decoder family pipelines through the same engine
    (blocks_i stacking, ALiBi needs no positions, tied head)."""
    from haff_tpu.nn.mpt import MptConfig, MptForCausalLM
    from haff_tpu.parallel.pipeline import pipelined_mpt_forward

    cfg = MptConfig.preset("tiny")
    llm = MptForCausalLM(cfg=cfg)
    rng = np.random.RandomState(0)
    B, L = 4, 16
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, L)))
    seg = jnp.ones((B, L), jnp.int32)
    params = llm.init(jax.random.PRNGKey(0), ids,
                      method="init_all")["params"]
    emb = llm.apply({"params": params}, ids, method="embed")
    mesh = build_mesh(MeshConfig(data=4, pp=2))
    with mesh:
        logits_ref, hidden_ref, _ = jax.jit(
            lambda p, e: llm.apply({"params": p}, e,
                                   segment_ids=seg))(params, emb)
        logits_pp, hidden_pp = jax.jit(
            lambda p, e: pipelined_mpt_forward(
                cfg, p, e, seg, mesh=mesh,
                num_microbatches=2))(params, emb)
    np.testing.assert_allclose(np.asarray(logits_pp),
                               np.asarray(logits_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden_pp),
                               np.asarray(hidden_ref), atol=2e-5)


def test_lisa_mpt_decoder_pipeline_dispatch():
    """pipelined_lisa_forward routes the MPT decoder family through the
    engine and matches the plain composite forward."""
    from haff_tpu.parallel.pipeline import pipelined_lisa_forward

    cfg = dataclasses.replace(ModelConfig.preset("tiny"), decoder="mpt")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = nn.unbox(jax.jit(model.init)(jax.random.PRNGKey(0),
                                          batch)["params"])
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(image_index=jnp.asarray([0, 1, 0, 1],
                                                     jnp.int32))
    out_ref = jax.jit(lambda p, b: model.apply({"params": p}, b))(
        params, batch4)
    mesh = build_mesh(MeshConfig(data=4, pp=2))
    with mesh:
        out_pp = jax.jit(lambda p, b: pipelined_lisa_forward(
            model, p, b, mesh=mesh, num_microbatches=2))(params, batch4)
    np.testing.assert_allclose(float(out_pp.loss), float(out_ref.loss),
                               atol=1e-4)


def lisa_cfg_nodrop():
    """Tiny LISA with LoRA on but dropout off: the non-pp and pp paths
    draw dropout masks differently (per-microbatch folds), so exact
    train-step parity requires rate 0."""
    cfg = ModelConfig.preset("tiny")
    return cfg.replace(llama=dataclasses.replace(
        cfg.llama, lora_rank=2, lora_dropout=0.0))


def test_lisa_train_step_pp_parity():
    """One full LISA train step (loss + grads + optimizer update) under
    a (data 2, pipe 2, tensor 2) mesh matches the single-program step
    to float tolerance."""
    cfg = lisa_cfg_nodrop()
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = nn.unbox(variables["params"])
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)

    # batch of 4 rows so it shards over data*fsdp and splits into
    # microbatches
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(
        image_index=jnp.asarray([0, 1, 0, 1], jnp.int32))

    rng = jax.random.PRNGKey(0)
    state0 = init_train_state(tcfg, trainable)
    ref_step = jax.jit(make_train_step(model, tcfg))
    state_ref, metrics_ref = ref_step(state0, frozen, batch4, rng)

    mesh = build_mesh(MeshConfig(data=2, pp=2, tensor=2))
    with mesh:
        pp_step = jax.jit(make_train_step(model, tcfg, mesh=mesh))
        state_pp, metrics_pp = pp_step(state0, frozen, batch4, rng)

    for k in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss",
              "taxonomy_ce_loss"):
        np.testing.assert_allclose(float(metrics_pp[k]),
                                   float(metrics_ref[k]), atol=1e-4,
                                   err_msg=k)
    # updated trainable params agree
    flat_ref = jax.tree_util.tree_leaves_with_path(state_ref.trainable)
    flat_pp = jax.tree_util.tree_leaves(state_pp.trainable)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_lisa_eval_step_pp_matches_plain():
    """make_eval_step with a pipe mesh: pipelined validation forward
    matches the plain apply."""
    from haff_tpu.train.trainer import make_eval_step

    cfg = lisa_cfg_nodrop()
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = nn.unbox(jax.jit(model.init)(jax.random.PRNGKey(0),
                                          batch)["params"])
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(model=cfg, grad_accumulation_steps=1)
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(image_index=jnp.asarray([0, 1, 0, 1],
                                                     jnp.int32))
    out_ref = jax.jit(make_eval_step(model))(trainable, frozen, batch4)
    mesh = build_mesh(MeshConfig(data=4, pp=2))
    with mesh:
        out_pp = jax.jit(make_eval_step(model, tcfg, mesh=mesh))(
            trainable, frozen, batch4)
    np.testing.assert_allclose(float(out_pp.loss), float(out_ref.loss),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pp.pred_masks_left),
                               np.asarray(out_ref.pred_masks_left),
                               atol=1e-3)


def test_lisa_pp_with_w8a8_quantized_params():
    """Pipeline engine composes with in-tree W8A8 serving: QDense int8
    kernels + scales stack per layer and produce the same loss as the
    single-program quantized forward."""
    from haff_tpu.nn.quant import lisa_serving_predicate, quantize_dense_tree
    from haff_tpu.parallel.pipeline import pipelined_lisa_forward

    cfg = lisa_cfg_nodrop()
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = nn.unbox(jax.jit(model.init)(jax.random.PRNGKey(0),
                                          batch)["params"])
    qparams = quantize_dense_tree(params, lisa_serving_predicate)
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(image_index=jnp.asarray([0, 1, 0, 1],
                                                     jnp.int32))
    out_ref = jax.jit(lambda p, b: model.apply({"params": p}, b))(
        qparams, batch4)
    mesh = build_mesh(MeshConfig(data=4, pp=2))
    with mesh:
        out_pp = jax.jit(lambda p, b: pipelined_lisa_forward(
            model, p, b, mesh=mesh, num_microbatches=2))(qparams, batch4)
    np.testing.assert_allclose(float(out_pp.loss), float(out_ref.loss),
                               atol=1e-4)


def test_lisa_train_step_pp_with_dropout_runs():
    """With LoRA dropout active the pp step still runs (per-stage/
    microbatch rng folds) and produces a finite loss."""
    cfg = ModelConfig.preset("tiny")
    cfg = cfg.replace(llama=dataclasses.replace(cfg.llama, lora_rank=2))
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = nn.unbox(jax.jit(model.init)(jax.random.PRNGKey(0),
                                          batch)["params"])
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(image_index=jnp.asarray([0, 1, 0, 1],
                                                     jnp.int32))
    mesh = build_mesh(MeshConfig(data=4, pp=2))
    state = init_train_state(tcfg, trainable)
    with mesh:
        step = jax.jit(make_train_step(model, tcfg, mesh=mesh))
        state, metrics = step(state, frozen, batch4, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
