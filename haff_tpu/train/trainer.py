"""Training loop: optax AdamW + warmup-decay, LoRA/freeze masking,
gradient accumulation, one jitted train step.

Capability parity with reference train_ds.py:
  * trainable set == the reference's (train_ds.py:192-244): LoRA a/b on
    q/v, embed_tokens, lm_head, both mask decoders, text projection
    ([SEG] MLP); everything else frozen.
  * WarmupDecayLR: linear warmup over warmup_steps then linear decay to 0
    (train_ds.py:356-371).
  * grad accumulation via optax.MultiSteps (train_ds.py:85-88).
  * AdamW betas/weight-decay surface, grad clip 1.0 (train_ds.py:344-380).

TPU-first: gradients are taken ONLY w.r.t. the trainable partition (the
frozen tree is a closed-over operand — no wasted optimizer state, the
ZeRO-style sharding of optimizer state falls out of the param shardings).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..core.config import TrainConfig
from ..model.lisa import LisaModel, TrainBatch

TRAINABLE_KEYS = ("lora_a", "lora_b", "embed_tokens", "lm_head",
                  "mask_decoder_left", "mask_decoder_right", "text_fc1",
                  "text_fc2")


def trainable_mask_path(path: Tuple[str, ...],
                        exclude: Tuple[str, ...] = (),
                        extra: Tuple[str, ...] = ()) -> bool:
    """Reference freezing semantics (train_ds.py:192-244). `exclude`
    removes keys from the trainable set (e.g. the mask decoders when
    --train_mask_decoder is off); `extra` adds keys (e.g. "moe" to
    train MoE experts+router, which sit outside the reference set)."""
    keys = tuple(k for k in TRAINABLE_KEYS if k not in exclude) + extra
    return any(k in path for k in keys)


def partition_params(params: Dict, exclude: Tuple[str, ...] = (),
                     extra: Tuple[str, ...] = ()
                     ) -> Tuple[Dict, Dict]:
    """params (unboxed dict) -> (trainable, frozen) with identical tree
    structure positions (missing branches pruned)."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items()
             if trainable_mask_path(k, exclude, extra)}
    frozen = {k: v for k, v in flat.items()
              if not trainable_mask_path(k, exclude, extra)}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def make_schedule(cfg: TrainConfig):
    """WarmupDecayLR: 0 -> lr over warmup_steps, then linear -> 0."""
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
         optax.linear_schedule(
             cfg.lr, 0.0, max(cfg.total_steps - cfg.warmup_steps, 1))],
        [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(make_schedule(cfg), b1=cfg.beta1, b2=cfg.beta2,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accumulation_steps)
    return tx


class TrainState(NamedTuple):
    step: jnp.ndarray
    trainable: Any
    opt_state: Any


def init_train_state(cfg: TrainConfig, trainable) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                      opt_state=tx.init(trainable))


def _forward(model: LisaModel, cfg: TrainConfig, mesh, params, batch,
             rng, deterministic: bool):
    """model.apply, routed through the pipeline engine when the mesh has
    a `pipe` axis > 1 (parallel/pipeline.py — GPipe over decoder layers;
    beyond-parity: the reference's DeepSpeed config is ZeRO-2 only,
    train_ds.py:344-393)."""
    rngs = {"dropout": rng} if rng is not None else None
    pp = int(mesh.shape.get("pipe", 1)) if mesh is not None else 1
    llama = model.cfg.llama
    if getattr(llama, "moe_num_experts", 0) > 0:
        if pp > 1:
            raise NotImplementedError(
                "MoE decoder layers + pipeline parallelism are not "
                "composed: the GPipe engine stacks per-layer params and "
                "moe_every != 1 makes layer trees heterogeneous; run MoE "
                "with dp/fsdp/ep/tensor instead")
        # Fetch the Switch load-balance losses sown by nn/moe.py and add
        # them (weighted) to the objective; differentiable through apply.
        out, mut = model.apply({"params": params}, batch,
                               deterministic=deterministic, rngs=rngs,
                               mutable=("moe_aux",))
        aux = sum(jnp.mean(jnp.asarray(v))
                  for v in jax.tree_util.tree_leaves(mut.get("moe_aux", {})))
        n_moe = max(
            1, sum(1 for i in range(llama.num_layers)
                   if i % llama.moe_every == llama.moe_every - 1))
        aux = llama.moe_aux_weight * aux / n_moe
        return out._replace(loss=out.loss + aux)
    if pp > 1:
        from ..parallel.pipeline import (auto_microbatches,
                                         pipelined_lisa_forward)

        shards = int(mesh.shape.get("data", 1)) * int(
            mesh.shape.get("fsdp", 1))
        nm = getattr(cfg, "pp_microbatches", 0) or auto_microbatches(
            int(batch.input_ids.shape[0]), pp, shards)
        return pipelined_lisa_forward(
            model, params, batch, mesh=mesh, num_microbatches=nm,
            deterministic=deterministic, rngs=rngs)
    return model.apply({"params": params}, batch,
                       deterministic=deterministic, rngs=rngs)


def make_train_step(model: LisaModel, cfg: TrainConfig, mesh=None
                    ) -> Callable:
    """Returns step(state, frozen, batch, rng) -> (state, metrics).
    Jit/pjit-compatible; batch is a TrainBatch of device arrays.
    `mesh`: pass the training mesh to enable pipeline parallelism when
    it has a `pipe` axis > 1 (otherwise unused)."""
    tx = make_optimizer(cfg)

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        out = _forward(model, cfg, mesh, params, batch, rng,
                       deterministic=False)
        return out.loss, out

    def step(state: TrainState, frozen, batch: TrainBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, frozen, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = dict(
            loss=loss, ce_loss=out.ce_loss,
            mask_bce_loss=out.mask_bce_loss,
            mask_dice_loss=out.mask_dice_loss,
            taxonomy_ce_loss=out.taxonomy_ce_loss,
            grad_norm=optax.global_norm(grads))
        return TrainState(step=state.step + 1, trainable=trainable,
                          opt_state=opt_state), metrics

    return step


def make_eval_step(model: LisaModel, cfg: TrainConfig = None,
                   mesh=None) -> Callable:
    """Validation forward (no grad): returns per-sample canvas masks,
    taxonomy and losses — the train-time validate() analog
    (train_ds.py:625-758). With a `pipe` mesh axis > 1 the forward is
    pipelined like the train step."""

    def step(trainable, frozen, batch: TrainBatch):
        params = merge_params(trainable, frozen)
        return _forward(model, cfg, mesh, params, batch, rng=None,
                        deterministic=True)

    return step
