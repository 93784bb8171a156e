"""Pipeline parallelism — GPipe schedule over a `pipe` mesh axis.

Beyond-parity capability: the reference's DeepSpeed config is ZeRO-2
data parallelism only (reference: 2Haff/train_ds.py:344-393 — no
pipeline engine is configured), so decoder-layer memory per GPU is the
full model. A TPU-native framework scales depth across chips: decoder
layers are stage-stacked, each stage lives on one slice of the `pipe`
mesh axis, and microbatches stream through the ring.

TPU-first design:

  * the schedule is a `lax.scan` over `num_microbatches + stages - 1`
    ticks inside ONE `jax.shard_map` that is manual over `pipe` only —
    every other mesh axis (data/fsdp/sp/tensor) stays auto, so GSPMD
    batch/tensor sharding composes unchanged inside each stage,
  * stage hand-offs are `lax.ppermute` neighbor transfers (point-to-
    point, ride the slowest links — the `pipe` axis sits right after
    `data` in the device order, see core/mesh.py),
  * each stage applies its layers with a `lax.scan` over the local
    (layers_per_stage, ...) parameter slice — Pallas kernels inside the
    block (flash attention) run stage-local, exactly one program per
    device, no vmap over stages,
  * warm-up/drain bubbles compute on zero-filled activations; injection
    (`stage == 0`) and collection (`stage == S-1`) masks keep both the
    forward values and the backward cotangents exact — autodiff through
    the scan + ppermute reproduces the sequential gradients to float
    tolerance (ppermute's transpose is the reverse permutation),
  * parameters stay in the canonical per-layer checkpoint layout
    (`layers_0..layers_{n-1}`); `stack_layer_params` stacks them inside
    jit so gradients land back on the per-layer tree automatically. The
    bubble fraction is the GPipe (S-1)/(T) — pick
    `num_microbatches >= 2*stages` to keep it under a third.

Composition limits: `pipe` cannot be combined with ring-attention
sequence parallelism (`LlamaConfig.sequence_parallel`) — both want to
be the manual axis around the attention kernel; the trainer rejects the
combination.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import PIPE_AXIS


def stack_layer_params(model_params: dict, num_layers: int,
                       prefix: str = "layers_") -> Any:
    """`{"layers_0": tree, ..., "layers_{n-1}": tree}` -> one tree with
    every leaf stacked on a new leading (num_layers,) dim. All layers
    must share a tree structure (true for the homogeneous decoder
    stacks; LoRA ranks are per-config, not per-layer). `prefix` selects
    the per-layer naming scheme ("layers_" llama, "blocks_" MPT)."""
    layers = [model_params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, num_layers: int,
                         prefix: str = "layers_") -> dict:
    """Inverse of stack_layer_params (host-side: checkpoint conversion)."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(num_layers)
    }


def auto_microbatches(batch: int, stages: int, shards: int = 1) -> int:
    """Largest divisor of `batch` at most 2*stages — keeps the GPipe
    bubble (stages-1)/(nm+stages-1) around a third or better when the
    batch allows, degrading gracefully for small batches. `shards` is
    the data*fsdp batch-shard count: microbatch sizes that still divide
    it are preferred, so every tick keeps the data axis fully busy."""
    target = min(batch, 2 * stages)
    fallback = 1
    for nm in range(target, 0, -1):
        if batch % nm:
            continue
        if (batch // nm) % shards == 0:
            return nm
        if fallback == 1:
            fallback = nm  # largest plain divisor, if none fits shards
    return fallback


def pipeline_blocks(
    block_fn: Callable,
    stacked_params: Any,
    carried: Sequence[jnp.ndarray],
    *,
    mesh: Mesh,
    num_microbatches: int,
    rng: Optional[jax.Array] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Run a stack of identical blocks as a GPipe pipeline.

    block_fn(layer_params, x, *extras, rng=None) -> new x. `carried` is
    `(x, *extras)`: every element has a leading batch dim that is split
    into `num_microbatches`; only `x` is transformed, the extras
    (positions, segment ids, ...) travel with their microbatch around
    the ring. Returns the transformed x, batch-ordered.

    Must be called under `mesh` (with-context or jit sharding); the
    mesh's `pipe` axis size is the stage count.
    """
    stages = int(mesh.shape[PIPE_AXIS])
    leaves = jax.tree_util.tree_leaves(stacked_params)
    num_layers = int(leaves[0].shape[0])
    if num_layers % stages != 0:
        raise ValueError(
            f"num_layers {num_layers} not divisible by pipe={stages}")
    lps = num_layers // stages
    batch = int(carried[0].shape[0])
    if batch % num_microbatches != 0:
        raise ValueError(
            f"batch {batch} not divisible by "
            f"num_microbatches={num_microbatches}")
    mb = batch // num_microbatches
    nm = num_microbatches

    staged = jax.tree_util.tree_map(
        lambda w: w.reshape((stages, lps) + w.shape[1:]), stacked_params)

    if rng is None:
        rng = jax.random.PRNGKey(0)  # unused unless block_fn draws

    # The shard_map boundary runs in f32 when the payload is bf16:
    # XLA's CPU-only AllReducePromotion pass aborts ("Invalid binary
    # instruction opcode copy", hlo_instruction.cc:1585) cloning the
    # bf16 all-reduces SPMD inserts to reshard sharded cotangents into
    # the partial-manual region during the backward. Casting at the
    # boundary keeps those collectives f32; on TPU the pass never runs
    # and the casts fuse into the neighboring elementwise ops. Payload
    # compute inside the stages stays in the original dtype.
    carry_dtypes = None

    def local(staged, rng, *carried):
        # staged leaves: (1, lps, ...) local slice; carried: global view
        # over the auto axes, replicated over pipe.
        carried = tuple(c.astype(d) for c, d in zip(carried, carry_dtypes))
        local_params = jax.tree_util.tree_map(lambda w: w[0], staged)
        stage = lax.axis_index(PIPE_AXIS)
        micro = tuple(
            c.reshape((nm, mb) + c.shape[1:]) for c in carried)

        layer_ids = jnp.arange(lps)

        def stage_fn(state, t):
            x, extras = state[0], state[1:]
            key = jax.random.fold_in(jax.random.fold_in(rng, stage), t)

            def body(carry, layer):
                p, li = layer
                fn = block_fn
                if remat:
                    fn = jax.checkpoint(
                        block_fn,
                        policy=jax.checkpoint_policies.nothing_saveable)
                return fn(p, carry, *extras,
                          rng=jax.random.fold_in(key, li)), None

            x, _ = lax.scan(body, x, (local_params, layer_ids))
            return (x,) + extras

        T = nm + stages - 1
        state = tuple(
            jnp.zeros((mb,) + c.shape[1:], c.dtype) for c in carried)
        outputs = jnp.zeros((nm, mb) + carried[0].shape[1:],
                            carried[0].dtype)

        def step(carry, t):
            state, outputs = carry
            idx = jnp.minimum(t, nm - 1)
            first = (stage == 0) & (t < nm)
            state = tuple(
                jnp.where(first,
                          lax.dynamic_index_in_dim(m, idx, 0, False), s)
                for m, s in zip(micro, state))
            state = stage_fn(state, t)
            out_idx = t - (stages - 1)
            valid = (stage == stages - 1) & (out_idx >= 0)
            oi = jnp.maximum(out_idx, 0)
            cur = lax.dynamic_index_in_dim(outputs, oi, 0, False)
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, state[0], cur), oi, 0)
            perm = [(i, (i + 1) % stages) for i in range(stages)]
            state = tuple(lax.ppermute(s, PIPE_AXIS, perm) for s in state)
            return (state, outputs), None

        (_, outputs), _ = lax.scan(step, (state, outputs), jnp.arange(T))
        # Results accumulate on the last stage only; broadcast them.
        # The psum + the returned boundary value run in f32 (see the
        # boundary-dtype note above local()).
        outputs = lax.psum(
            jnp.where(stage == stages - 1, outputs.astype(jnp.float32),
                      jnp.zeros((), jnp.float32)), PIPE_AXIS)
        return outputs.reshape((batch,) + carried[0].shape[1:])

    carry_dtypes = tuple(c.dtype for c in carried)
    boundary = tuple(
        c.astype(jnp.float32) if c.dtype == jnp.bfloat16 else c
        for c in carried)
    spec_params = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), staged)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_params, P()) + tuple(P() for _ in carried),
        out_specs=P(),
        axis_names=frozenset({PIPE_AXIS}),
        check_vma=False)
    return fn(staged, rng, *boundary).astype(carry_dtypes[0])


# ---------------------------------------------------------------------------
# LLaMA / LISA composition
# ---------------------------------------------------------------------------


def pipelined_llm_forward(
    cfg,
    params: dict,
    inputs_embeds: jnp.ndarray,
    positions: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    num_microbatches: int,
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LlamaForCausalLM.__call__ semantics (logits, hidden) with the
    decoder blocks run as a pipeline. `params` is the LlamaForCausalLM
    subtree (embed_tokens/model/lm_head); no KV-cache path — pipelining
    targets training/prefill throughput, decode stays single-program.
    """
    from ..nn.llama import EMBED, VOCAB, LlamaBlock, RMSNorm, _dense

    if cfg.sequence_parallel:
        raise ValueError(
            "pipeline parallelism cannot be combined with "
            "sequence_parallel ring attention (both are manual around "
            "the attention kernel); use pp x tp x dp instead")

    block = LlamaBlock(cfg=cfg, dtype=dtype, param_dtype=param_dtype,
                       deterministic=bool(deterministic))
    needs_rng = (not deterministic) and cfg.lora_dropout > 0.0

    def block_fn(p, x, positions, segment_ids, rng=None):
        rngs = {"dropout": rng} if needs_rng else None
        y, _ = block.apply({"params": p}, x, positions, segment_ids,
                           rngs=rngs)
        return y

    if segment_ids is None:
        segment_ids = jnp.ones(positions.shape, jnp.int32)
    stacked = stack_layer_params(params["model"], cfg.num_layers)
    x = pipeline_blocks(
        block_fn, stacked,
        (inputs_embeds.astype(dtype), positions, segment_ids),
        mesh=mesh, num_microbatches=num_microbatches, rng=rng,
        remat=remat)

    norm = RMSNorm(eps=cfg.rms_norm_eps, param_dtype=param_dtype)
    hidden = norm.apply({"params": params["model"]["norm"]}, x)
    head = _dense(cfg.vocab_size, "lm_head", (EMBED, VOCAB), dtype,
                  param_dtype)
    logits = head.apply({"params": params["lm_head"]}, hidden)
    return logits, hidden


def pipelined_mpt_forward(
    cfg,
    params: dict,
    inputs_embeds: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    *,
    mesh: Mesh,
    num_microbatches: int,
    dtype=jnp.float32,
    param_dtype=jnp.float32,
    remat: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MptForCausalLM.__call__ semantics (logits, hidden) with the
    blocks pipelined. ALiBi needs no positions; prefix-LM masking is a
    non-LISA path and stays single-program. `params` is the
    MptForCausalLM subtree (wte/blocks_i/norm_f)."""
    import flax.linen as nn

    from ..nn.mpt import MptBlock

    block = MptBlock(cfg=cfg, dtype=dtype, param_dtype=param_dtype)

    def block_fn(p, x, segment_ids, rng=None):
        y, _ = block.apply({"params": p}, x, segment_ids)
        return y

    if segment_ids is None:
        segment_ids = jnp.ones(inputs_embeds.shape[:2], jnp.int32)
    stacked = stack_layer_params(params, cfg.n_layers, prefix="blocks_")
    x = pipeline_blocks(
        block_fn, stacked, (inputs_embeds.astype(dtype), segment_ids),
        mesh=mesh, num_microbatches=num_microbatches, remat=remat)

    norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps, use_bias=False,
                        dtype=jnp.float32, param_dtype=param_dtype)
    hidden = norm.apply({"params": params["norm_f"]}, x).astype(dtype)
    embed = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dtype,
                     param_dtype=param_dtype)
    logits = embed.apply({"params": params["wte"]}, hidden,
                         method="attend")  # tied head
    return logits, hidden


def pipelined_lisa_forward(
    model,
    params: dict,
    batch,
    *,
    mesh: Mesh,
    num_microbatches: int,
    deterministic: bool = True,
    rngs: Optional[dict] = None,
):
    """LisaModel.__call__ with the decoder pipelined (model/lisa.py
    splice_inputs -> pipelined blocks -> finish_outputs). `params` is
    the unboxed LisaModel param dict; returns LisaOutputs. Both decoder
    families route through the engine (llama / MPT)."""
    sam_emb, sp = model.apply(
        {"params": params}, batch, method="splice_inputs", rngs=rngs)
    rng = rngs.get("dropout") if rngs else None
    if model.cfg.decoder == "mpt":
        from ..nn.mpt import MptConfig

        mpt_cfg = MptConfig(
            vocab_size=model.cfg.llama.vocab_size,
            d_model=model.cfg.llama.hidden_size,
            n_heads=model.cfg.llama.num_heads,
            n_layers=model.cfg.llama.num_layers,
            max_seq_len=model.cfg.llama.max_seq_len)
        logits, hidden = pipelined_mpt_forward(
            mpt_cfg, params["llm"], sp.embeds, sp.segment_ids,
            mesh=mesh, num_microbatches=num_microbatches,
            dtype=model.dtype, param_dtype=model.param_dtype,
            remat=model.remat)
    else:
        logits, hidden = pipelined_llm_forward(
            model.cfg.llama, params["llm"], sp.embeds, sp.positions,
            sp.segment_ids, mesh=mesh, num_microbatches=num_microbatches,
            dtype=model.dtype, param_dtype=model.param_dtype,
            deterministic=deterministic, rng=rng, remat=model.remat)
    return model.apply(
        {"params": params}, batch, sam_emb, sp, logits, hidden,
        method="finish_outputs", rngs=rngs)
