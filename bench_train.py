"""Secondary benchmark: LoRA training-step throughput (BASELINE config 4
analog — the train_ds.py replacement path).

Full jitted train step: LoRA/freeze split, taxonomy-gated losses, AdamW
update, remat. Reports samples/sec/chip plus XLA-cost-model TFLOP/s and
MFU vs the chip's measured matmul peak (haff_tpu/utils/flops.py).

Presets:
  --preset 1b               bf16 full stack (fits trivially)
  --preset 7b --load_in_8bit    flagship QLoRA: frozen base int8
                                IN-TREE (W8A8 fwd + straight-through
                                bwd), float trainable partition — the
                                reference trains 13B+LoRA via
                                bitsandbytes (train_ds.py:57-58,
                                temp_log.txt:24)
  --preset 13b --load_in_4bit   13B QLoRA with a packed-int4 base

For the quantized presets the float model is NEVER materialized: the
frozen partition is generated directly in serving precision from a
jax.eval_shape tree (nn/quant.random_quantized_like), exact for
throughput measurement (same shapes/dtypes/HBM layout as a converted
checkpoint).
"""

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(batch=4, seq=320, preset="1b", load_in_8bit=False,
          load_in_4bit=False):
    from haff_tpu.core.config import (
        IGNORE_INDEX,
        IMAGE_TOKEN_INDEX,
        ModelConfig,
        TrainConfig,
    )
    from haff_tpu.model.lisa import LisaModel, TrainBatch
    from haff_tpu.train.trainer import (
        init_train_state,
        make_train_step,
        partition_params,
    )
    import flax.linen as nn

    base = ModelConfig.preset(preset)
    cfg = base.replace(
        llama=dataclasses.replace(base.llama, lora_rank=8))
    tcfg = TrainConfig(model=cfg, lr=3e-4, warmup_steps=10,
                       total_steps=1000, grad_accumulation_steps=1)
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16, remat=True)

    rng = np.random.RandomState(0)
    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    ids = rng.randint(5, min(30000, cfg.llama.vocab_size - 10),
                      (batch, seq)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    ids[:, min(40, seq - 2)] = cfg.seg_token_idx
    labels = ids.copy()
    labels[:, :20] = IGNORE_INDEX
    tb = TrainBatch(
        images_sam=jnp.asarray(rng.randn(batch, S, S, 3).astype(np.float32)),
        images_clip=jnp.asarray(rng.randn(batch, C, C, 3).astype(np.float32)),
        image_index=jnp.arange(batch, dtype=jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(labels),
        attention_mask=jnp.ones((batch, seq), jnp.int32),
        masks_left=jnp.asarray((rng.rand(batch, S, S) > 0.9)
                               .astype(np.float32)),
        masks_right=jnp.asarray((rng.rand(batch, S, S) > 0.9)
                                .astype(np.float32)),
        taxonomies=jnp.asarray(np.tile([[0, 0, 1, 0]], (batch, 1))
                               .astype(np.float32)),
        valid_region=jnp.ones((batch, S, S)),
        sample_weight=jnp.ones((batch,)))

    if load_in_8bit or load_in_4bit:
        # QLoRA: partition the eval_shape tree, materialize the frozen
        # side quantized in-tree and the trainable side in float — the
        # float base never exists on chip (7B bf16 + moments would bust
        # 16 GB).
        from haff_tpu.nn.quant import (default_llm_predicate,
                                       random_quantized_like)

        shapes = nn.unbox(jax.eval_shape(
            model.init, jax.random.PRNGKey(0), tb)["params"])
        t_shapes, f_shapes = partition_params(shapes)
        trainable = random_quantized_like(
            t_shapes, lambda k: False, big_bf16=1 << 62)
        frozen = random_quantized_like(
            f_shapes, default_llm_predicate,
            bits=4 if load_in_4bit else 8)
    else:
        params = nn.unbox(
            jax.jit(model.init)(jax.random.PRNGKey(0), tb)["params"])
        trainable, frozen = partition_params(params)
    state = init_train_state(tcfg, trainable)
    # Donate the TrainState: the updated params + Adam moments alias the
    # old buffers instead of coexisting with them. Measured on the AOT
    # executable (XLA memory_analysis, r5): 13B int4 batch 1 peaks at
    # 18.51 GB undonated (args 12.58 + out 4.16 + temps 1.78, alias 0)
    # vs 16 GB HBM — donation removes the 4.16 GB output copy, which is
    # exactly the difference between 13B QLoRA fitting this chip or not.
    step = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))
    meta = dict(decoder=preset, batch=batch,
                load_in_8bit=load_in_8bit, load_in_4bit=load_in_4bit)
    # AOT compile so XLA's cost analysis shares the one compile.
    from haff_tpu.utils.flops import aot_with_flops

    key = jax.random.PRNGKey(0)
    call, meta["flops_per_call"] = aot_with_flops(
        step, state, frozen, tb, key)
    return call, state, frozen, tb, key, meta


def main(batch=4, seq=320, preset="1b", steps=5, load_in_8bit=False,
         load_in_4bit=False, loss_curve=0):
    # batch 4 measured best for 1b (11.17 vs 11.00 samples/s at 8, r3)
    step, state, frozen, tb, key, meta = build(batch, seq, preset,
                                               load_in_8bit, load_in_4bit)
    state, m = step(state, frozen, tb, key)
    _ = float(np.asarray(m["loss"]))  # compile + sync
    if loss_curve:
        # Optimization proof at this scale (VERDICT r5 item 1): repeat
        # steps on the one batch and record the loss series — a
        # monotone-ish decrease demonstrates the QLoRA gradient path
        # (int8 straight-through vjp into LoRA/decoder params) actually
        # optimizes at flagship size, not just runs.
        curve = [round(float(np.asarray(m["loss"])), 4)]
        for i in range(loss_curve - 1):
            state, m = step(state, frozen, tb, key)
            curve.append(round(float(np.asarray(m["loss"])), 4))
        print(json.dumps(dict(metric="lora_train_loss_curve",
                              preset=preset, batch=batch,
                              steps=len(curve), first=curve[0],
                              last=curve[-1], curve=curve)))
    state, m = step(state, frozen, tb, key)
    _ = float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, frozen, tb, key)
    loss = float(np.asarray(m["loss"]))  # host sync
    dt = time.perf_counter() - t0
    from haff_tpu.utils.flops import mfu_fields

    meta.update(mfu_fields(meta.pop("flops_per_call", None), steps / dt))
    print(json.dumps(dict(metric="lora_train_samples_per_sec_chip",
                          value=round(batch * steps / dt, 3),
                          unit="samples/s", loss=round(loss, 4), **meta)))
    # Persist as a bench-cache leg so the driver's end-of-round bench.py
    # line carries the training-throughput row (VERDICT r5 item 1: the
    # BENCH artifact, not just ROUND_NOTES, should hold the number).
    try:
        from haff_tpu.utils.bench_cache import store

        mode = ("int4" if load_in_4bit else
                "int8" if load_in_8bit else "bf16")
        store("train", dict(
            train_samples_per_sec=round(batch * steps / dt, 3),
            train_preset=f"{preset}-qlora-{mode}", train_batch=batch,
            train_mfu_pct=meta.get("mfu_pct")))
    except Exception:
        pass


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="1b")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=320)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--load_in_8bit", action="store_true")
    ap.add_argument("--load_in_4bit", action="store_true")
    ap.add_argument("--loss_curve", type=int, default=0,
                    help="record an N-step loss series (same batch) "
                         "before the throughput measurement")
    a = ap.parse_args()
    main(a.batch, a.seq, a.preset, a.steps, a.load_in_8bit,
         a.load_in_4bit, a.loss_curve)
