"""Secondary benchmark: LoRA training-step throughput (BASELINE config 4
analog — the train_ds.py replacement path).

Full jitted train step on the 1B-decoder preset with SAM ViT-H + CLIP-L:
LoRA/freeze split, taxonomy-gated losses, AdamW update. Reports
samples/sec/chip. Prints one JSON line.
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=4, seq=320, preset="1b", steps=5):  # batch 4 measured best (8.9 vs 8.2 samples/s at 2)
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
    ids = rng.randint(5, 30000, (batch, seq)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    ids[:, 40] = cfg.seg_token_idx
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

    params = nn.unbox(
        jax.jit(model.init)(jax.random.PRNGKey(0), tb)["params"])
    trainable, frozen = partition_params(params)
    state = init_train_state(tcfg, trainable)
    step = jax.jit(make_train_step(model, tcfg))
    key = jax.random.PRNGKey(0)

    state, m = step(state, frozen, tb, key)
    _ = float(np.asarray(m["loss"]))  # compile + sync
    state, m = step(state, frozen, tb, key)
    _ = float(np.asarray(m["loss"]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, frozen, tb, key)
    loss = float(np.asarray(m["loss"]))  # host sync
    dt = time.perf_counter() - t0
    print(json.dumps(dict(metric="lora_train_samples_per_sec_chip",
                          value=round(batch * steps / dt, 3),
                          unit="samples/s", decoder=preset, batch=batch,
                          loss=round(loss, 4))))


if __name__ == "__main__":
    main()
