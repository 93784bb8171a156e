"""Secondary benchmark: FULL single-frame affordance inference
(CLIP ViT-L encode -> LLaMA prefill + greedy decode -> [SEG] -> SAM ViT-H
-> dual mask decode -> canvas), frames/sec/chip.

The driver's headline (bench.py) isolates the mask path; this script
measures the whole evaluate() pipeline. The decoder is the 1B preset —
a 7B decoder plus SAM-H and CLIP-L exceeds a single v5e's 16 GB HBM in
bf16 with KV caches (the reference's 7B/13B configs target v5p in
BASELINE.json). Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=8, prompt_len=320, max_new=16, preset="1b"):  # batch 8 measured best (9.6 vs 8.9 fps at 4)
    from haff_tpu.core.config import IMAGE_TOKEN_INDEX, ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel, TrainBatch

    cfg = ModelConfig.preset(preset)
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    ids = rng.randint(5, 30000, (batch, prompt_len)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    attn = np.ones((batch, prompt_len), np.int32)
    images_sam = jnp.asarray(rng.randn(batch, S, S, 3).astype(np.float32))
    images_clip = jnp.asarray(rng.randn(batch, C, C, 3).astype(np.float32))

    batch0 = TrainBatch(
        images_sam=images_sam, images_clip=images_clip,
        image_index=jnp.arange(batch, dtype=jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attention_mask=jnp.asarray(attn),
        masks_left=jnp.zeros((batch, S, S)),
        masks_right=jnp.zeros((batch, S, S)),
        taxonomies=jnp.zeros((batch, 4)),
        valid_region=jnp.ones((batch, S, S)),
        sample_weight=jnp.ones((batch,)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
    ev = make_jitted_evaluate(model, max_new_tokens=max_new, eos_id=2)

    def run():
        res = ev(params, images_sam, images_clip, jnp.asarray(ids),
                 jnp.asarray(attn))
        return float(np.asarray(res.taxonomies).sum())  # host sync

    run()  # compile
    run()  # warm
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(json.dumps(dict(metric="e2e_affordance_frames_per_sec_chip",
                          value=round(fps, 3), unit="frames/s",
                          decoder=preset, batch=batch,
                          max_new_tokens=max_new)))
    return fps


def latency(prompt_len=320, max_new=16, preset="1b", iters=12):
    """Single-frame p50 latency (BASELINE north-star 'p50 ms/frame'):
    batch 1 through the full evaluate, per-call host-synced timings."""
    import contextlib
    import io

    # Build a batch-1 pipeline by reusing main()'s setup path.
    from haff_tpu.core.config import IMAGE_TOKEN_INDEX, ModelConfig
    from haff_tpu.infer.evaluate import make_jitted_evaluate
    from haff_tpu.model.lisa import LisaModel, TrainBatch

    cfg = ModelConfig.preset(preset)
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    ids = rng.randint(5, 30000, (1, prompt_len)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    attn = np.ones((1, prompt_len), np.int32)
    images_sam = jnp.asarray(rng.randn(1, S, S, 3).astype(np.float32))
    images_clip = jnp.asarray(rng.randn(1, C, C, 3).astype(np.float32))
    batch0 = TrainBatch(
        images_sam=images_sam, images_clip=images_clip,
        image_index=jnp.zeros((1,), jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attention_mask=jnp.asarray(attn),
        masks_left=jnp.zeros((1, S, S)), masks_right=jnp.zeros((1, S, S)),
        taxonomies=jnp.zeros((1, 4)), valid_region=jnp.ones((1, S, S)),
        sample_weight=jnp.ones((1,)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
    ev = make_jitted_evaluate(model, max_new_tokens=max_new, eos_id=2)

    def run():
        res = ev(params, images_sam, images_clip, jnp.asarray(ids),
                 jnp.asarray(attn))
        return float(np.asarray(res.taxonomies).sum())  # host sync

    run()
    run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(times, 50))
    print(json.dumps(dict(metric="e2e_p50_ms_per_frame",
                          value=round(p50, 2), unit="ms",
                          decoder=preset, batch=1,
                          max_new_tokens=max_new)))
    return p50


if __name__ == "__main__":
    import sys

    if "--latency" in sys.argv:
        latency()
    else:
        main()
