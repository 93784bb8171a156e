"""e2e stage split: where does the full evaluate() spend its time?

VERDICT r4 item 8: the 7B evaluate() is the throughput bottleneck
(mask path alone runs ~3x faster), so the batch-8 split across CLIP,
prefill+decode, SAM encode and mask decode must be published before
optimizing. Each stage is timed as its OWN jit with scalar-readback
sync (axon tunnel rule), on the same int8 serving params as bench_e2e;
the deltas vs the one-jit evaluate() expose scheduling overhead.

Usage: python tools/bench_e2e_split.py [--preset 7b] [--batch 8]
       [--prompt_len 256] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, args, iters, label, results):
    out = fn(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s += float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / iters * 1000
    results[label] = round(dt, 1)
    print(f"# {label}: {dt:.1f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--max_new", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bf16", action="store_true")
    a = ap.parse_args()

    from haff_tpu.core.config import IMAGE_TOKEN_INDEX, ModelConfig
    from haff_tpu.model.lisa import LisaModel, TrainBatch
    from haff_tpu.model.multimodal import (find_image_position,
                                           splice_image_embeddings)

    cfg = ModelConfig.preset(a.preset)
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    B = a.batch
    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    ids = rng.randint(5, min(30000, cfg.llama.vocab_size - 10),
                      (B, a.prompt_len)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    attn = np.ones((B, a.prompt_len), np.int32)
    images_sam = jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32))
    images_clip = jnp.asarray(rng.randn(B, C, C, 3).astype(np.float32))

    batch0 = TrainBatch(
        images_sam=images_sam, images_clip=images_clip,
        image_index=jnp.arange(B, dtype=jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attention_mask=jnp.asarray(attn),
        masks_left=jnp.zeros((B, S, S)), masks_right=jnp.zeros((B, S, S)),
        taxonomies=jnp.zeros((B, 4)), valid_region=jnp.ones((B, S, S)),
        sample_weight=jnp.ones((B,)))
    if a.bf16:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
    else:
        from haff_tpu.nn.quant import (lisa_serving_predicate,
                                       random_quantized_like)

        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch0)
        params = random_quantized_like(shapes, lisa_serving_predicate)

    results = {}

    @jax.jit
    def clip_splice(params, images_clip, input_ids, attention_mask):
        clip_emb = model.apply(params, images_clip, method="encode_clip")
        tok = model.apply(params, input_ids, method="embed_tokens")
        img_pos = find_image_position(input_ids)
        sp = splice_image_embeddings(
            tok, clip_emb, img_pos, input_ids, None, attention_mask,
            seg_token_idx=cfg.seg_token_idx)
        return sp.embeds, sp.positions, sp.segment_ids

    embeds, positions, segids = timeit(
        clip_splice, (params, images_clip, jnp.asarray(ids),
                      jnp.asarray(attn)), a.iters, "clip+splice", results)

    @jax.jit
    def prefill(params, embeds, positions, segids):
        logits, hidden, _ = model.apply(
            params, embeds, positions, segids, method="llm_forward")
        return logits[:, -1], hidden[:, -1]

    timeit(prefill, (params, embeds, positions, segids), a.iters,
           "prefill_only", results)

    from haff_tpu.infer.evaluate import make_jitted_evaluate

    ev = make_jitted_evaluate(model, max_new_tokens=a.max_new, eos_id=2,
                              kv_cache_8bit=not a.bf16)

    @jax.jit
    def sam_encode(params, images_sam):
        return model.apply(params, images_sam, method="encode_sam")

    sam_emb = timeit(sam_encode, (params, images_sam), a.iters,
                     "sam_encode", results)

    @jax.jit
    def mask_decode(params, sam_emb):
        seg = jnp.zeros((B, 1, cfg.sam_decoder.prompt_embed_dim),
                        jnp.float32)
        out = model.apply(params, sam_emb, seg, method="decode_masks")
        return out[0]

    timeit(mask_decode, (params, sam_emb), a.iters, "mask_decode",
           results)

    def full(params, *args):
        r = ev(params, *args)
        return (r.taxonomies,)

    timeit(full, (params, images_sam, images_clip, jnp.asarray(ids),
                  jnp.asarray(attn)), a.iters, "full_evaluate", results)

    accounted = (results["clip+splice"] + results["prefill_only"]
                 + results["sam_encode"] + results["mask_decode"])
    results["decode_loop_plus_overhead"] = round(
        results["full_evaluate"] - accounted, 1)
    results.update(batch=B, prompt_len=a.prompt_len, preset=a.preset,
                   int8=not a.bf16,
                   fps=round(B / (results["full_evaluate"] / 1000), 2))
    print(json.dumps(dict(metric="e2e_stage_split_ms", **results)))


if __name__ == "__main__":
    main()
