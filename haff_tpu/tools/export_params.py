"""Export a train-state checkpoint to standalone serving params.

A train checkpoint holds only the TRAINABLE partition (LoRA adapters,
heads, mask decoders — train/trainer.py partition_params); serving needs
the full tree. This tool rebuilds the run's deterministic init (same
preset + seed), restores the checkpoint, folds LoRA into the base
kernels (tools/merge_lora.py math) and saves one flat .npz — the bridge
from `train/cli.py` runs to the serving CLIs / accuracy tests.

Role analog of reference merge_lora_weights_and_save_hf_model.py for
from-scratch runs where the frozen base came from init (no --base_params
dir exists).

Usage:
  python -m haff_tpu.tools.export_params --ckpt_dir runs/x/ckpt_model \\
      --model_preset small [--train_vision_encoder] [--lora_r 8] \\
      [--seed 42] --out artifacts/x_params.npz [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_params(ckpt_dir: str, model_preset: str, out: str,
                  lora_r: int = 8, lora_alpha: float = 16.0,
                  seed: int = 42, train_vision_encoder: bool = False,
                  train_mask_decoder: bool = True,
                  dtype: str = "bfloat16", lr: float = 1e-3,
                  grad_accum: int = 1):
    import dataclasses

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from ..core.config import ModelConfig, TrainConfig
    from ..data.tokenizer import load_tokenizer, seg_token_idx
    from ..model.lisa import LisaModel, TrainBatch
    from ..train.checkpoints import restore_checkpoint
    from ..train.trainer import (init_train_state, merge_params,
                                 partition_params)
    from .merge_lora import merge_lora_params

    tok = load_tokenizer(None)
    base = ModelConfig.preset(model_preset)
    cfg = base.replace(
        seg_token_idx=seg_token_idx(tok),
        llama=dataclasses.replace(
            base.llama, lora_rank=lora_r, lora_alpha=lora_alpha,
            vocab_size=max(base.llama.vocab_size, len(tok) + 4)))
    model = LisaModel(cfg=cfg, dtype=jnp.bfloat16, remat=True)

    B = 1
    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    probe = TrainBatch(
        images_sam=jnp.zeros((B, S, S, 3)),
        images_clip=jnp.zeros((B, C, C, 3)),
        image_index=jnp.zeros((B,), jnp.int32),
        input_ids=jnp.ones((B, 16), jnp.int32),
        labels=jnp.ones((B, 16), jnp.int32),
        attention_mask=jnp.ones((B, 16), jnp.int32),
        masks_left=jnp.zeros((B, S, S)), masks_right=jnp.zeros((B, S, S)),
        taxonomies=jnp.zeros((B, 4)), valid_region=jnp.ones((B, S, S)),
        sample_weight=jnp.ones((B,)))
    params = nn.unbox(
        jax.jit(model.init)(jax.random.PRNGKey(seed), probe)["params"])
    exclude = () if train_mask_decoder else (
        "mask_decoder_left", "mask_decoder_right")
    extra = ("image_encoder",) if train_vision_encoder else ()
    trainable, frozen = partition_params(params, exclude, extra)
    state = init_train_state(
        TrainConfig(model=cfg, lr=lr,
                    grad_accumulation_steps=grad_accum), trainable)
    state, step = restore_checkpoint(ckpt_dir, state)
    if step is None:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    merged = merge_params(jax.device_get(state.trainable), frozen)
    merged = merge_lora_params(merged, alpha=lora_alpha)

    import ml_dtypes

    flat = {}
    for k, v in traverse_util.flatten_dict(merged).items():
        arr = np.asarray(jax.device_get(v))
        if np.issubdtype(arr.dtype, np.floating) and dtype == "bfloat16":
            # npz cannot hold bf16 natively: store the bf16 BIT PATTERN
            # as uint16 with a ::bf16 key marker (float16 would halve
            # the exponent RANGE — values past 65504 silently overflow
            # to inf; bf16 keeps float32's range).
            flat["/".join(k) + "::bf16"] = arr.astype(
                ml_dtypes.bfloat16).view(np.uint16)
        elif np.issubdtype(arr.dtype, np.floating):
            flat["/".join(k)] = arr.astype(np.float32)
        else:
            flat["/".join(k)] = arr
    os.makedirs(os.path.dirname(os.path.abspath(out)) or ".",
                exist_ok=True)
    np.savez_compressed(out, **flat)
    print(f"exported step {step}: {len(flat)} arrays -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")
    return out


def load_exported_params(path: str):
    """Flat .npz -> nested params dict (bf16 bit patterns promoted to
    float32; legacy float16 exports also promoted)."""
    import ml_dtypes
    from flax import traverse_util

    z = np.load(path)
    flat = {}
    for k in z.files:
        arr = z[k]
        if k.endswith("::bf16"):
            k = k[: -len("::bf16")]
            arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
        elif arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        flat[tuple(k.split("/"))] = arr
    return traverse_util.unflatten_dict(flat)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--model_preset", default="small")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train_vision_encoder", action="store_true")
    p.add_argument("--no_train_mask_decoder", dest="train_mask_decoder",
                   action="store_false", default=True)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="must match the training run (opt-state tree "
                        "structure)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    export_params(args.ckpt_dir, args.model_preset, args.out,
                  lora_r=args.lora_r, lora_alpha=args.lora_alpha,
                  seed=args.seed,
                  train_vision_encoder=args.train_vision_encoder,
                  train_mask_decoder=args.train_mask_decoder,
                  dtype=args.dtype, grad_accum=args.grad_accum)


if __name__ == "__main__":
    main()
