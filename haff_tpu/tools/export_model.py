"""Serialized model-export tool — the TPU-native analog of the
reference's ONNX export wrapper (reference:
segment_anything/utils/onnx.py:17-157, SamOnnxModel).

Where the reference wraps the SAM decoder in a torch module with a fixed
input signature for onnx.export, here components are exported as
self-contained `jax.export` artifacts: StableHLO with the weights
captured as constants, loadable from any JAX process (CPU/TPU) without
the haff_tpu model code — the portable-deployment role ONNX plays on the
GPU stack.

Components:
  * decoder — (image_embeddings, text_embed) -> (masks_left, masks_right,
    iou_left, iou_right, taxonomy); mirrors SamOnnxModel's decoder-only
    signature (the text prompt replaces point/box prompts, which is the
    path 2Haff actually uses, reference LISA.py:284-325).
  * encoder — (preprocessed 1024x1024 images) -> image embeddings.
  * mask_path — images + text_embed -> canvas-resolution dual masks +
    taxonomy (encoder ⊕ decoder ⊕ postprocess in one artifact).

Usage:
  python -m haff_tpu.tools.export_model --component decoder \
      --out decoder.stablehlo [--model_preset 7b] [--checkpoint DIR]
      [--batch 1] [--precision bf16]

Load with `load_exported(path)` (returns a callable) or directly via
`jax.export.deserialize(open(path,'rb').read()).call(...)`.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional


def _build(model_preset: str, checkpoint: Optional[str], precision: str):
    import jax
    import jax.numpy as jnp

    from ..core.config import ModelConfig
    from ..nn.sam import Sam

    cfg = ModelConfig.preset(model_preset)
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    model = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder,
                dtype=dtype)
    S = cfg.sam_encoder.image_size
    E = cfg.sam_decoder.prompt_embed_dim
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    text = jnp.zeros((1, 1, E), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, text)
    if checkpoint:
        # Converted full-LISA params dir (tools/convert_cli output);
        # the SAM stack lives under visual_model there. Restore against
        # an abstract LisaModel tree (no materialized init) and graft
        # the visual_model subtree, whose layout matches Sam exactly.
        import numpy as np
        from flax.core import meta as flax_meta

        from ..core.config import IMAGE_TOKEN_INDEX
        from ..model.lisa import LisaModel, TrainBatch
        from ..train.checkpoints import restore_params

        lisa = LisaModel(cfg=cfg, dtype=dtype)
        C = cfg.clip.image_size
        ids = np.full((1, 16), 5, np.int32)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        tb = TrainBatch(
            images_sam=jnp.zeros((1, S, S, 3)),
            images_clip=jnp.zeros((1, C, C, 3)),
            image_index=jnp.zeros((1,), jnp.int32),
            input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 16), jnp.int32),
            masks_left=jnp.zeros((1, S, S)),
            masks_right=jnp.zeros((1, S, S)),
            taxonomies=jnp.zeros((1, 4)),
            valid_region=jnp.ones((1, S, S)),
            sample_weight=jnp.ones((1,)))
        abstract = flax_meta.unbox(jax.eval_shape(
            lambda: lisa.init(jax.random.PRNGKey(0), tb))["params"])
        restored = restore_params(checkpoint, abstract)
        params = {"params": restored["visual_model"]}
    return cfg, model, params


def export_component(component: str, model_preset: str = "7b",
                     checkpoint: Optional[str] = None,
                     batch: int = 1, precision: str = "bf16") -> bytes:
    """Returns the serialized artifact bytes for `component`."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..nn.sam import postprocess_masks_padded

    cfg, model, params = _build(model_preset, checkpoint, precision)
    S = cfg.sam_encoder.image_size
    G = cfg.sam_encoder.grid_size
    C = cfg.sam_encoder.out_chans
    E = cfg.sam_decoder.prompt_embed_dim

    if component == "encoder":
        fn = lambda images: model.apply(params, images,
                                        method="encode_image")
        args = (jax.ShapeDtypeStruct((batch, S, S, 3), jnp.float32),)
    elif component == "decoder":
        fn = lambda emb, text: model.apply(params, emb, text,
                                           method="decode_masks")
        args = (jax.ShapeDtypeStruct((batch, G, G, C), jnp.float32),
                jax.ShapeDtypeStruct((batch, 1, E), jnp.float32))
    elif component == "mask_path":
        def fn(images, text):
            masks_l, masks_r, iou_l, iou_r, tax = model.apply(
                params, images, text)
            return (postprocess_masks_padded(masks_l, S),
                    postprocess_masks_padded(masks_r, S), tax)

        args = (jax.ShapeDtypeStruct((batch, S, S, 3), jnp.float32),
                jax.ShapeDtypeStruct((batch, 1, E), jnp.float32))
    else:
        raise ValueError(f"unknown component {component!r}")

    exp = jexport.export(jax.jit(fn))(*args)
    return exp.serialize()


def load_exported(path: str):
    """Deserialize an exported artifact into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def call(*args):
        return exp.call(*args)

    return call


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--component", default="decoder",
                   choices=["encoder", "decoder", "mask_path"])
    p.add_argument("--out", required=True)
    p.add_argument("--model_preset", default="7b")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32"])
    args = p.parse_args(argv)

    blob = export_component(args.component, args.model_preset,
                            args.checkpoint, args.batch, args.precision)
    with open(args.out, "wb") as f:
        f.write(blob)
    manifest = {
        "component": args.component, "model_preset": args.model_preset,
        "batch": args.batch, "precision": args.precision,
        "bytes": len(blob), "format": "jax.export/stablehlo",
    }
    with open(args.out + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {args.out} ({len(blob)} bytes) + manifest")


if __name__ == "__main__":
    main()
