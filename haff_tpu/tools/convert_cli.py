"""Weight conversion CLI: reference checkpoints -> orbax params.

Usage:
  python -m haff_tpu.tools.convert_cli --preset 7b --out /ckpt/haff7b \\
      [--lisa /path/2haff_hf_dir_or_file] [--sam sam_vit_h_4b8939.pth] \\
      [--clip clip_vision_model.(bin|safetensors)]

Starts from a fresh init of the selected preset and overlays every
provided checkpoint (merged 2HAff export, stock SAM with left/right
duplication, HF CLIP vision tower). All loads are local-file only.
"""

from __future__ import annotations

import argparse
import glob
import os


def load_any(path: str):
    from .convert_weights import load_state_dict

    if os.path.isdir(path):
        sd = {}
        for f in sorted(glob.glob(os.path.join(path, "*.safetensors"))
                        + glob.glob(os.path.join(path, "*.bin"))):
            sd.update(load_state_dict(f))
        return sd
    return load_state_dict(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="7b")
    p.add_argument("--out", required=True)
    p.add_argument("--lisa", default=None,
                   help="merged 2HAff HF checkpoint (dir or file)")
    p.add_argument("--sam", default=None, help="SAM .pth checkpoint")
    p.add_argument("--clip", default=None, help="HF CLIP vision weights")
    p.add_argument("--hf_sam_layout", action="store_true",
                   help="--sam uses HF SamModel key names")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.config import ModelConfig
    from ..model.lisa import LisaModel
    from .convert_weights import (
        convert_2haff,
        convert_clip,
        convert_sam,
        hf_sam_to_original,
        merge_into_init,
    )

    cfg = ModelConfig.preset(args.preset)
    model = LisaModel(cfg=cfg)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests"))

    # tiny synthetic batch just to build the param structure
    from ..core.config import IMAGE_TOKEN_INDEX
    from ..model.lisa import TrainBatch

    S, C = cfg.sam_encoder.image_size, cfg.clip.image_size
    ids = np.full((1, 16), 5, np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    batch = TrainBatch(
        images_sam=jnp.zeros((1, S, S, 3)),
        images_clip=jnp.zeros((1, C, C, 3)),
        image_index=jnp.zeros((1,), jnp.int32),
        input_ids=jnp.asarray(ids), labels=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 16), jnp.int32),
        masks_left=jnp.zeros((1, S, S)), masks_right=jnp.zeros((1, S, S)),
        taxonomies=jnp.zeros((1, 4)),
        valid_region=jnp.ones((1, S, S)),
        sample_weight=jnp.ones((1,)))
    with jax.default_device(jax.devices("cpu")[0] if any(
            d.platform == "cpu" for d in jax.devices()) else jax.devices()[0]):
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), batch))
    # materialize real init (needed for params absent from checkpoints)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)["params"]
    from flax.core import meta as flax_meta

    params = flax_meta.unbox(params)  # plain arrays on disk

    if args.lisa:
        sd = load_any(args.lisa)
        conv = convert_2haff(sd, llama_layers=cfg.llama.num_layers,
                             sam_depth=cfg.sam_encoder.depth)
        params = merge_into_init(params, conv)
        print("overlaid 2HAff checkpoint")
    if args.sam:
        sd = load_any(args.sam)
        if args.hf_sam_layout:
            sd = hf_sam_to_original(sd)
        params = merge_into_init(
            params, {"visual_model": convert_sam(
                sd, depth=cfg.sam_encoder.depth)})
        print("overlaid SAM checkpoint (decoders duplicated)")
    if args.clip:
        sd = load_any(args.clip)
        n_used = cfg.clip.num_layers + cfg.clip.select_layer + 1
        params = merge_into_init(
            params, {"vision_tower": convert_clip(sd, n_used)})
        print("overlaid CLIP vision tower")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), params)
    ckptr.wait_until_finished()
    print(f"saved converted params to {args.out}")


if __name__ == "__main__":
    main()
