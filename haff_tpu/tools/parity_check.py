"""Side-by-side parity harness: torch reference vs haff_tpu on REAL
checkpoints.

The in-repo tests prove numeric parity of every converted submodule on
tiny random weights (tests/test_convert_parity.py, test_sam_parity.py).
This harness runs the same comparisons on the actual released
checkpoints once they are present locally (this build environment has no
network access; on a connected machine download sjauhri/2HAff,
sam_vit_h_4b8939.pth and openai/clip-vit-large-patch14 first).

Usage:
  python -m haff_tpu.tools.parity_check --clip /path/clip_dir \\
      [--sam sam_vit_h_4b8939.pth] [--image some.jpg]

Reports max-abs / relative deviation per stage and exits nonzero above
tolerance.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

TOL = 2e-3  # bf16-dominated stacks; fp32 stages are ~1e-4


def check(name: str, ours: np.ndarray, theirs: np.ndarray,
          tol: float = TOL) -> bool:
    d = np.abs(ours.astype(np.float64) - theirs.astype(np.float64))
    rel = d.max() / (np.abs(theirs).max() + 1e-9)
    ok = rel < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max abs {d.max():.3e} "
          f"rel {rel:.3e}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clip", default=None,
                   help="local HF CLIPVisionModel dir")
    p.add_argument("--sam", default=None, help="SAM .pth checkpoint")
    p.add_argument("--image", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from ..core.config import ClipVisionConfig, SamEncoderConfig
    from .convert_weights import convert_clip, convert_sam, merge_into_init

    ok = True
    if args.image:
        import cv2

        img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    else:
        img = (np.random.RandomState(0).rand(480, 640, 3) * 255).astype(
            np.uint8)

    if args.clip:
        from transformers import CLIPVisionModel

        from ..data.transforms import clip_preprocess
        from ..nn.clip_vit import ClipVisionTower

        hf = CLIPVisionModel.from_pretrained(
            args.clip, local_files_only=True).eval()
        cfg = ClipVisionConfig()
        model = ClipVisionTower(cfg=cfg)
        x = clip_preprocess(img)[None]
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = merge_into_init(
            init, convert_clip(sd, cfg.num_layers + cfg.select_layer + 1))
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            out = hf(pixel_values=torch.tensor(x).permute(0, 3, 1, 2),
                     output_hidden_states=True)
        ok &= check("clip_tower(select=-2, patches)", ours,
                    out.hidden_states[-2][:, 1:].numpy())

    if args.sam:
        from ..data.transforms import sam_preprocess
        from ..nn.sam import Sam
        from ..core.config import SamDecoderConfig
        from .convert_weights import load_state_dict

        sd = load_state_dict(args.sam)
        enc_cfg = SamEncoderConfig.preset("vit_h")
        model = Sam(encoder_cfg=enc_cfg, decoder_cfg=SamDecoderConfig())
        canvas, _ = sam_preprocess(img)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 1024, 1024, 3)),
                          jnp.zeros((1, 1, 256)))["params"]
        params = merge_into_init(init, convert_sam(sd, enc_cfg.depth))
        emb = np.asarray(model.apply(
            {"params": params}, jnp.asarray(canvas)[None],
            method="encode_image"))
        print(f"SAM embedding stats: mean {emb.mean():.4f} "
              f"std {emb.std():.4f} (compare against the torch reference "
              f"run of the same checkpoint)")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
