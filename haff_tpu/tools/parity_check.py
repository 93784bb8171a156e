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


def _clip_cfg_from_hf(hfc):
    """Derive our ClipVisionConfig from the checkpoint's own HF config —
    the harness then works on ANY CLIP size (the real L/14 checkpoint or
    a tiny local dry-run one)."""
    from ..core.config import ClipVisionConfig

    return ClipVisionConfig(
        image_size=hfc.image_size, patch_size=hfc.patch_size,
        hidden_size=hfc.hidden_size,
        intermediate_size=hfc.intermediate_size,
        num_layers=hfc.num_hidden_layers,
        num_heads=hfc.num_attention_heads)


def _sam_cfg_from_sd(sd):
    """Derive SamEncoderConfig from an original-layout SAM state dict:
    the released ViT-H/L/B checkpoints are recognized by embed_dim;
    other sizes (dry-run checkpoints) fall back to shape inference."""
    from ..core.config import SamEncoderConfig

    embed = sd["image_encoder.patch_embed.proj.weight"].shape[0]
    by_dim = {1280: "vit_h", 1024: "vit_l", 768: "vit_b"}
    if embed in by_dim:
        return SamEncoderConfig.preset(by_dim[embed])
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("image_encoder.blocks."))
    patch = sd["image_encoder.patch_embed.proj.weight"].shape[-1]
    pe = sd["image_encoder.pos_embed"]          # (1, g, g, embed)
    out_chans = sd["image_encoder.neck.0.weight"].shape[0]
    # Global blocks carry the larger (2*grid-1) rel tables; the window
    # size comes from the SMALLEST table across blocks (block 0 itself
    # may be global, e.g. global_attn_indexes containing 0).
    grid = pe.shape[1]
    rels = [sd[f"image_encoder.blocks.{i}.attn.rel_pos_h"].shape[0]
            for i in range(depth)]
    window = (min(rels) + 1) // 2
    glob = tuple(i for i, r in enumerate(rels) if r == 2 * grid - 1)
    return SamEncoderConfig(
        image_size=grid * patch, patch_size=patch, embed_dim=embed,
        depth=depth, num_heads=max(1, embed // 64),
        out_chans=out_chans, window_size=window,
        global_attn_indexes=glob)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clip", default=None,
                   help="local HF CLIPVisionModel dir")
    p.add_argument("--sam", default=None, help="SAM .pth checkpoint")
    p.add_argument("--sam_heads", type=int, default=None,
                   help="override inferred encoder head count "
                        "(non-released checkpoint sizes)")
    p.add_argument("--image", default=None)
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import torch

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
        cfg = _clip_cfg_from_hf(hf.config)
        model = ClipVisionTower(cfg=cfg)
        x = clip_preprocess(img, cfg.image_size)[None]
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
        enc_cfg = _sam_cfg_from_sd(sd)
        if args.sam_heads:
            enc_cfg = dataclasses.replace(enc_cfg,
                                          num_heads=args.sam_heads)
        dec_kw = {}
        if "mask_decoder.iou_token.weight" in sd:
            dec_kw["prompt_embed_dim"] = \
                sd["mask_decoder.iou_token.weight"].shape[-1]
        if "mask_decoder.iou_prediction_head.layers.0.weight" in sd:
            dec_kw["iou_head_hidden_dim"] = sd[
                "mask_decoder.iou_prediction_head.layers.0.weight"
            ].shape[0]
        if "mask_decoder.transformer.layers.0.mlp.lin1.weight" in sd:
            dec_kw["transformer_mlp_dim"] = sd[
                "mask_decoder.transformer.layers.0.mlp.lin1.weight"
            ].shape[0]
        if "prompt_encoder.mask_downscaling.0.weight" in sd:
            dec_kw["mask_in_chans"] = 4 * sd[
                "prompt_encoder.mask_downscaling.0.weight"].shape[0]
        dec_cfg = SamDecoderConfig(**dec_kw)
        model = Sam(encoder_cfg=enc_cfg, decoder_cfg=dec_cfg)
        S = enc_cfg.image_size
        canvas, _ = sam_preprocess(img, S)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, S, S, 3)),
                          jnp.zeros((1, 1, dec_cfg.prompt_embed_dim))
                          )["params"]
        params = merge_into_init(init, convert_sam(sd, enc_cfg.depth))
        emb = np.asarray(model.apply(
            {"params": params}, jnp.asarray(canvas)[None],
            method="encode_image"))
        print(f"SAM embedding stats: mean {emb.mean():.3e} "
              f"std {emb.std():.3e} (compare against the torch reference "
              f"run of the same checkpoint)")
        # With transformers' SamModel available, compare the encoder
        # end-to-end on the SAME checkpoint (works for dry-run
        # checkpoints exported from HF SamModel; the released original
        # .pth has no torch-side runner in this environment).
        try:
            ours_hw = np.transpose(emb, (0, 3, 1, 2))
            theirs = _torch_sam_encode(sd, enc_cfg, canvas)
            if theirs is not None:
                ok &= check("sam_image_encoder", ours_hw, theirs)
        except Exception as e:  # torch side is best-effort
            print(f"# torch SAM comparison skipped: "
                  f"{type(e).__name__}: {str(e)[:120]}")

    sys.exit(0 if ok else 1)


def _torch_sam_encode(sd, enc_cfg, canvas):
    """Best-effort torch-side encoder run: rebuild an HF SamModel of the
    matching size from the original-layout state dict (inverse of
    hf_sam_to_original for the vision tower) and encode the same canvas.
    Returns None when the HF architecture cannot represent the config."""
    import torch
    from transformers import SamConfig, SamModel

    scfg = SamConfig()
    v = scfg.vision_config
    v.hidden_size = enc_cfg.embed_dim
    v.num_hidden_layers = enc_cfg.depth
    v.num_attention_heads = enc_cfg.num_heads
    v.mlp_dim = int(enc_cfg.embed_dim * enc_cfg.mlp_ratio)
    v.image_size = enc_cfg.image_size
    v.patch_size = enc_cfg.patch_size
    v.window_size = enc_cfg.window_size
    v.global_attn_indexes = list(enc_cfg.global_attn_indexes)
    v.output_channels = enc_cfg.out_chans
    m = SamModel(scfg).eval()
    # original layout -> HF vision_encoder keys
    ren = {}
    for k, val in sd.items():
        if not k.startswith("image_encoder."):
            continue
        hk = "vision_encoder." + k[len("image_encoder."):]
        hk = hk.replace("blocks.", "layers.")
        hk = hk.replace(".norm1.", ".layer_norm1.")
        hk = hk.replace(".norm2.", ".layer_norm2.")
        hk = hk.replace("neck.0.", "neck.conv1.")
        hk = hk.replace("neck.1.", "neck.layer_norm1.")
        hk = hk.replace("neck.2.", "neck.conv2.")
        hk = hk.replace("neck.3.", "neck.layer_norm2.")
        hk = hk.replace("patch_embed.proj.", "patch_embed.projection.")
        ren[hk] = torch.tensor(val)
    missing = [k for k in m.vision_encoder.state_dict()
               if "vision_encoder." + k not in ren]
    if missing:
        return None
    m.vision_encoder.load_state_dict(
        {k[len("vision_encoder."):]: v for k, v in ren.items()})
    with torch.no_grad():
        pix = torch.tensor(canvas)[None].permute(0, 3, 1, 2)
        return m.vision_encoder(pix).last_hidden_state.numpy()


if __name__ == "__main__":
    main()
