"""SAM stack numeric parity vs HF torch SamModel (tiny config, converted
weights). Validates the decomposed rel-pos attention, windowing, neck,
prompt-encoder PE, two-way transformer and mask decoder end to end."""

import numpy as np
import pytest
import torch

from haff_tpu.core.config import SamDecoderConfig, SamEncoderConfig
from haff_tpu.tools.convert_weights import (
    convert_sam,
    hf_sam_to_original,
    merge_into_init,
)


def tiny_hf_sam():
    from transformers import SamConfig, SamModel

    cfg = SamConfig()
    v = cfg.vision_config
    v.hidden_size = 32
    v.num_hidden_layers = 2
    v.num_attention_heads = 2
    v.mlp_dim = 64
    v.image_size = 64
    v.patch_size = 16
    v.window_size = 2
    v.global_attn_indexes = [1]
    v.output_channels = 32
    cfg.prompt_encoder_config.hidden_size = 32
    cfg.prompt_encoder_config.image_size = 64
    cfg.prompt_encoder_config.patch_size = 16
    cfg.prompt_encoder_config.image_embedding_size = 4
    cfg.vision_config.num_pos_feats = 16  # SamPositionalEmbedding source
    cfg.mask_decoder_config.hidden_size = 32
    cfg.mask_decoder_config.mlp_dim = 64
    cfg.mask_decoder_config.iou_head_hidden_dim = 32
    torch.manual_seed(0)
    return SamModel(cfg).eval(), cfg


@pytest.fixture(scope="module")
def sam_pair():
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.sam import Sam

    hf, hf_cfg = tiny_hf_sam()
    enc_cfg = SamEncoderConfig(
        image_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        mlp_ratio=2.0, out_chans=32, window_size=2, global_attn_indexes=(1,))
    dec_cfg = SamDecoderConfig(prompt_embed_dim=32, transformer_mlp_dim=64,
                               iou_head_hidden_dim=32)
    model = Sam(encoder_cfg=enc_cfg, decoder_cfg=dec_cfg)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, 1, 32))
    init = model.init(jax.random.PRNGKey(0), img, txt)["params"]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    conv = convert_sam(hf_sam_to_original(sd), depth=2)
    params = merge_into_init(init, conv)
    return hf, model, params


def test_sam_encoder_parity(sam_pair):
    import jax.numpy as jnp

    hf, model, params = sam_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32) * 0.5
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x), method="encode_image"))
    with torch.no_grad():
        theirs = hf.vision_encoder(
            torch.tensor(x).permute(0, 3, 1, 2)).last_hidden_state
    theirs = theirs.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-4)


def test_prompt_encoder_dense_pe_parity(sam_pair):
    import jax

    hf, model, params = sam_pair
    ours = np.asarray(model.apply(
        {"params": params},
        method=lambda m: m.prompt_encoder.get_dense_pe()))
    with torch.no_grad():
        theirs = hf.get_image_wide_positional_embeddings()[0].numpy()
    theirs = theirs.transpose(1, 2, 0)  # (C, h, w) -> (h, w, C)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_mask_decoder_parity(sam_pair):
    """Dual decode vs HF mask decoder given the same embeddings and a
    text/sparse prompt embedding."""
    import jax.numpy as jnp

    hf, model, params = sam_pair
    rng = np.random.RandomState(1)
    emb = rng.randn(1, 4, 4, 32).astype(np.float32)
    text = rng.randn(1, 1, 32).astype(np.float32)

    masks_l, masks_r, iou_l, iou_r, tax = model.apply(
        {"params": params}, jnp.asarray(emb), jnp.asarray(text),
        method="decode_masks")

    with torch.no_grad():
        image_pe = hf.get_image_wide_positional_embeddings()  # (1,C,h,w)
        dense = hf.prompt_encoder.no_mask_embed.weight.reshape(
            1, -1, 1, 1).expand(1, 32, 4, 4)
        low_res, iou = hf.mask_decoder(
            image_embeddings=torch.tensor(emb).permute(0, 3, 1, 2),
            image_positional_embeddings=image_pe,
            sparse_prompt_embeddings=torch.tensor(text)[:, None],
            dense_prompt_embeddings=dense,
            multimask_output=False)
    theirs = low_res.numpy()  # (B, point_batch, n, h, w)
    np.testing.assert_allclose(
        np.asarray(masks_l)[0, 0], theirs[0, 0, 0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(masks_r)[0, 0], theirs[0, 0, 0], rtol=2e-3, atol=2e-3)
