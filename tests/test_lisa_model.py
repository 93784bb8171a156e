"""End-to-end composite model: one jitted train forward on the tiny preset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.core.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX, ModelConfig
from haff_tpu.model.lisa import LisaModel, TrainBatch


def make_tiny_batch(cfg: ModelConfig, b_img=2, b_conv=3, seq=24):
    rng = np.random.RandomState(0)
    S = cfg.sam_encoder.image_size
    C = cfg.clip.image_size
    ids = rng.randint(5, cfg.llama.vocab_size - 10, (b_conv, seq)).astype(np.int32)
    ids[:, 0] = 1  # bos
    ids[:, 2] = IMAGE_TOKEN_INDEX
    ids[:, 10] = cfg.seg_token_idx
    labels = ids.copy()
    labels[:, :6] = IGNORE_INDEX
    attn = np.ones((b_conv, seq), np.int32)
    attn[0, -4:] = 0
    return TrainBatch(
        images_sam=jnp.asarray(rng.randn(b_img, S, S, 3).astype(np.float32)),
        images_clip=jnp.asarray(rng.randn(b_img, C, C, 3).astype(np.float32)),
        image_index=jnp.asarray(np.array([0, 0, 1], np.int32)[:b_conv]),
        input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels),
        attention_mask=jnp.asarray(attn),
        masks_left=jnp.asarray((rng.rand(b_conv, S, S) > 0.8)
                               .astype(np.float32)),
        masks_right=jnp.asarray((rng.rand(b_conv, S, S) > 0.8)
                                .astype(np.float32)),
        taxonomies=jnp.asarray(
            np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]],
                     np.float32)[:b_conv]),
        valid_region=jnp.ones((b_conv, S, S), jnp.float32),
        sample_weight=jnp.ones((b_conv,), jnp.float32),
    )


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    batch = make_tiny_batch(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


def test_train_forward_losses_finite(tiny_setup):
    cfg, model, batch, params = tiny_setup
    out = jax.jit(model.apply)(params, batch)
    for name in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss",
                 "taxonomy_ce_loss"):
        val = float(getattr(out, name))
        assert np.isfinite(val), f"{name} not finite"
    assert out.pred_masks_left.shape == (
        3, cfg.sam_encoder.image_size, cfg.sam_encoder.image_size)
    assert out.pred_taxonomies.shape == (3, 4)


def test_train_forward_grads_finite(tiny_setup):
    cfg, model, batch, params = tiny_setup

    def loss_fn(p):
        return model.apply(p, batch).loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()
    # Gradients flow into both mask decoders and the [SEG] projection.
    g = grads["params"]
    assert np.abs(np.asarray(
        jax.tree_util.tree_leaves(g["visual_model"]["mask_decoder_left"])[0]
    )).max() >= 0
    assert any(
        np.abs(np.asarray(x)).sum() > 0
        for x in jax.tree_util.tree_leaves(g["text_fc1"]))


def test_padded_row_does_not_contribute(tiny_setup):
    cfg, model, batch, params = tiny_setup
    w = np.asarray(batch.sample_weight).copy()
    w[-1] = 0.0
    b2 = batch._replace(sample_weight=jnp.asarray(w))
    out_full = jax.jit(model.apply)(params, batch)
    out_masked = jax.jit(model.apply)(params, b2)
    # Losses must differ (the dropped row mattered) and stay finite.
    assert np.isfinite(float(out_masked.loss))
    assert float(out_masked.mask_bce_loss) != float(out_full.mask_bce_loss)
