"""SAM stack unit tests: shapes, invariants, and golden math checks
(vs independent numpy/torch formulations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haff_tpu.core.config import ModelConfig, SamDecoderConfig, SamEncoderConfig
from haff_tpu.nn.sam import Sam, postprocess_masks_padded, preprocess_image
from haff_tpu.nn.sam_image_encoder import (
    decomposed_rel_pos_bias,
    window_partition,
    window_unpartition,
)


def tiny_cfgs():
    m = ModelConfig.preset("tiny")
    return m.sam_encoder, m.sam_decoder


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 10 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 10, 3)
    wins, pad_hw = window_partition(x, 4)
    assert wins.shape == (2 * 3 * 3, 4, 4, 3)
    back = window_unpartition(wins, 4, pad_hw, (10, 10))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_decomposed_rel_pos_bias_matches_naive():
    """Golden check against a direct per-pair lookup formulation."""
    rng = np.random.RandomState(0)
    qh = qw = 4
    nh, hd = 2, 8
    b = 3
    q = rng.randn(b, qh * qw, nh, hd).astype(np.float32)
    Rh = rng.randn(2 * qh - 1, hd).astype(np.float32)
    Rw = rng.randn(2 * qw - 1, hd).astype(np.float32)

    bias = np.asarray(decomposed_rel_pos_bias(
        jnp.asarray(q), jnp.asarray(Rh), jnp.asarray(Rw), (qh, qw), (qh, qw)))

    # Naive: bias[b,n,(i,j),(k,l)] = q[b,(i,j),n] . Rh[i-k+qh-1] + q . Rw[j-l+qw-1]
    naive = np.zeros((b, nh, qh * qw, qh * qw), np.float32)
    for i in range(qh):
        for j in range(qw):
            for k in range(qh):
                for l in range(qw):  # noqa: E741
                    qi = i * qw + j
                    ki = k * qw + l
                    for n in range(nh):
                        naive[:, n, qi, ki] = (
                            q[:, qi, n] @ Rh[i - k + qh - 1]
                            + q[:, qi, n] @ Rw[j - l + qw - 1])
    np.testing.assert_allclose(bias, naive, rtol=1e-4, atol=1e-4)


def test_sam_forward_shapes():
    enc_cfg, dec_cfg = tiny_cfgs()
    model = Sam(encoder_cfg=enc_cfg, decoder_cfg=dec_cfg)
    b = 2
    img = jnp.zeros((b, enc_cfg.image_size, enc_cfg.image_size, 3))
    text = jnp.zeros((b, 1, dec_cfg.prompt_embed_dim))
    params = model.init(jax.random.PRNGKey(0), img, text)
    masks_l, masks_r, iou_l, iou_r, tax = model.apply(params, img, text)
    g = enc_cfg.grid_size
    assert masks_l.shape == (b, 1, 4 * g, 4 * g)
    assert masks_r.shape == (b, 1, 4 * g, 4 * g)
    assert iou_l.shape == (b, 1) and iou_r.shape == (b, 1)
    assert tax.shape == (b, 4)
    np.testing.assert_allclose(np.asarray(tax).sum(-1), 1.0, rtol=1e-5)

    canvas = postprocess_masks_padded(masks_l, enc_cfg.image_size)
    assert canvas.shape == (b, 1, enc_cfg.image_size, enc_cfg.image_size)


def test_preprocess_normalize_and_pad():
    x = jnp.zeros((4, 6, 3))
    out = preprocess_image(x, 8)
    assert out.shape == (8, 8, 3)
    # content region: (0 - mean) / std
    np.testing.assert_allclose(
        np.asarray(out)[:4, :6, 0], -123.675 / 58.395, rtol=1e-5)
    # reference pads with zeros AFTER normalization (sam.py preprocess)
    np.testing.assert_allclose(np.asarray(out)[4:, :, :], 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(out)[:, 6:, :], 0.0, atol=0)


def test_dual_decoders_are_independent_params():
    enc_cfg, dec_cfg = tiny_cfgs()
    model = Sam(encoder_cfg=enc_cfg, decoder_cfg=dec_cfg)
    img = jnp.zeros((1, enc_cfg.image_size, enc_cfg.image_size, 3))
    text = jnp.zeros((1, 1, dec_cfg.prompt_embed_dim))
    params = model.init(jax.random.PRNGKey(0), img, text)["params"]
    assert "mask_decoder_left" in params and "mask_decoder_right" in params
    assert "taxonomy_embed" in params["mask_decoder_left"]
    assert "taxonomy_embed" not in params["mask_decoder_right"]
