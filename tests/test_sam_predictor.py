"""SamPredictor point/box prompt API."""

import jax
import jax.numpy as jnp
import numpy as np

from haff_tpu.core.config import ModelConfig
from haff_tpu.infer.sam_predictor import SamPredictor
from haff_tpu.nn.sam import Sam


def test_predictor_point_and_box():
    cfg = ModelConfig.preset("tiny")
    model = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder)
    S = cfg.sam_encoder.image_size
    img = jnp.zeros((1, S, S, 3))
    txt = jnp.zeros((1, 1, cfg.sam_decoder.prompt_embed_dim))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, txt)

    pred = SamPredictor(model, params, image_size=S)
    frame = (np.random.RandomState(0).rand(60, 90, 3) * 255).astype(np.uint8)
    pred.set_image(frame)

    masks, iou, tax = pred.predict(
        point_coords=np.array([[45.0, 30.0]]), point_labels=np.array([1]),
        multimask_output=True, hand="left")
    assert masks.shape == (3, 60, 90)  # multimask: 3 candidates
    assert iou.shape == (3,)
    assert tax is not None and tax.shape == (4,)

    masks_b, iou_b, tax_b = pred.predict(
        box=np.array([10.0, 10.0, 70.0, 50.0]), multimask_output=False,
        hand="right")
    assert masks_b.shape == (1, 60, 90)
    assert tax_b is None

    # coord transform scales into the resized canvas
    tc = pred._transform_coords(np.array([[90.0, 60.0]]))
    rh, rw = pred._input_hw
    np.testing.assert_allclose(tc[0], [rw, rh], rtol=1e-5)


def test_predict_batch_matches_per_prompt_and_amg_single_call():
    """predict_batch: one jitted decode for N prompts == N predict()
    calls; from_predictor services a whole AMG grid batch with a single
    decode call (VERDICT r2 item 8, reference points_per_batch)."""
    cfg = ModelConfig.preset("tiny")
    model = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder)
    S = cfg.sam_encoder.image_size
    img = jnp.zeros((1, S, S, 3))
    txt = jnp.zeros((1, 1, cfg.sam_decoder.prompt_embed_dim))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, txt)

    pred = SamPredictor(model, params, image_size=S)
    frame = (np.random.RandomState(1).rand(48, 64, 3) * 255).astype(np.uint8)
    pred.set_image(frame)

    pts = np.array([[10.0, 8.0], [32.0, 24.0], [50.0, 40.0]])
    bm, bi, bt = pred.predict_batch(pts, multimask_output=True,
                                    return_logits=True, hand="left")
    assert bm.shape[:2] == (3, 3) and bm.shape[2:] == (48, 64)
    assert bi.shape == (3, 3) and bt.shape == (3, 4)
    for k in range(3):
        m, i, t = pred.predict(point_coords=pts[k:k + 1],
                               point_labels=np.array([1]),
                               multimask_output=True, return_logits=True,
                               hand="left")
        np.testing.assert_allclose(bm[k], m, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(bi[k], i, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(bt[k], t, rtol=1e-5, atol=1e-5)

    # AMG: the whole grid (16 points <= batch 64) = ONE decode call
    from haff_tpu.infer.amg import from_predictor

    calls = []
    inner = pred._decode_batch

    def counting(*args, **kw):
        calls.append(1)
        return inner(*args, **kw)

    pred._decode_batch = counting
    amg = from_predictor(pred, hand="left", points_per_side=4,
                         pred_iou_thresh=0.0, stability_thresh=0.0)
    records = amg.generate(frame.shape[:2])
    assert len(calls) == 1
    assert isinstance(records, list)
