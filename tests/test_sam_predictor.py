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
