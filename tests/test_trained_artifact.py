"""Accuracy gates on REAL TRAINED weights (round-4 overfit artifact).

The committed artifact `artifacts/overfit_small_params.npz` is the
exported result of training the full stack (train/cli.py, small preset)
on the real EPIC P14_05 benchmark frames until validation IoU converged
— the round-4 "training actually learns" demonstration (reference
train_ds.py:451-486 saves on val-IoU improvement). These tests restore
it and run the EXACT validate() protocol (infer/evaluate.
validate_on_benchmark) against the same real frames:

  * the bf16 gate pins "training learned" as a regression test;
  * the int8/int4 gates measure quantized-serving accuracy on trained
    weights — closing VERDICT r3's "quantization accuracy gates run on
    random weights" (measured at export: int8 delta -0.0001, int4
    +0.0008 absolute IoU).

Skipped when the artifact or the reference's benchmark tarball is
absent.
"""

import dataclasses
import os
import subprocess

import numpy as np
import pytest

_ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "overfit_small_params.npz")
_TARBALL = ("/root/reference/ActAffordance/data_zipped/masks/"
            "P14_05.tar.gz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(_ARTIFACT) and os.path.exists(_TARBALL)),
    reason="trained artifact or benchmark tarball not available")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    # Force CPU for the module only and RESTORE afterwards — mutating
    # jax_platforms for the rest of the pytest session would silently
    # move later slow-tier tests off the TPU (ADVICE r4 finding 4).
    prior = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.data.aff_dataset import AffDatasetVal
    from haff_tpu.data.tokenizer import load_tokenizer, seg_token_idx
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.tools.export_params import load_exported_params

    root = tmp_path_factory.mktemp("bench")
    subprocess.run(["tar", "xzf", _TARBALL, "-C", str(root)], check=True)
    tok = load_tokenizer(None)
    base = ModelConfig.preset("small")
    cfg = base.replace(
        seg_token_idx=seg_token_idx(tok),
        llama=dataclasses.replace(
            base.llama,
            vocab_size=max(base.llama.vocab_size, len(tok) + 4)))
    model = LisaModel(cfg=cfg, dtype=jnp.float32)
    params = load_exported_params(_ARTIFACT)
    val_ds = AffDatasetVal(str(root))
    yield model, params, tok, val_ds
    jax.config.update("jax_platforms", prior)


def _validate(model, params, tok, val_ds):
    from haff_tpu.infer.evaluate import validate_on_benchmark

    iou, iocm, frames = validate_on_benchmark(
        model, {"params": params}, tok, val_ds, val_batch_size=4)
    return iou, iocm, frames


def test_trained_model_validates_on_real_frames(setup):
    model, params, tok, val_ds = setup
    iou, iocm, frames = _validate(model, params, tok, val_ds)
    # Current artifact: the r5 run — r4d recipe + --taxonomy_logit_ce
    # (single-softmax CE breaking the reference's double-softmax
    # gradient trap, see ROUND_NOTES r5) + the extended 240-epoch
    # schedule. At export: val IoU 0.9109 / IoCM 0.9316 against the
    # ~0.93 measured pipeline-resolution ceiling; ALL 11 frames
    # 0.849-0.967 with the correct taxonomy class (left, right AND
    # asymmetric — r4d zeroed the two left-hand frames). Gate with
    # margin for BLAS/platform variance.
    assert iou >= 0.88, (iou, frames)
    assert iocm >= 0.90, iocm


def test_trained_model_classifies_every_taxonomy_class(setup):
    """The r5 logit-CE artifact classifies EVERY benchmark frame's
    taxonomy correctly — the regression pin for the double-softmax
    gradient-trap fix (reference mask_decoder.py:172-178 softmax +
    LISA.py:415 CE; our escape: ModelConfig.taxonomy_logit_ce)."""
    import json

    model, params, tok, val_ds = setup
    _, _, frames = _validate(model, params, tok, val_ds)
    for entry, frame in zip(val_ds.entries, frames):
        with open(os.path.join(entry["dir"], "annotation.json")) as f:
            gt = json.load(f)["taxonomy"]
        assert frame["tax"] == int(np.argmax(gt)), (entry["dir"], frame,
                                                    gt)


@pytest.mark.parametrize("bits,max_delta", [(8, 0.02), (4, 0.03)])
def test_quantized_serving_accuracy_on_trained_weights(setup, bits,
                                                       max_delta):
    from haff_tpu.nn.quant import (lisa_serving_predicate,
                                   quantize_dense_tree)

    model, params, tok, val_ds = setup
    iou_bf, _, _ = _validate(model, params, tok, val_ds)
    q = quantize_dense_tree(params, lisa_serving_predicate, bits=bits)
    iou_q, _, _ = _validate(model, q, tok, val_ds)
    assert iou_bf - iou_q <= max_delta, (bits, iou_bf, iou_q)
