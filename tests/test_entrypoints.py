"""Entry-point analogs: predictor, robot demo poll loop, eval tools,
LoRA merge."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def predictor():
    from haff_tpu.infer.predictor import Predictor

    return Predictor(model_preset="tiny", precision="fp32",
                     max_new_tokens=4, max_text_len=448)


def test_predictor_contract(predictor):
    img = (np.random.RandomState(0).rand(60, 90, 3) * 255).astype(np.uint8)
    text, ml, mr, tax = predictor(img, "open the drawer")
    assert ml.shape == (60, 90) and mr.shape == (60, 90)
    assert tax.shape == (4,)
    assert isinstance(text, str)


def test_robot_demo_poll(predictor, tmp_path):
    """Reference protocol: comma margins, required object mask, heatmaps,
    force-gated outputs, object masks kept after processing."""
    import cv2

    from haff_tpu.infer.robot_demo import process_once

    root = str(tmp_path / "robot")
    os.makedirs(os.path.join(root, "in"))
    img = (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "in", "img.png"), img)
    with open(os.path.join(root, "in", "prompt.txt"), "w") as f:
        f.write("grab the cup")
    # no margins yet -> not processed
    assert not process_once(predictor, root, th=-5.0, force="both")
    with open(os.path.join(root, "in", "margins.txt"), "w") as f:
        f.write("5,3,2,4")          # left,top,right,bottom
    # no object masks yet -> not processed (reference 'Masks not found')
    assert not process_once(predictor, root, th=-5.0, force="both")
    obj = np.zeros((57, 77), np.uint8)   # pre-crop frame size
    obj[10:40, 10:60] = 255
    cv2.imwrite(os.path.join(root, "in", "mask_left.png"), obj)

    assert process_once(predictor, root, th=-5.0, force="both")
    out = os.path.join(root, "out")
    for name in ("aff_left.png", "aff_right.png", "aff_left_heat.png",
                 "aff_right_heat.png", "cropped_img.png"):
        assert os.path.exists(os.path.join(out, name)), name
    # masks re-padded to pre-crop size (50+3+4, 70+5+2)
    m = cv2.imread(os.path.join(out, "aff_left.png"), 0)
    assert m.shape == (57, 77)
    # outside the object mask everything is zero (AND applied post-pad)
    assert m[obj == 0].max() == 0
    # img/prompt/margins consumed; object mask KEPT
    assert not os.path.exists(os.path.join(root, "in", "img.png"))
    assert os.path.exists(os.path.join(root, "in", "mask_left.png"))
    # idle poll returns False
    assert not process_once(predictor, root, th=-5.0, force="both")


def test_eval_tools(tmp_path):
    from haff_tpu.eval.tools import (
        frames_to_benchmark,
        gaussian_postprocess,
        overlay_results,
        restore_padding,
    )

    frames = [(np.random.RandomState(i).rand(40, 40, 3) * 255)
              .astype(np.uint8) for i in range(3)]
    n = frames_to_benchmark(frames, str(tmp_path), "cut onion", vid="v1")
    assert n == 3
    fdir = tmp_path / "v1" / "0000001"
    assert (fdir / "inpainting.png").exists()
    ann = json.loads((fdir / "annotation.json").read_text())
    assert ann["narration"] == "cut onion"

    m = np.zeros((40, 40), np.uint8)
    m[10:30, 10:30] = 255
    post = gaussian_postprocess(m, ksize=5)
    assert post.max() == 255 and post[20, 20] == 255

    restored = restore_padding(np.ones((10, 10), np.uint8) * 255,
                               [5, 5, 25, 25], canvas=(50, 50))
    assert restored.shape == (50, 50)
    assert restored[10, 10] == 255 and restored[0, 0] == 0

    ov = overlay_results(frames[0], m > 0, None)
    assert ov.shape == frames[0].shape
    assert (ov[15, 15, 0] > frames[0][15, 15, 0] * 0.5 - 1)


def test_join_and_add_external(tmp_path):
    """prepare_folders.py / add_affex.py analogs: join baseline-method
    predictions with benchmark frames into a scoreable layout."""
    import cv2

    from haff_tpu.eval.tools import (add_external_affordances,
                                     join_prediction_folders)

    png = (np.random.RandomState(0).rand(8, 8) * 255).astype(np.uint8)
    bench = tmp_path / "bench"
    pred = tmp_path / "pred"
    # benchmark frames use 7-digit ids; method output dropped the zeros
    for fid in ("0000003", "0000017"):
        d = bench / fid
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "inpainted_frame.png"), png)
        (d / "annotation.json").write_text(json.dumps({"narration": "x"}))
    for fid, hands in (("3", ("left", "right")), ("17", ("right",)),
                       ("99", ("left",))):  # 99 has no benchmark match
        d = pred / fid
        d.mkdir(parents=True)
        for h in hands:
            cv2.imwrite(str(d / f"aff_{h}.png"), png)

    out = tmp_path / "joined"
    assert join_prediction_folders(str(pred), str(bench), str(out)) == 2
    assert (out / "3" / "aff_left.png").exists()
    assert (out / "3" / "annotation.json").exists()
    assert (out / "17" / "aff_right.png").exists()
    assert not (out / "17" / "aff_left.png").exists()
    assert not (out / "99").exists()

    # add_affex case 1: flat left/right folders keyed by frame id
    masks = tmp_path / "masks"
    (masks / "left").mkdir(parents=True)
    (masks / "right").mkdir(parents=True)
    cv2.imwrite(str(masks / "left" / "0000003.png"), png)
    cv2.imwrite(str(masks / "right" / "0000017.png"), png)
    cv2.imwrite(str(masks / "left" / "0000042.png"), png)  # no match
    out2 = tmp_path / "affex"
    assert add_external_affordances(str(bench), str(masks), str(out2)) == 2
    assert (out2 / "0000003" / "aff_left.png").exists()
    assert (out2 / "0000017" / "aff_right.png").exists()

    # case 2: mirrored structure; existing outputs never overwritten
    assert add_external_affordances(str(bench), str(out2), str(out2)) == 0


def test_merge_lora_folds_adapters():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from haff_tpu.core.config import LlamaConfig
    from haff_tpu.nn.llama import LlamaForCausalLM
    from haff_tpu.tools.merge_lora import merge_lora_params

    import flax.linen as nn

    cfg = dataclasses.replace(LlamaConfig.preset("tiny"), lora_rank=2,
                              lora_dropout=0.0)
    model = LlamaForCausalLM(cfg=cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    pos = jnp.arange(8)[None]
    params = nn.unbox(model.init(jax.random.PRNGKey(0), ids, pos,
                                 method="init_all")["params"])
    # give the adapters nonzero values
    from flax import traverse_util

    flat = dict(traverse_util.flatten_dict(params))
    for k in flat:
        if k[-1] in ("lora_a", "lora_b"):
            flat[k] = jnp.ones_like(flat[k]) * 0.01
    params = traverse_util.unflatten_dict(flat)

    emb = model.apply({"params": params}, ids, method="embed")
    seg = jnp.ones((1, 8), jnp.int32)
    logits_lora, _, _ = model.apply({"params": params}, emb, pos, seg)

    merged = merge_lora_params(params, alpha=cfg.lora_alpha)
    mflat = traverse_util.flatten_dict(merged)
    assert not any(k[-1].startswith("lora_") for k in mflat)

    # merged base weights + rank-0 model reproduce the LoRA model output
    cfg0 = dataclasses.replace(cfg, lora_rank=0)
    model0 = LlamaForCausalLM(cfg=cfg0)
    logits_merged, _, _ = model0.apply({"params": merged}, emb, pos, seg)
    np.testing.assert_allclose(np.asarray(logits_lora),
                               np.asarray(logits_merged),
                               rtol=2e-4, atol=2e-4)


def test_export_model_roundtrip(tmp_path):
    """Export the tiny decoder as a jax.export artifact; the loaded
    artifact must reproduce the live module's outputs exactly
    (reference onnx.py:17-157 capability analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.nn.sam import Sam
    from haff_tpu.tools.export_model import load_exported, main

    out = str(tmp_path / "dec.stablehlo")
    main(["--component", "decoder", "--out", out,
          "--model_preset", "tiny", "--precision", "fp32"])
    assert os.path.getsize(out) > 0
    assert os.path.exists(out + ".json")

    cfg = ModelConfig.preset("tiny")
    model = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder)
    S = cfg.sam_encoder.image_size
    E = cfg.sam_decoder.prompt_embed_dim
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    text0 = jnp.zeros((1, 1, E), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, text0)

    rng = np.random.RandomState(0)
    G = cfg.sam_encoder.grid_size
    C = cfg.sam_encoder.out_chans
    emb = jnp.asarray(rng.randn(1, G, G, C).astype(np.float32))
    text = jnp.asarray(rng.randn(1, 1, E).astype(np.float32))
    ref = model.apply(params, emb, text, method="decode_masks")
    got = load_exported(out)(emb, text)
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_converted_params_load_in_clis(tmp_path, monkeypatch):
    """tools/convert_cli output (StandardCheckpointer bare-params dir)
    must load through restore_checkpoint's dual-format path — this was
    silently falling back to random init before."""
    import json

    import cv2
    import jax
    import numpy as np

    from haff_tpu.tools.convert_cli import main as convert_main

    out = str(tmp_path / "converted")
    convert_main(["--preset", "tiny", "--out", out])
    assert os.path.exists(os.path.join(out, "_CHECKPOINT_METADATA"))

    # the infer CLI restores it (prints step 0) and produces masks
    root = tmp_path / "bench" / "P01_101" / "0000123"
    root.mkdir(parents=True)
    cv2.imwrite(str(root / "inpainting.png"),
                (np.random.RandomState(1).rand(48, 64, 3) * 255)
                .astype(np.uint8))
    (root / "annotation.json").write_text(
        json.dumps({"narration": "open drawer"}))
    from haff_tpu.infer.cli import main as infer_main

    vis = str(tmp_path / "vis")
    infer_main(["--benchmark_dir", str(tmp_path / "bench"),
                "--vis_save_path", vis, "--model_preset", "tiny",
                "--batch", "1", "--max_new_tokens", "2",
                "--precision", "fp32", "--checkpoint", out])
    leaf = os.path.join(vis + "0.5", "P01_101", "0000123")
    assert (os.path.exists(os.path.join(leaf, "aff_left.png"))
            or os.path.exists(os.path.join(leaf, "aff_right.png")))

    # restore_params grafts the exact values
    from haff_tpu.train.checkpoints import restore_params

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.model.lisa import LisaModel
    import flax.linen as nn
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    cfg = ModelConfig.preset("tiny")
    model = LisaModel(cfg=cfg)
    init = nn.unbox(jax.jit(model.init)(
        jax.random.PRNGKey(1), make_tiny_batch(cfg))["params"])
    got = restore_params(out, init)
    # convert_cli used seed 0; our target used seed 1 -> values must
    # now match the seed-0 init, i.e. restore actually overwrote them
    ref = nn.unbox(jax.jit(model.init)(
        jax.random.PRNGKey(0), make_tiny_batch(cfg))["params"])
    a = np.asarray(got["text_fc1"]["kernel"])
    np.testing.assert_allclose(a, np.asarray(ref["text_fc1"]["kernel"]),
                               rtol=1e-6)


def test_export_model_from_converted_checkpoint(tmp_path):
    """--checkpoint on the export tool restores a convert_cli params dir
    (regression: the restore target mismatched both orbax layouts and
    every checkpointed export crashed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from haff_tpu.tools.convert_cli import main as convert_main
    from haff_tpu.tools.export_model import load_exported, main as export_main

    conv = str(tmp_path / "conv")
    convert_main(["--preset", "tiny", "--out", conv])
    out = str(tmp_path / "dec.stablehlo")
    export_main(["--component", "decoder", "--out", out,
                 "--model_preset", "tiny", "--precision", "fp32",
                 "--checkpoint", conv])
    # artifact must reproduce the checkpoint weights (seed-0 init),
    # not a fresh random init of the Sam module
    from haff_tpu.core.config import ModelConfig
    from haff_tpu.model.lisa import LisaModel, TrainBatch
    import sys
    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    cfg = ModelConfig.preset("tiny")
    lisa = LisaModel(cfg=cfg)
    lp = jax.jit(lisa.init)(jax.random.PRNGKey(0),
                            make_tiny_batch(cfg))
    from flax.core import meta as flax_meta
    sam_params = {"params": flax_meta.unbox(lp["params"])["visual_model"]}

    from haff_tpu.nn.sam import Sam
    sam = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder)
    rng = np.random.RandomState(0)
    G, C = cfg.sam_encoder.grid_size, cfg.sam_encoder.out_chans
    E = cfg.sam_decoder.prompt_embed_dim
    emb = jnp.asarray(rng.randn(1, G, G, C).astype(np.float32))
    text = jnp.asarray(rng.randn(1, 1, E).astype(np.float32))
    ref = sam.apply(sam_params, emb, text, method="decode_masks")
    got = load_exported(out)(emb, text)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_merge_lora_cli_with_base_params(tmp_path):
    """End-to-end merge flow on a REAL train checkpoint: trainable
    partition + --base_params converted dir -> full merged tree
    (regression: merging the trainable partition alone KeyError'd on
    the missing base kernels)."""
    import dataclasses
    import sys

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    sys.path.insert(0, "tests")
    from test_lisa_model import make_tiny_batch

    from haff_tpu.core.config import ModelConfig, TrainConfig
    from haff_tpu.model.lisa import LisaModel
    from haff_tpu.tools.convert_cli import main as convert_main
    from haff_tpu.tools.merge_lora import main as merge_main
    from haff_tpu.train.checkpoints import save_checkpoint
    from haff_tpu.train.trainer import init_train_state, partition_params

    base_dir = str(tmp_path / "base")
    convert_main(["--preset", "tiny", "--out", base_dir])

    cfg0 = ModelConfig.preset("tiny")
    cfg = dataclasses.replace(
        cfg0, llama=dataclasses.replace(cfg0.llama, lora_rank=2))
    model = LisaModel(cfg=cfg)
    params = nn.unbox(jax.jit(model.init)(
        jax.random.PRNGKey(0), make_tiny_batch(cfg))["params"])
    trainable, _ = partition_params(params)
    state = init_train_state(TrainConfig(model=cfg, lr=1e-3),
                             trainable)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, 7, state)

    out = str(tmp_path / "merged")
    merge_main(["--checkpoint", ckpt, "--base_params", base_dir,
                "--out", out])
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    merged = ck.restore(out)
    ck.close()
    flat = traverse_util.flatten_dict(merged)
    # full model present (frozen base restored), adapters folded away
    assert any("image_encoder" in k for k in flat)
    assert any(k[-2:] == ("base", "kernel") for k in flat)
    assert not any(k[-1] in ("lora_a", "lora_b") for k in flat)
    assert not any(k[0] == "vision_tower" for k in flat)

    # trainable-only checkpoint without base params must error clearly
    import pytest

    with pytest.raises(SystemExit):
        merge_main(["--checkpoint", ckpt, "--out",
                    str(tmp_path / "nope")])


def test_predictor_host_restore_quantized(tmp_path):
    """Quantized serving from a bare-params checkpoint must restore to
    HOST numpy (restore_params_host) and quantize without ever
    materializing the float model on device — the 7B/13B-on-16GB load
    path. Verified: outputs match a float predictor's within int4 error,
    and the LLM kernels in the loaded tree are packed uint8."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from flax.core import meta as flax_meta

    from haff_tpu.infer.predictor import Predictor

    base = Predictor(model_preset="tiny", precision="fp32",
                     max_new_tokens=4, max_text_len=448)
    ckpt = str(tmp_path / "converted")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(ckpt),
               flax_meta.unbox(base.params["params"]))
    ckptr.close()

    q = Predictor(model_preset="tiny", precision="fp32",
                  max_new_tokens=4, max_text_len=448,
                  checkpoint=ckpt, load_in_4bit=True)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda x: getattr(x, "dtype", None) == jnp.uint8,
            q.params))
    assert any(flat), "no packed int4 kernels after quantized restore"

    img = (np.random.RandomState(2).rand(40, 60, 3) * 255).astype(np.uint8)
    text_f, ml_f, mr_f, _ = base(img, "open the drawer")
    text_q, ml_q, mr_q, _ = q(img, "open the drawer")
    assert ml_q.shape == ml_f.shape and mr_q.shape == mr_f.shape
    assert np.isfinite(ml_q).all() and np.isfinite(mr_q).all()
