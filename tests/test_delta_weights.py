"""Vicuna delta-weight tools (reference apply_delta.py / make_delta.py
/ consolidate.py): make -> apply roundtrip, vocab-extension rule,
multimodal-only keys, error surfaces."""

import numpy as np
import pytest

from haff_tpu.tools.delta_weights import (apply_delta, main, make_delta)


def _base():
    rng = np.random.RandomState(0)
    return {
        "model.embed_tokens.weight": rng.randn(10, 4).astype(np.float32),
        "model.layers.0.mlp.w.weight": rng.randn(4, 4).astype(np.float32),
        "lm_head.weight": rng.randn(10, 4).astype(np.float32),
    }


def _target():
    rng = np.random.RandomState(1)
    t = {
        # vocab extended 10 -> 12 (added special tokens)
        "model.embed_tokens.weight": rng.randn(12, 4).astype(np.float32),
        "model.layers.0.mlp.w.weight": rng.randn(4, 4).astype(np.float32),
        "lm_head.weight": rng.randn(12, 4).astype(np.float32),
        # llava-only key, absent from the raw llama base
        "model.mm_projector.weight": rng.randn(4, 4).astype(np.float32),
        "model.mm_projector.bias": rng.randn(4).astype(np.float32),
    }
    return t


def test_make_then_apply_roundtrips():
    base, target = _base(), _target()
    delta = make_delta(target, base)
    rebuilt = apply_delta(base, delta)
    assert set(rebuilt) == set(target)
    for k in target:
        np.testing.assert_allclose(rebuilt[k], target[k], rtol=1e-6,
                                   atol=1e-6)
    # the extended vocab rows pass through the delta untouched
    np.testing.assert_array_equal(
        delta["model.embed_tokens.weight"][10:],
        target["model.embed_tokens.weight"][10:])


def test_unknown_extra_key_rejected():
    base, target = _base(), _target()
    target["model.layers.0.rogue.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError):
        make_delta(target, base)


def test_shape_mismatch_outside_allowlist_rejected():
    base, target = _base(), _target()
    target["model.layers.0.mlp.w.weight"] = np.zeros((8, 4), np.float32)
    with pytest.raises(ValueError):
        make_delta(target, base)


def test_inverted_vocab_extension_rejected():
    """A base vocab LARGER than the target's must raise, matching the
    reference's one-directional indexing (apply_delta.py would error);
    previously min() silently truncated (ADVICE r4 finding 3)."""
    base, target = _base(), _target()
    base["model.embed_tokens.weight"] = np.zeros((20, 4), np.float32)
    with pytest.raises(ValueError, match="one-directional"):
        make_delta(target, base)


def test_cli_roundtrip_torch_files(tmp_path):
    import torch

    base, target = _base(), _target()
    bp, tp = str(tmp_path / "base.bin"), str(tmp_path / "target.bin")
    dp, rp = str(tmp_path / "delta.bin"), str(tmp_path / "rebuilt.bin")
    for path, sd in ((bp, base), (tp, target)):
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    main(["make", "--base", bp, "--target", tp, "--out", dp])
    main(["apply", "--base", bp, "--delta", dp, "--out", rp])
    rebuilt = torch.load(rp, weights_only=True)
    for k in target:
        np.testing.assert_allclose(rebuilt[k].numpy(), target[k],
                                   rtol=1e-5, atol=1e-5)
    # consolidate: dir of shards -> one file
    sh = tmp_path / "shards"
    sh.mkdir()
    torch.save({"a.weight": torch.zeros(2)}, str(sh / "m-00001.bin"))
    torch.save({"b.weight": torch.ones(2)}, str(sh / "m-00002.bin"))
    cp = str(tmp_path / "consolidated.bin")
    main(["consolidate", "--src", str(sh), "--out", cp])
    merged = torch.load(cp, weights_only=True)
    assert set(merged) == {"a.weight", "b.weight"}


def test_parity_check_dry_run(tmp_path, capsys):
    """tools/parity_check.py IO path proven on locally-built torch
    checkpoints (VERDICT r4 item 5c): a tiny HF CLIP dir and a tiny
    original-layout SAM .pth — config inference, conversion, both-side
    forwards and the PASS/FAIL report all execute; exit 0."""
    import torch
    from transformers import (CLIPVisionConfig, CLIPVisionModel,
                              SamConfig, SamModel)

    from haff_tpu.tools.convert_weights import hf_sam_to_original
    from haff_tpu.tools.parity_check import main

    torch.manual_seed(0)
    clip_dir = tmp_path / "clip"
    CLIPVisionModel(CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=2, image_size=64, patch_size=16,
        hidden_act="quick_gelu")).save_pretrained(str(clip_dir))

    scfg = SamConfig()
    v = scfg.vision_config
    v.hidden_size = 64
    v.num_hidden_layers = 2
    v.num_attention_heads = 1
    v.mlp_dim = 256
    v.image_size = 128
    v.patch_size = 16
    v.window_size = 4
    v.global_attn_indexes = [1]
    v.output_channels = 64
    v.num_pos_feats = 32
    scfg.prompt_encoder_config.hidden_size = 64
    scfg.prompt_encoder_config.image_size = 128
    scfg.prompt_encoder_config.patch_size = 16
    scfg.prompt_encoder_config.image_embedding_size = 8
    scfg.mask_decoder_config.hidden_size = 64
    scfg.mask_decoder_config.mlp_dim = 128
    scfg.mask_decoder_config.iou_head_hidden_dim = 64
    hf_sam = SamModel(scfg).eval()
    sam_pth = str(tmp_path / "sam_tiny.pth")
    torch.save({k: torch.tensor(val) for k, val in hf_sam_to_original(
        {k: v_.numpy() for k, v_ in hf_sam.state_dict().items()}
    ).items()}, sam_pth)

    with pytest.raises(SystemExit) as e:
        main(["--clip", str(clip_dir), "--sam", sam_pth,
              "--sam_heads", "1"])
    out = capsys.readouterr().out
    assert e.value.code == 0, out
    assert "PASS clip_tower" in out, out
    assert "SAM embedding stats" in out, out
    assert "PASS sam_image_encoder" in out, out
