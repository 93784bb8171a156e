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
