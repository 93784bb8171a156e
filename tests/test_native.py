"""Native C++ host data-path vs the Python/cv2 reference."""

import numpy as np
import pytest

from haff_tpu.data import native
from haff_tpu.data.transforms import mask_to_canvas, sam_preprocess

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_sam_preprocess_matches_cv2():
    from haff_tpu.nn.sam import PIXEL_MEAN, PIXEL_STD

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    ref, resize_ref = sam_preprocess(img, 256)
    out, resize = native.sam_preprocess_native(img, 256, PIXEL_MEAN,
                                               PIXEL_STD)
    assert tuple(resize) == tuple(resize_ref)
    # cv2 INTER_LINEAR uses fixed-point arithmetic; allow 2 LSB of the
    # uint8 scale (2/58 after normalization).
    diff = np.abs(out - ref)
    assert diff.max() < 2.5 / 57.0, diff.max()
    # padded region identical (exactly zero)
    np.testing.assert_array_equal(out[resize[0]:], ref[resize_ref[0]:])


def test_clip_preprocess_matches_pil():
    from haff_tpu.nn.clip_vit import CLIP_MEAN, CLIP_STD
    from haff_tpu.data.transforms import clip_preprocess

    rng = np.random.RandomState(3)
    # PIL resamples in fixed point (22-bit coefficients, per-pass uint8
    # rounding); the native float path may differ by 1 LSB of the uint8
    # scale after normalization (std ~0.26 -> 1/255/0.26 ~ 0.015).
    tol = 1.5 / 255.0 / 0.26
    # upscale
    small = rng.randint(0, 255, (50, 70, 3), np.uint8)
    ref = clip_preprocess(small, 96)
    out = native.clip_preprocess_native(small, 96, CLIP_MEAN, CLIP_STD)
    assert np.abs(out - ref).max() < tol, np.abs(out - ref).max()
    # downscale (PIL widens filter support; native reproduces it)
    big = rng.randint(0, 255, (300, 400, 3), np.uint8)
    ref = clip_preprocess(big, 96)
    out = native.clip_preprocess_native(big, 96, CLIP_MEAN, CLIP_STD)
    assert np.abs(out - ref).max() < tol, np.abs(out - ref).max()


def test_env_dispatch_selects_native_clip(monkeypatch):
    from haff_tpu.nn.clip_vit import CLIP_MEAN, CLIP_STD
    from haff_tpu.data.transforms import clip_preprocess

    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (80, 120, 3), np.uint8)
    monkeypatch.setenv("HAFF_NATIVE_PREPROCESS", "1")
    out = clip_preprocess(img, 64)
    ref = native.clip_preprocess_native(img, 64, CLIP_MEAN, CLIP_STD)
    np.testing.assert_array_equal(out, ref)


def test_mask_to_canvas_matches_cv2():
    rng = np.random.RandomState(1)
    mask = (rng.rand(60, 90) > 0.6).astype(np.uint8)
    ref = mask_to_canvas(mask, (128, 192), 192)
    out = native.mask_to_canvas_native(mask, (128, 192), 192)
    # nearest-neighbour index conventions may differ by <=1 source px on
    # exact-boundary samples; demand >=99% agreement and exact padding
    agree = (out == ref).mean()
    assert agree > 0.99, agree
    np.testing.assert_array_equal(out[128:], ref[128:])


def test_fill_polygon_convex():
    pts = np.array([[4, 4], [4, 20], [20, 20], [20, 4]], np.int32)
    out = native.fill_polygon_native(pts, (32, 32))
    assert out[10, 10] == 1 and out[2, 2] == 0
    # interior area approximately (20-4)^2
    assert abs(int(out.sum()) - 16 * 16) <= 2 * 16 + 4


def test_env_dispatch_selects_native(monkeypatch):
    from haff_tpu.nn.sam import PIXEL_MEAN, PIXEL_STD

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (90, 140, 3), np.uint8)
    monkeypatch.setenv("HAFF_NATIVE_PREPROCESS", "1")
    out, hw = sam_preprocess(img, 256)
    ref, hw2 = native.sam_preprocess_native(img, 256, PIXEL_MEAN, PIXEL_STD)
    assert tuple(hw) == tuple(hw2)
    np.testing.assert_array_equal(out, ref)
