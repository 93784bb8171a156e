"""2HANDS pipeline ops + end-to-end pack -> AffDataset roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from haff_tpu.data.aff_dataset import AffDataset
from haff_tpu.pipeline import ops
from haff_tpu.pipeline.orchestrate import (
    expand_taxonomy,
    filter_record,
    FrameRecord,
    mask_to_contours,
    pack_shard,
    run_pipeline,
)


def test_dilate_matches_cv2():
    import cv2

    rng = np.random.RandomState(0)
    m = (rng.rand(2, 32, 32) > 0.95).astype(np.float32)
    ours = np.asarray(ops.dilate_masks(jnp.asarray(m), 5))
    for i in range(2):
        ref = cv2.dilate(m[i].astype(np.uint8), np.ones((5, 5), np.uint8),
                         iterations=1)
        np.testing.assert_array_equal(ours[i], ref.astype(np.float32))


def test_extract_affordance_and():
    h = np.zeros((1, 8, 8)); h[0, :4] = 1
    o = np.zeros((1, 8, 8)); o[0, 2:6] = 1
    aff = np.asarray(ops.extract_affordance(jnp.asarray(h), jnp.asarray(o)))
    assert aff[0, 2:4].all() and not aff[0, :2].any() and not aff[0, 4:].any()


def test_pad_to_square_leading_edge():
    x = jnp.ones((1, 4, 6, 3))
    out = ops.pad_to_square(x)
    assert out.shape == (1, 6, 6, 3)
    assert np.asarray(out)[0, :2].sum() == 0  # padded at TOP
    x2 = jnp.ones((1, 6, 4, 3))
    out2 = ops.pad_to_square(x2)
    assert out2.shape == (1, 6, 6, 3)
    assert np.asarray(out2)[0, :, :2].sum() == 0  # padded at LEFT


def test_horizontal_flip_swaps_hands_and_taxonomy():
    img = jnp.asarray(np.arange(2 * 4 * 4 * 3, dtype=np.float32)
                      .reshape(2, 4, 4, 3))
    ml = jnp.zeros((2, 4, 4)).at[:, :, 0].set(1)
    mr = jnp.zeros((2, 4, 4))
    tax = jnp.asarray(np.array([[1, 0, 0, 0], [0, 0, 1, 0]], np.float32))
    fi, fl, fr, ft = ops.horizontal_flip_sample(img, ml, mr, tax)
    # the left mask became the (mirrored) right mask
    assert np.asarray(fr)[:, :, -1].all()
    assert np.asarray(fl).sum() == 0
    np.testing.assert_array_equal(np.asarray(ft),
                                  [[0, 1, 0, 0], [0, 0, 1, 0]])


def test_expand_taxonomy():
    assert expand_taxonomy([1, 0, 0], True, False) == [1, 0, 0, 0]
    assert expand_taxonomy([1, 0, 0], False, True) == [0, 1, 0, 0]
    assert expand_taxonomy([0, 1, 0], True, True) == [0, 0, 1, 0]


def test_contours_roundtrip():
    from haff_tpu.data.aff_dataset import rasterize_contours

    m = np.zeros((32, 32), np.uint8)
    m[5:15, 8:20] = 1
    cont = mask_to_contours(m)
    back = rasterize_contours(cont, (32, 32))
    np.testing.assert_array_equal(back, m)


def test_pipeline_end_to_end_pack_and_read(tmp_path):
    rng = np.random.RandomState(0)
    n, H, W = 6, 64, 80
    frames = rng.randint(0, 255, (n, H, W, 3), np.uint8)
    hl = np.zeros((n, H, W), np.uint8)
    hl[:, 20:35, 10:30] = 1
    hr = np.zeros((n, H, W), np.uint8)
    hr[:, 20:35, 50:70] = 1
    obj = np.zeros((n, H, W), np.uint8)
    obj[:, 25:40, 5:75] = 1
    narrations = ["open drawer"] * n
    tax3 = np.tile(np.array([[0.0, 1.0, 0.0]]), (n, 1))

    shards = run_pipeline(frames, hl, hr, obj, narrations, tax3,
                          str(tmp_path), shard_name="P99")
    assert len(shards) == 1

    ds = AffDataset(str(tmp_path), samples_per_epoch=4, seed=0)
    assert ds.size == n
    s = ds.get(0)
    assert s.mask_left.sum() > 0 and s.mask_right.sum() > 0
    assert s.taxonomy.tolist() == [0, 0, 1, 0]
    assert "open drawer" in s.question


def test_filter_rejects_bad_records():
    img = np.zeros((16, 16, 3), np.uint8)
    good = np.zeros((16, 16), np.uint8)
    good[2:10, 2:10] = 1  # 64 px
    assert filter_record(FrameRecord(inpainted=img, narration="cut onion",
                                     taxonomy=[1, 0, 0, 0], aff_left=good))
    # excluded verb
    assert not filter_record(
        FrameRecord(inpainted=img, narration="look around",
                    taxonomy=[1, 0, 0, 0], aff_left=good))
    # empty masks
    assert not filter_record(
        FrameRecord(inpainted=img, narration="cut onion",
                    taxonomy=[1, 0, 0, 0]))
    # area too small
    tiny = np.zeros((16, 16), np.uint8)
    tiny[0, :4] = 1
    assert not filter_record(
        FrameRecord(inpainted=img, narration="cut onion",
                    taxonomy=[1, 0, 0, 0], aff_left=tiny))
