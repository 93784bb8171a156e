"""2HANDS pipeline ops + end-to-end pack -> AffDataset roundtrip."""

import os
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


def test_default_propagate_tracks_moving_square():
    """Stage-2 default: a square translating 2 px/frame is tracked from
    a frame-0 seed through 8 frames (XMem-submodule analog,
    pipeline/defaults.py)."""
    from haff_tpu.pipeline.defaults import default_propagate

    n, H, W = 8, 64, 64
    frames = np.full((n, H, W, 3), 30, np.uint8)
    seed_obj = np.zeros((H, W), np.uint8)
    for t in range(n):
        y, x = 16, 8 + 2 * t
        frames[t, y:y + 16, x:x + 16] = 200
    seed_obj[16:32, 8:24] = 1
    seed_l = np.zeros((H, W), np.uint8)
    seed_l[40:48, 8:16] = 1  # static "hand" patch
    frames[:, 40:48, 8:16] = 120
    left, right, obj = default_propagate(frames, seed_l, seed_l, seed_obj)
    assert obj.shape == (n, H, W)
    # last frame: predicted object overlaps the true square well
    true = np.zeros((H, W), bool)
    true[16:32, 8 + 2 * (n - 1):24 + 2 * (n - 1)] = True
    pred = obj[-1] > 0
    inter = (pred & true).sum()
    union = (pred | true).sum()
    assert inter / max(union, 1) > 0.4, inter / max(union, 1)
    # static hand stays put
    assert left[-1, 42, 10] > 0


def test_default_inpaint_fills_from_time():
    """Stage-4 default: pixels occluded in one frame are filled from a
    frame where they are visible; never-visible pixels get diffusion."""
    from haff_tpu.pipeline.defaults import default_inpaint

    n, H, W = 4, 32, 32
    frames = np.full((n, H, W, 3), 50, np.uint8)
    frames[:, :, :, 1] = 90
    masks = np.zeros((n, H, W), np.uint8)
    # hand covers a moving strip; each pixel visible in some frame
    for t in range(n):
        masks[t, :, 8 * t // 2: 8 * t // 2 + 6] = 1
        frames[t, :, 8 * t // 2: 8 * t // 2 + 6] = 255
    out = default_inpaint(frames, masks)
    assert out.shape == frames.shape
    # occluded strip in frame 0 is filled with background, not 255
    assert abs(int(out[0, 16, 2, 0]) - 50) < 12, out[0, 16, 2]
    assert (out[np.asarray(masks) == 0] ==
            frames[np.asarray(masks) == 0]).all()


def test_run_pipeline_from_video_end_to_end(tmp_path):
    """Raw synthetic clip + frame-0 seeds -> valid shards consumed by
    AffDataset, using ONLY in-repo default stages (VERDICT item 6)."""
    from haff_tpu.pipeline.orchestrate import run_pipeline_from_video

    n, H, W = 6, 64, 64
    frames = np.full((n, H, W, 3), 40, np.uint8)
    seed_obj = np.zeros((H, W), np.uint8)
    seed_l = np.zeros((H, W), np.uint8)
    seed_r = np.zeros((H, W), np.uint8)
    frames[:, 24:40, 24:40] = 220          # static object
    seed_obj[24:40, 24:40] = 1
    frames[:, 28:36, 20:28] = 140          # left hand overlapping object
    seed_l[28:36, 20:28] = 1
    frames[:, 28:36, 36:44] = 160          # right hand overlapping object
    seed_r[28:36, 36:44] = 1

    shards = run_pipeline_from_video(
        frames, seed_l, seed_r, seed_obj, "cut onion", [0.0, 1.0, 0.0],
        str(tmp_path), shard_size=16, dilate_factor=3)
    assert shards, "no shards packed"
    ds = AffDataset(str(tmp_path), samples_per_epoch=4, seed=0)
    s = ds.get(0)
    assert s.image.shape[2] == 3
    assert (np.asarray(s.mask_left).sum() > 0
            or np.asarray(s.mask_right).sum() > 0)
    assert "cut onion" in s.question


def test_cli_video_acquisition_end_to_end(tmp_path):
    """Stage-1 acquisition analog: pipeline CLI --video decodes a raw
    clip (cv2), reads frame-0 seeds, and runs the full default pipeline
    to shards (reference analog: EPIC download + pipeline.bash stage 1
    feeding the submodule stages)."""
    import cv2

    from haff_tpu.pipeline.cli import acquire_video, main

    n, H, W = 6, 64, 64
    frames = np.full((n, H, W, 3), 40, np.uint8)
    frames[:, 24:40, 24:40] = 220
    frames[:, 28:36, 20:28] = 140
    frames[:, 28:36, 36:44] = 160
    vid_path = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                         (W, H))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()

    got = acquire_video(vid_path, stride=2)
    assert got.shape == (3, H, W, 3)

    seeds = tmp_path / "seeds"
    seeds.mkdir()
    for name, box in (("hand_left.png", (28, 36, 20, 28)),
                      ("hand_right.png", (28, 36, 36, 44)),
                      ("object.png", (24, 40, 24, 40))):
        m = np.zeros((H, W), np.uint8)
        y0, y1, x0, x1 = box
        m[y0:y1, x0:x1] = 255
        cv2.imwrite(str(seeds / name), m)
    (seeds / "annotation.json").write_text(
        '{"narration": "cut onion", "taxonomy3": [0.0, 1.0, 0.0]}')

    out = tmp_path / "out"
    main(["--video", vid_path, "--seeds_dir", str(seeds),
          "--out_dir", str(out), "--shard_size", "16", "--dilate", "3"])
    ds = AffDataset(str(out), samples_per_epoch=2, seed=0)
    s = ds.get(0)
    assert "cut onion" in s.question


def test_epic_acquisition_file_url(tmp_path):
    """download_video.bash analog: acquire_epic_video fetches the
    per-video frames tar (file:// mirror here), extracts into
    frames/<participant>/<video>/, removes the tar, and skips the
    download when the directory already exists."""
    import tarfile

    import cv2

    from haff_tpu.pipeline.acquire import (acquire_epic_video,
                                           epic_frames_url)

    # canonical URL construction (download_video.bash:9-12)
    u55 = epic_frames_url("P01", "P01_01", split="train")
    assert u55.endswith("frames_rgb_flow/rgb/train/P01/P01_01.tar")
    u100 = epic_frames_url("P01", "P01_101", epic100=True)
    assert u100.endswith("P01/rgb_frames/P01_101.tar")

    # build a tiny frames tar and serve it via file://
    src = tmp_path / "srv"
    src.mkdir()
    for i in range(3):
        img = np.full((32, 48, 3), 10 * (i + 1), np.uint8)
        cv2.imwrite(str(src / f"frame_{i:010d}.jpg"), img)
    tar_p = src / "P07_03.tar"
    with tarfile.open(tar_p, "w") as tf:
        for i in range(3):
            tf.add(str(src / f"frame_{i:010d}.jpg"),
                   arcname=f"frame_{i:010d}.jpg")

    data_dir = tmp_path / "EPIC_DATA"
    frames_dir = acquire_epic_video(
        str(data_dir), "P07", "P07_03", base_url=src.as_uri())
    files = sorted(os.listdir(frames_dir))
    assert files == [f"frame_{i:010d}.jpg" for i in range(3)]
    assert not os.path.exists(
        os.path.join(str(data_dir), "frames", "P07", "P07_03.tar"))

    # second call: directory exists -> no download (dead URL is fine)
    again = acquire_epic_video(str(data_dir), "P07", "P07_03",
                               base_url="file:///nonexistent")
    assert again == frames_dir


def test_cli_epic_seeded_end_to_end(tmp_path):
    """--epic with --seeds_dir: acquisition (file:// mirror) continues
    into the seeded default pipeline and packs shards."""
    import tarfile

    import cv2

    from haff_tpu.pipeline.cli import main

    H, W = 64, 64
    src = tmp_path / "srv"
    src.mkdir()
    for i in range(4):
        img = np.full((H, W, 3), 40, np.uint8)
        img[24:40, 24:40] = 220
        img[28:36, 20:28] = 140
        img[28:36, 36:44] = 160
        cv2.imwrite(str(src / f"frame_{i:010d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    with tarfile.open(src / "P07_04.tar", "w") as tf:
        for i in range(4):
            tf.add(str(src / f"frame_{i:010d}.jpg"),
                   arcname=f"frame_{i:010d}.jpg")

    seeds = tmp_path / "seeds"
    seeds.mkdir()
    for name, box in (("hand_left.png", (28, 36, 20, 28)),
                      ("hand_right.png", (28, 36, 36, 44)),
                      ("object.png", (24, 40, 24, 40))):
        m = np.zeros((H, W), np.uint8)
        y0, y1, x0, x1 = box
        m[y0:y1, x0:x1] = 255
        cv2.imwrite(str(seeds / name), m)
    (seeds / "annotation.json").write_text(
        '{"narration": "peel carrot", "taxonomy3": [0.0, 1.0, 0.0]}')

    out = tmp_path / "out"
    main(["--epic", "P07", "P07_04", "--data_dir",
          str(tmp_path / "EPIC_DATA"), "--epic_base_url", src.as_uri(),
          "--seeds_dir", str(seeds), "--out_dir", str(out),
          "--shard_size", "16", "--dilate", "3"])
    ds = AffDataset(str(out), samples_per_epoch=2, seed=0)
    s = ds.get(0)
    assert "peel carrot" in s.question
