"""End-to-end CLI smoke tests on the tiny preset (synthetic data)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def synth_data(tmp_path):
    """Synthetic shards + benchmark folder."""
    import cv2
    import h5py

    # --- training shards ---
    droot = tmp_path / "shards"
    (droot / "h5").mkdir(parents=True)
    (droot / "jsons").mkdir()
    n = 4
    with h5py.File(droot / "h5" / "0-3_P01.h5", "w") as f:
        g = f.create_group("data")
        g.create_dataset("inpainted",
                         data=np.random.RandomState(0).randint(
                             0, 255, (n, 64, 80, 3), np.uint8))
        g.create_dataset("narration",
                         data=np.array([b"open drawer"] * n))
        tax = np.zeros((n, 4), np.float32)
        tax[:, 1] = 1
        g.create_dataset("taxonomy", data=tax)
    entries = {
        str(i): {"original_size": [64, 80],
                 "aff_left": [],
                 "aff_right": [[[[30, 20]], [[30, 40]], [[50, 40]],
                                [[50, 20]]]]}
        for i in range(n)}
    (droot / "jsons" / "0-3_P01.json").write_text(json.dumps(entries))

    # --- benchmark dir ---
    broot = tmp_path / "bench"
    fdir = broot / "P01_101" / "0000123"
    fdir.mkdir(parents=True)
    img = (np.random.RandomState(1).rand(64, 80, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(fdir / "inpainting.png"), img)
    gt = np.zeros((64, 80), np.uint8)
    gt[20:40, 30:50] = 255
    cv2.imwrite(str(fdir / "aff_right.png"), gt)
    (fdir / "annotation.json").write_text(
        json.dumps({"narration": "open drawer", "taxonomy": [0, 1, 0, 0]}))
    return str(droot), str(broot)


def test_train_cli_micro_run(synth_data, tmp_path):
    from haff_tpu.train.cli import main

    shards, bench = synth_data
    main([
        "--dataset_dir", shards, "--val_benchmark_dir", bench,
        "--model_preset", "tiny", "--epochs", "1", "--steps_per_epoch",
        "2", "--batch_size", "2", "--grad_accum", "1", "--lr", "1e-3",
        "--warmup_steps", "0", "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "t",
        "--print_freq", "1", "--no_remat", "--val_batch_size", "2",
    ])
    ckpt = tmp_path / "runs" / "t" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())


def test_infer_cli_and_benchmark_eval(synth_data, tmp_path):
    from haff_tpu.eval.benchmark import main as eval_main
    from haff_tpu.infer.cli import main as infer_main

    _, bench = synth_data
    vis = str(tmp_path / "vis")
    infer_main([
        "--benchmark_dir", bench, "--vis_save_path", vis,
        "--model_preset", "tiny", "--batch", "2", "--max_new_tokens", "4",
        "--max_text_len", "448", "--precision", "fp32",
        "--thresholds", "0.3", "0.5",
    ])
    out = tmp_path / "vis0.5" / "P01_101" / "0000123"
    # the taxonomy-gated-off side's file is NOT written (reference
    # inference.py layout); at least one side must exist
    assert (out / "aff_left.png").exists() or \
        (out / "aff_right.png").exists()

    # benchmark evaluator over the produced folder (map mode)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main(["--benchmark_dir", bench, "--comparison_dir", vis,
                   "--map", "--thresholds", "0.3", "0.5", "--cropped"])
    result = json.loads(buf.getvalue())
    assert "map_precision" in result
    assert "0.5" in map(str, result["per_threshold"])
    assert result["best_threshold"] is not None


def test_train_cli_pp_micro_run(synth_data, tmp_path):
    """--pp 2: the full train CLI with the decoder pipelined over the
    mesh's pipe axis (8 virtual devices -> data=4, pipe=2)."""
    from haff_tpu.train.cli import main

    shards, bench = synth_data
    main([
        "--dataset_dir", shards, "--val_benchmark_dir", bench,
        "--model_preset", "tiny", "--epochs", "1", "--steps_per_epoch",
        "2", "--batch_size", "4", "--grad_accum", "1", "--lr", "1e-3",
        "--warmup_steps", "0", "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "tpp",
        "--print_freq", "1", "--no_remat", "--val_batch_size", "2",
        "--pp", "2",
    ])
    ckpt = tmp_path / "runs" / "tpp" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())


def test_train_cli_moe_ep_micro_run(synth_data, tmp_path):
    """--moe_experts 2 --ep 2: MoE decoder MLPs trained with the expert
    weights sharded over the mesh's expert axis (8 virtual devices ->
    data=4, expert=2)."""
    from haff_tpu.train.cli import main

    shards, bench = synth_data
    main([
        "--dataset_dir", shards, "--val_benchmark_dir", bench,
        "--model_preset", "tiny", "--epochs", "1", "--steps_per_epoch",
        "2", "--batch_size", "4", "--grad_accum", "1", "--lr", "1e-3",
        "--warmup_steps", "0", "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "tmoe",
        "--print_freq", "1", "--no_remat", "--val_batch_size", "2",
        "--moe_experts", "2", "--moe_top_k", "1", "--ep", "2",
    ])
    ckpt = tmp_path / "runs" / "tmoe" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())


def test_train_cli_ep_requires_moe():
    from haff_tpu.train.cli import main
    import pytest

    with pytest.raises(SystemExit):
        main(["--dataset_dir", "/nonexistent", "--ep", "2",
              "--model_preset", "tiny"])


def test_train_cli_pp_rejects_sp():
    from haff_tpu.train.cli import main
    import pytest

    with pytest.raises(SystemExit):
        main(["--dataset_dir", "/nonexistent", "--pp", "2", "--sp", "2",
              "--model_preset", "tiny"])


def test_train_cli_hybrid_mix(synth_data, tmp_path):
    """--dataset affordance||reason_seg with sample_rates drives the
    HybridDataset mixing path (reference train_ds.py --dataset /
    --sample_rates surface)."""
    import cv2
    import json as _json

    from haff_tpu.train.cli import main

    shards, bench = synth_data
    # tiny ReasonSeg corpus: one jpg + polygon json
    rdir = tmp_path / "reason" / "train"
    rdir.mkdir(parents=True)
    img = (np.random.RandomState(2).rand(48, 64, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(rdir / "a.jpg"), img)
    (rdir / "a.json").write_text(_json.dumps({
        "text": "the mug handle",
        "is_sentence": False,
        "shapes": [{"label": "target",
                    "points": [[10, 10], [40, 10], [40, 30], [10, 30]]}],
    }))
    main([
        "--dataset_dir", shards,
        "--dataset", "affordance||reason_seg",
        "--sample_rates", "2,1",
        "--reason_seg_data", str(tmp_path / "reason"),
        "--model_preset", "tiny", "--epochs", "1", "--steps_per_epoch",
        "2", "--batch_size", "2", "--grad_accum", "1", "--lr", "1e-3",
        "--warmup_steps", "0", "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "h",
        "--print_freq", "1", "--no_remat",
    ])
    ckpt = tmp_path / "runs" / "h" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())


def test_train_cli_eval_only(synth_data, tmp_path):
    from haff_tpu.train.cli import main

    shards, bench = synth_data
    main([
        "--dataset_dir", shards, "--val_benchmark_dir", bench,
        "--model_preset", "tiny", "--eval_only",
        "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "e",
        "--no_remat",
    ])
    # no training happened -> no checkpoint written
    assert not (tmp_path / "runs" / "e" / "ckpt_model").exists()


def test_partition_params_exclude_mask_decoder():
    from haff_tpu.train.trainer import partition_params

    params = {
        "visual_model": {"mask_decoder_left": {"w": 1},
                         "mask_decoder_right": {"w": 2},
                         "image_encoder": {"w": 3}},
        "llm": {"lora_a": {"w": 4}, "o_proj": {"w": 5}},
    }
    train, frozen = partition_params(
        params, exclude=("mask_decoder_left", "mask_decoder_right"))
    from flax import traverse_util
    tkeys = set(traverse_util.flatten_dict(train))
    assert ("llm", "lora_a", "w") in tkeys
    assert not any("mask_decoder" in "/".join(k) for k in tkeys)
    fkeys = set(traverse_util.flatten_dict(frozen))
    assert ("visual_model", "mask_decoder_left", "w") in fkeys


def test_train_cli_qlora_with_validation(synth_data, tmp_path):
    """--load_in_8bit + validation: the merged eval params carry int8
    kernels and must be dequantized inside evaluate (regression: raw
    int8 values were used as weights, corrupting val metrics)."""
    from haff_tpu.train.cli import main

    shards, bench = synth_data
    main([
        "--dataset_dir", shards, "--val_benchmark_dir", bench,
        "--model_preset", "tiny", "--epochs", "1", "--steps_per_epoch",
        "1", "--batch_size", "2", "--grad_accum", "1", "--lr", "1e-3",
        "--warmup_steps", "0", "--model_max_length", "448",
        "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "q",
        "--print_freq", "1", "--no_remat", "--load_in_8bit",
    ])
    ckpt = tmp_path / "runs" / "q" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())


def test_train_cli_preemption_checkpoint(synth_data, tmp_path, capsys):
    """SIGTERM mid-epoch: the trainer finishes the in-flight step, writes
    a checkpoint and returns cleanly (TPU-pod preemption handling; the
    reference DeepSpeed run dies and loses the epoch)."""
    import os as _os

    from haff_tpu.train.cli import main

    shards, bench = synth_data
    _os.environ["HAFF_TEST_PREEMPT_STEP"] = "1"
    try:
        main([
            "--dataset_dir", shards, "--val_benchmark_dir", bench,
            "--model_preset", "tiny", "--epochs", "1",
            "--steps_per_epoch", "50", "--batch_size", "2",
            "--grad_accum", "1", "--lr", "1e-3", "--warmup_steps", "0",
            "--model_max_length", "448",
            "--log_base_dir", str(tmp_path / "runs"), "--exp_name", "p",
            "--print_freq", "1", "--no_remat", "--no_eval",
        ])
    finally:
        _os.environ.pop("HAFF_TEST_PREEMPT_STEP", None)
    out = capsys.readouterr().out
    assert "preemption checkpoint" in out
    ckpt = tmp_path / "runs" / "p" / "ckpt_model"
    assert ckpt.is_dir() and any(ckpt.iterdir())
