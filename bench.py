"""Benchmark: single-frame bimanual affordance mask path, frames/sec/chip.

Measures the latency-dominating compute of the reference's inference
(SURVEY.md section 3.3: get_visual_embs — SAM ViT-H over 1024x1024 —
dominates single-frame latency, followed by the dual prompted mask
decode). Batched bf16 on one chip: FULL SAM ViT-H encoder (32 blocks,
embed 1280, windowed attention + 4 global layers with decomposed rel-pos
bias) + prompt encode + BOTH mask decoders + taxonomy head + canvas
upsample.

Baseline: the reference publishes no numbers (BASELINE.md). The A100
anchor used for vs_baseline is 10 frames/s for the same mask path
(fp16 SAM ViT-H encoder ~95ms/frame on A100 per the SAM paper's
reported timings, plus the dual decoder at ~3ms), stated here so the
comparison is reproducible and auditable.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_FPS = 10.0


def build(batch: int, int8: bool = False):
    from haff_tpu.core.config import ModelConfig
    from haff_tpu.model.lisa import LisaModel  # noqa: F401  (import check)
    from haff_tpu.nn.sam import Sam, postprocess_masks_padded

    cfg = ModelConfig.preset("7b")  # SAM ViT-H + full decoder config
    model = Sam(encoder_cfg=cfg.sam_encoder, decoder_cfg=cfg.sam_decoder,
                dtype=jnp.bfloat16)
    S = cfg.sam_encoder.image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, S, S, 3).astype(np.float32))
    text = jnp.asarray(
        rng.randn(batch, 1, cfg.sam_decoder.prompt_embed_dim)
        .astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, text)
    if int8:
        # W8A8 on the WINDOWED blocks' transformer matmuls (the win is
        # halved weight HBM traffic, not MXU rate — tools/mxu_bench.py;
        # global blocks stay bf16, where int8 measured slower).
        # Accuracy-gated by tests/test_quant.py (encoder delta) and the
        # AMG/predictor IoU tests. Analog of the reference's bnb 8-bit
        # serving (inference.py:133-156), applied to the encoder where
        # the TPU mask-path FLOPs actually are.
        from haff_tpu.nn.quant import (quantize_dense_tree,
                                       sam_encoder_predicate)

        def q(p):
            inner = dict(p["params"])
            inner["image_encoder"] = quantize_dense_tree(
                inner["image_encoder"], sam_encoder_predicate)
            return {"params": inner}

        params = jax.jit(q)(params)

    @jax.jit
    def mask_path(params, images, text):
        masks_l, masks_r, iou_l, iou_r, tax = model.apply(
            params, images, text)
        return (postprocess_masks_padded(masks_l, S),
                postprocess_masks_padded(masks_r, S), tax)

    return mask_path, params, images, text


def _sync(out):
    # NOTE: under the axon tunnel block_until_ready returns early; a host
    # readback is the only reliable sync (verified: chained-matmul probe
    # reads 118 TFLOP/s with readback vs an impossible 49 PFLOP/s with
    # block_until_ready alone).
    return float(np.asarray(out[2]).sum())


def run(batch: int, iters: int = 10, int8: bool = False):
    fn, params, images, text = build(batch, int8=int8)
    _sync(fn(params, images, text))  # compile
    _sync(fn(params, images, text))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, images, text)
    _sync(out)  # device streams execute in order: last-result readback
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _backend_ready(tries: int = 3, probe_timeout: int = 600,
                   code: str = None) -> bool:
    """Probe the accelerator in a killable subprocess.

    A wedged tunnel makes backend init HANG (not raise), which under the
    driver would stall the whole bench run indefinitely. Bound it: a few
    subprocess probes (each killed after probe_timeout) before giving up.
    """
    import subprocess
    if code is None:
        code = ("import jax, jax.numpy as jnp; "
                "assert float(jnp.ones((8,128)).sum()) == 1024.0; "
                "print('ok')")
    for i in range(tries):
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            if p.returncode == 0 and "ok" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# backend probe {i + 1}/{tries} failed", file=sys.stderr)
    return False


def main():
    if not _backend_ready():
        print(json.dumps(dict(metric="affordance_mask_frames_per_sec_chip",
                              value=0.0, unit="frames/s", vs_baseline=0.0)))
        return
    int8 = "--bf16" not in sys.argv  # int8 W8A8 encoder is the default
    fps = None
    # 32 measured best with the lpad window kernel (20.12 vs 19.47 @ 24,
    # 19.42 @ 48; 32 frames x 25 windows = 800 = exact group-8 multiple).
    for batch in (32, 24, 16, 8, 4, 2, 1):
        # The remote compile helper fails intermittently (opaque HTTP 500);
        # retry each batch size once before shrinking.
        for attempt in range(2):
            try:
                fps = run(batch, int8=int8)
                break
            except Exception as e:  # flaky compile / OOM -> retry, shrink
                print(f"# batch {batch} attempt {attempt} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
                fps = None
                msg = str(e)
                # bail ONLY on backend-init failure (dead tunnel/device);
                # transient compile errors also carry UNAVAILABLE and
                # must keep the retry/shrink path
                if "Unable to initialize backend" in msg:
                    # dead accelerator/tunnel: each retry waits out the
                    # full claim timeout (~25 min observed) — bail with
                    # the failure JSON instead of burning hours.
                    print(json.dumps(dict(
                        metric="affordance_mask_frames_per_sec_chip",
                        value=0.0, unit="frames/s", vs_baseline=0.0)))
                    return
        if fps is not None:
            break
    if fps is None:
        print(json.dumps(dict(metric="affordance_mask_frames_per_sec_chip",
                              value=0.0, unit="frames/s",
                              vs_baseline=0.0)))
        return
    print(json.dumps(dict(
        metric="affordance_mask_frames_per_sec_chip",
        value=round(fps, 3),
        unit="frames/s",
        vs_baseline=round(fps / A100_BASELINE_FPS, 3))))


if __name__ == "__main__":
    main()
