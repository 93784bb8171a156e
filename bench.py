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

Driver contract: prints JSON lines {"metric", "value", "unit",
"vs_baseline"}; the LAST line wins. Structured for a hard wall budget:
  - a watchdog thread guarantees a parseable line and process exit by
    HAFF_BENCH_DEADLINE_SECS (default 460s) even if the device claim or
    a compile hangs (the axon tunnel has been observed to wedge);
  - the JAX persistent compilation cache (.jax_cache/) makes repeat
    runs skip the ViT-H compiles;
  - the first successful batch measurement is printed immediately and
    then overwritten by better numbers — partial success beats silence.
"""

import json
import os
import sys
import threading
import time

START = time.monotonic()
DEADLINE = float(os.environ.get("HAFF_BENCH_DEADLINE_SECS", "460"))
METRIC = "affordance_mask_frames_per_sec_chip"
A100_BASELINE_FPS = 10.0

# Persistent compile cache: repeat driver runs must not pay the ViT-H
# compile again (VERDICT r2 item 1). Set via env BEFORE importing jax so
# the backend picks it up regardless of init order.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_best_lock = threading.Lock()
_best_fps = None  # None = nothing measured yet
_best_extra: dict = {}   # batch/tflops/mfu fields of the best run
_e2e_fields: dict = {}   # e2e leg fields, merged into the final line
_run_inflight = False  # a run() is mid-measurement (watchdog grace)


def _emit(fps: float, extra: dict = None) -> None:
    rec = dict(
        metric=METRIC,
        value=round(fps, 3),
        unit="frames/s",
        vs_baseline=round(fps / A100_BASELINE_FPS, 3),
        status="ok" if fps > 0 else "no_measurement")
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def _record(fps: float, extra: dict = None) -> None:
    global _best_fps, _best_extra
    with _best_lock:
        if _best_fps is None or fps > _best_fps:
            _best_fps = fps
            _best_extra = dict(extra or {})
        _emit(_best_fps, {**_best_extra, **_e2e_fields})
    try:
        from haff_tpu.utils.bench_cache import store

        store("headline", dict(value=round(_best_fps, 3), **_best_extra))
    except Exception:
        pass


def _remaining() -> float:
    return DEADLINE - (time.monotonic() - START)


def _watchdog() -> None:
    """Guarantee a parseable line + exit by the deadline.

    The device claim and first compile are unbounded under a wedged
    tunnel; this thread is the only exit path in that case.
    """
    while True:
        left = _remaining()
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    # Grace period: if a measurement is in flight and nothing is on the
    # board yet, a short wait can turn a benchmark zero into a real
    # number (ADVICE r3: the hard exit could kill a better batch mid-run
    # — acceptable once SOMETHING is measured, not before).
    grace_end = time.monotonic() + 30.0
    while (_run_inflight and _best_fps is None
           and time.monotonic() < grace_end):
        time.sleep(2.0)
    # Deadline path: a leg (observed: the e2e build after the headline)
    # can hang on a wedged tunnel compile and never reach main()'s
    # trailing _merge_cached_legs — merge the same-code cached legs HERE
    # so the final artifact line still carries e2e/p50/train fields.
    _merge_cached_legs(headline_too=True)
    with _best_lock:
        failed = _best_fps is None
        if failed:
            _emit(0.0)
    sys.stdout.flush()
    sys.stderr.flush()
    # rc=1 distinguishes "infrastructure failure, nothing measured" from
    # a measured result for the driver (ADVICE r3).
    os._exit(1 if failed else 0)


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
        # W8A8 on ALL encoder blocks' transformer matmuls (the win is
        # halved weight HBM traffic, not MXU rate — tools/mxu_bench.py).
        # With the natural-layout global kernel the old "int8 global
        # blocks slower" result inverted (17.0 vs 18.3 ms/layer b8,
        # round 3), so sam_encoder_predicate now quantizes the global
        # blocks too. Accuracy-gated by tests/test_quant.py (encoder
        # delta) and the AMG/predictor IoU tests. Analog of the
        # reference's bnb 8-bit serving (inference.py:133-156), applied
        # to the encoder where the TPU mask-path FLOPs actually are.
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
    global _run_inflight
    fn, params, images, text = build(batch, int8=int8)
    # AOT compile: the SAME executable serves measurement and XLA's
    # cost_analysis, so the MFU fields (VERDICT r4 item 4) cost no
    # second compile through the tunnel.
    from haff_tpu.utils.flops import aot_with_flops, mfu_fields

    compiled, flops = aot_with_flops(fn, params, images, text)
    _sync(compiled(params, images, text))  # compile (jit path) / warm
    _sync(compiled(params, images, text))  # warm
    _run_inflight = True
    try:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(params, images, text)
        _sync(out)  # device streams execute in order: last-result readback
        dt = time.perf_counter() - t0
    finally:
        _run_inflight = False
    fps = batch * iters / dt
    extra = dict(batch=batch, **mfu_fields(flops, iters / dt))
    return fps, extra


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    int8 = "--bf16" not in sys.argv  # int8 W8A8 encoder is the default
    # Claim the device ONCE, in-process; the watchdog bounds a hang.
    t0 = time.monotonic()
    try:
        assert float(jnp.ones((8, 128)).sum()) == 1024.0
    except Exception as e:
        print(f"# backend claim failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
        _emit(0.0)
        sys.exit(1)
    print(f"# backend ready in {time.monotonic() - t0:.1f}s "
          f"({_remaining():.0f}s left)", file=sys.stderr, flush=True)
    # Batch 32 FIRST (the certified-best headline config: 22.7 fps r4 vs
    # 21.3 @ 8/48; 32 frames x 25 windows = 800 = exact group-8
    # multiple) so the remaining budget goes to the e2e/p50 legs instead
    # of a warm-up batch. The tail is a shrink ladder that only runs if
    # NOTHING measured yet (flaky remote compiles / smaller-memory
    # devices): a small real number beats a benchmark zero.
    plan = [(32, 10), (8, 6), (4, 6), (2, 6), (1, 4)]
    for batch, iters in plan:
        if _best_fps is not None:
            break  # headline on the board -> spend the rest on e2e/p50
        # The remote compile helper fails intermittently (opaque HTTP
        # 500); retry each batch size once.
        for attempt in range(2):
            try:
                t0 = time.monotonic()
                fps, extra = run(batch, iters=iters, int8=int8)
                print(f"# batch {batch}: {fps:.2f} fps {extra} "
                      f"({time.monotonic() - t0:.0f}s incl compile, "
                      f"{_remaining():.0f}s left)",
                      file=sys.stderr, flush=True)
                _record(fps, extra)
                break
            except Exception as e:
                print(f"# batch {batch} attempt {attempt} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr, flush=True)
                if "Unable to initialize backend" in str(e):
                    # dead accelerator mid-run: emit what we have
                    if _best_fps is None:
                        _merge_cached_legs(headline_too=True)
                        if _best_fps is None:
                            _emit(0.0)
                            sys.exit(1)
                    return
    if _best_fps is None:
        # Nothing measured fresh: a cached same-code measurement (taken
        # during the round) still beats a benchmark zero.
        _merge_cached_legs(headline_too=True)
        if _best_fps is None:
            _emit(0.0)
            sys.exit(1)
        return
    # e2e + p50 legs (VERDICT r5 item 2: the BENCH artifact must carry
    # e2e_fps/e2e_mfu_pct AND the BASELINE north-star p50_ms): flagship
    # 7B int8+int8KV. Measured fresh when the watchdog budget allows;
    # otherwise merged from the same-code sidecar cache (see
    # haff_tpu/utils/bench_cache.py) with an explicit _source marker.
    if "--no_e2e" not in sys.argv:
        if _remaining() > 170:
            _measure_e2e()
        if _remaining() > 150:
            _measure_p50()
    _merge_cached_legs()


def _measure_e2e() -> None:
    try:
        import bench_e2e

        print(f"# e2e leg: building ({_remaining():.0f}s left)",
              file=sys.stderr, flush=True)
        # prompt_len 256: the REAL prompt length (ByteTokenizer p95 over
        # the benchmark corpus = 257 tokens, ROUND_NOTES r4; 320 was a
        # synthetic pad). Measured r5 ladder at this length: b8 8.6 /
        # b16 8.83 / b32 9.14 fps vs 7.57 at the padded 320.
        run_e2e, meta = bench_e2e.build(
            "7b", batch=8, prompt_len=256, load_in_8bit=True,
            kv_cache_8bit=True)
        print(f"# e2e leg: built, compiling/warming "
              f"({_remaining():.0f}s left)", file=sys.stderr, flush=True)
        run_e2e()  # compile
        run_e2e()  # warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            run_e2e()
        dt = time.perf_counter() - t0
        from haff_tpu.utils.bench_cache import store
        from haff_tpu.utils.flops import mfu_fields

        e2e_fps = 8 * iters / dt
        fields = dict(
            e2e_fps=round(e2e_fps, 3), e2e_prompt_len=256,
            **mfu_fields(meta.get("flops_per_call"), iters / dt,
                         prefix="e2e_"))
        store("e2e", fields)
        with _best_lock:
            _e2e_fields.update(fields)
            _emit(_best_fps, {**_best_extra, **_e2e_fields})
        print(f"# e2e: {e2e_fps:.2f} fps {fields}",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# e2e leg failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)


def _measure_p50() -> None:
    try:
        import bench_e2e

        run1, _ = bench_e2e.build(
            "7b", batch=1, prompt_len=256, load_in_8bit=True,
            kv_cache_8bit=True)
        run1()  # compile
        run1()  # warm
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            run1()
            times.append((time.perf_counter() - t0) * 1000)
        from haff_tpu.utils.bench_cache import store

        p50 = float(np.percentile(times, 50))
        fields = dict(p50_ms=round(p50, 1), p50_prompt_len=256)
        store("p50", fields)
        with _best_lock:
            _e2e_fields.update(fields)
            _emit(_best_fps, {**_best_extra, **_e2e_fields})
        print(f"# p50: {p50:.1f} ms", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# p50 leg failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)


def _merge_cached_legs(headline_too: bool = False) -> None:
    """Fill legs that did not fit the budget from the same-code sidecar
    cache, marked `<leg>_source: "cached"`. Fresh numbers always win."""
    global _best_fps, _best_extra
    try:
        from haff_tpu.utils.bench_cache import load
    except Exception:
        return
    changed = False
    with _best_lock:
        if headline_too and _best_fps is None:
            cached = load("headline")
            if cached:
                cached = dict(cached)
                _best_fps = cached.pop("value")
                _best_extra = {**cached, "headline_source": "cached"}
                changed = True
        for leg, probe in (("e2e", "e2e_fps"), ("p50", "p50_ms"),
                           ("train", "train_samples_per_sec"),
                           ("e2e_best", "e2e_best_fps"),
                           ("spec", "spec_fps")):
            if probe not in _e2e_fields:
                cached = load(leg)
                if cached:
                    _e2e_fields.update(cached)
                    _e2e_fields[f"{leg}_source"] = "cached"
                    changed = True
        if changed and _best_fps is not None:
            _emit(_best_fps, {**_best_extra, **_e2e_fields})


if __name__ == "__main__":
    main()
