"""On-chip kernel numerics audit.

Interpret-mode tests CANNOT catch compiled-kernel bugs (a pltpu.repeat
semantics mismatch produced exactly such a bug in round 1); this script
re-validates every Pallas kernel against its XLA reference ON THE REAL
BACKEND. Run after any kernel change:

    python -m haff_tpu.tools.onchip_audit
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ..kernels.flash_attention import flash_attention, mha_reference
    from ..kernels.sam_attention import _fused_fwd, sam_window_attention
    from ..nn.sam_image_encoder import decomposed_rel_pos_bias

    interpret = jax.default_backend() != "tpu"
    print(f"backend: {jax.default_backend()} "
          f"({'interpret' if interpret else 'compiled'} kernels)")
    rng = np.random.RandomState(0)
    failures = []

    def check(name, a, b, tol):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
        ok = d < tol
        print(f"{'PASS' if ok else 'FAIL'} {name}: max abs diff {d:.2e}")
        if not ok:
            failures.append(name)

    # --- flash attention ---
    B, L, H, D = 2, 256, 4, 128
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    seg = np.ones((B, L), np.int32)
    seg[0, 200:] = 0
    seg = jnp.asarray(seg)
    for name, kw in [("flash/plain", {}), ("flash/causal", dict(causal=True)),
                     ("flash/causal+seg",
                      dict(causal=True, q_segment_ids=seg,
                           kv_segment_ids=seg))]:
        check(name, flash_attention(q, k, v, **kw),
              mha_reference(q, k, v, **kw), 2e-2)

    g1 = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(mha_reference(
        q, k, v, causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g1, g2, "qkv"):
        check(f"flash/bwd d{n}", a, b, 1e-1)

    # --- fused SAM global attention ---
    Hs = Ws = 16
    Lq, nh, d = Hs * Ws, 2, 32
    qs = jnp.asarray(rng.randn(2, Lq, nh, d).astype(np.float32) * 0.2)
    ks = jnp.asarray(rng.randn(2, Lq, nh, d).astype(np.float32) * 0.2)
    vs = jnp.asarray(rng.randn(2, Lq, nh, d).astype(np.float32))
    rel_h = jnp.asarray(rng.randn(2 * Hs - 1, d).astype(np.float32) * 0.2)
    rel_w = jnp.asarray(rng.randn(2 * Ws - 1, d).astype(np.float32) * 0.2)
    scale = d ** -0.5
    ours = _fused_fwd(qs, ks, vs, rel_h, rel_w, (Hs, Ws), scale, 128,
                      interpret, 8)
    bias = decomposed_rel_pos_bias(qs, rel_h, rel_w, (Hs, Ws), (Hs, Ws))
    check("sam_global/fwd", ours,
          mha_reference(qs, ks, vs, bias=bias, sm_scale=scale), 5e-3)

    # --- window kernel (optional path) ---
    wh = ww = 14
    Lw = wh * ww
    qw = jnp.asarray(rng.randn(4, Lw, nh, d).astype(np.float32) * 0.2)
    rel_hw = jnp.asarray(rng.randn(2 * wh - 1, d).astype(np.float32) * 0.2)
    try:
        ours = sam_window_attention(qw, qw, qw, rel_hw, rel_hw, (wh, ww))
        ref = sam_window_attention(qw, qw, qw, rel_hw, rel_hw, (wh, ww),
                                   force_xla=True)
        check("sam_window/fwd", ours, ref, 5e-3)
    except Exception as e:
        print(f"SKIP sam_window (compile): {type(e).__name__}")

    # --- flash-decode attention (fp + int8 cache) ---
    from ..kernels.decode_attention import _xla_path, flash_decode_attention
    from ..nn.quant import quantize_activation

    bd, lmax, nhd, nkvd, hdd = 2, 2048, 8, 4, 128
    qd = jnp.asarray(rng.randn(bd, nhd, hdd).astype(np.float32) * 0.3)
    kd = jnp.asarray(rng.randn(bd, lmax, nkvd, hdd).astype(np.float32) * 0.3)
    vd = jnp.asarray(rng.randn(bd, lmax, nkvd, hdd).astype(np.float32))
    maskd = np.zeros((bd, lmax), np.int32)
    maskd[0, :700] = 1
    maskd[1, :2041] = 1
    maskd = jnp.asarray(maskd)
    try:
        ref = _xla_path(qd, kd, vd, maskd, hdd ** -0.5)
        check("decode/fp", flash_decode_attention(qd, kd, vd, maskd,
                                          use_kernel=True),
              ref, 5e-4)
        qk, qv = quantize_activation(kd), quantize_activation(vd)
        refq = _xla_path(qd, qk, qv, maskd, hdd ** -0.5)
        check("decode/int8", flash_decode_attention(qd, qk, qv, maskd,
                                            use_kernel=True),
              refq, 2e-3)
    except Exception as e:
        print(f"SKIP decode (compile): {type(e).__name__}: {str(e)[:120]}")

    # --- natural-layout window kernel incl. odd window counts ---
    from ..kernels.sam_attention import (_window_qkv_xla,
                                         sam_window_attention_qkv)

    for bw_ in (6, 5):
        qkv = jnp.asarray(
            rng.randn(bw_, 196, 3 * 1280).astype(np.float32) * 0.1,
            jnp.bfloat16)
        rel14 = jnp.asarray(rng.randn(27, 80).astype(np.float32) * 0.1)
        try:
            ours = sam_window_attention_qkv(qkv, rel14, rel14, (14, 14), 16)
            ref = _window_qkv_xla(qkv, rel14, rel14, (14, 14), 16,
                                  80 ** -0.5)
            check(f"sam_window_qkv/bw{bw_}", ours, ref, 5e-2)
        except Exception as e:
            print(f"SKIP sam_window_qkv (compile): {type(e).__name__}")

    # --- Pallas W8A8 matmul vs the XLA int8 path ---
    from ..nn.quant import int8_matmul, pallas_int8_matmul, quantize_kernel

    xm = jnp.asarray(rng.randn(300, 1280).astype(np.float32) * 0.5)
    wm = jnp.asarray(rng.randn(1280, 512).astype(np.float32) * 0.02)
    qm, sm = quantize_kernel(wm)
    try:
        xf = xm.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s_x = jnp.where(amax == 0, 1.0, amax / 127.0)
        xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        interp = jax.default_backend() not in ("tpu", "axon")
        check("w8a8_pallas",
              pallas_int8_matmul(xq, qm, s_x, sm, interpret=interp),
              int8_matmul(xm, qm, sm, dtype=jnp.bfloat16), 1e-2)
    except Exception as e:
        print(f"SKIP w8a8_pallas (compile): {type(e).__name__}")

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all kernels match on", jax.default_backend())


if __name__ == "__main__":
    main()
