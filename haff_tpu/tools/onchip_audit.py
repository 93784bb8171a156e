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

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all kernels match on", jax.default_backend())


if __name__ == "__main__":
    main()
