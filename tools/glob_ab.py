"""On-chip A/B: legacy per-head global attention path (transpose +
_fused) vs the natural-layout qkv kernel, at ViT-H global-layer shapes.

Usage: python tools/glob_ab.py [batch] [n]
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(batch=8, n=20):
    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        "bk", os.path.join(os.path.dirname(__file__), "bench_kernels.py"))
    bk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bk)

    from haff_tpu.kernels.sam_attention import (
        sam_global_attention,
        sam_global_attention_qkv,
    )

    H = W = 64
    L, nh, d = H * W, 16, 80
    C = nh * d
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(batch, L, 3 * C).astype(np.float32),
                      jnp.bfloat16)
    rh = jnp.asarray(rng.randn(2 * H - 1, d).astype(np.float32) * 0.02)
    rw = jnp.asarray(rng.randn(2 * W - 1, d).astype(np.float32) * 0.02)
    scale = d ** -0.5

    def legacy(qkv):
        b, l, f = qkv.shape
        qkv5 = qkv.reshape(b, l, 3, nh, d)
        out = sam_global_attention(qkv5[:, :, 0], qkv5[:, :, 1],
                                   qkv5[:, :, 2], rh, rw, (H, W),
                                   sm_scale=scale)
        return out.reshape(b, l, C)

    def natural(qkv):
        return sam_global_attention_qkv(qkv, rh, rw, (H, W), nh,
                                        sm_scale=scale)

    for name, fn in (("legacy", legacy), ("natural", natural)):
        @jax.jit
        def run(qkv, fn=fn):
            def body(i, acc):
                o = fn(qkv + acc * 1e-30)
                return jnp.sum(o.astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t = bk.timeit(run, qkv, n=n)
        print(f"{name:8s} b{batch}: {t*1e3:8.3f} ms/layer "
              f"({t*1e3/batch:.3f} ms/frame)", flush=True)

    # numerical agreement on-device
    a = np.asarray(legacy(qkv), np.float32)
    b_ = np.asarray(natural(qkv), np.float32)
    print("max|diff|:", float(np.abs(a - b_).max()))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
