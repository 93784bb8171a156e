"""MXU dtype microbench: measured bf16 vs int8 dot_general throughput.

Motivates the serving-precision default in nn/layers.QDense: on the
v5e-1 (via axon), XLA's int8 x int8 -> int32 dot_general measured
BELOW the bf16 rate in the same harness (36 TOP/s vs 48.7 TFLOP/s,
4096^3, 24-deep chained loop) — XLA does not emit the 2x int8 MXU path
for a plain dot_general here. int8 serving therefore wins on weight HBM
traffic/footprint, not FLOPs, and W8A16 (HAFF_W8_COMPUTE=bf16) can beat
W8A8 by skipping the per-activation quantize pass.

Usage: python tools/mxu_bench.py [M N K reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(M=4096, N=4096, K=4096, reps=24):
    import jax
    import jax.numpy as jnp

    def bench(f, *args):
        g = jax.jit(f)
        float(np.asarray(g(*args)))  # compile
        float(np.asarray(g(*args)))  # warm
        t0 = time.perf_counter()
        float(np.asarray(g(*args)))  # scalar-readback sync (axon rule)
        return time.perf_counter() - t0

    rng = np.random.RandomState(0)
    a_bf = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b_bf = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.randint(-127, 128, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)

    def loop_bf(a, b):
        def body(i, acc):
            x = a + acc[0][0, 0].astype(a.dtype) * 0  # chain dependency
            return (jnp.dot(x, b, preferred_element_type=jnp.float32),)

        (out,) = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((M, N), jnp.float32),))
        return jnp.sum(out)

    def loop_i8(a, b):
        def body(i, acc):
            x = a + (acc[0][0, 0] % 1).astype(jnp.int8)
            return (jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32),)

        (out,) = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((M, N), jnp.int32),))
        return jnp.sum(out)

    flops = 2 * M * N * K * reps
    t = bench(loop_bf, a_bf, b_bf)
    print(f"bf16 dot: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TFLOP/s")
    t = bench(loop_i8, a_i8, b_i8)
    print(f"int8 dot: {t*1e3:.1f} ms -> {flops/t/1e12:.1f} TOP/s")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
