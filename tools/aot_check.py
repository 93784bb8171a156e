"""Chipless AOT Mosaic compile check for the production Pallas kernels.

Compiles each kernel graph for a TPU v5e:1x1x1 topology using the LOCAL
libtpu (jax.experimental.topologies) — no chip, no tunnel, no claim.
A Mosaic lowering crash (e.g. the ApplyVectorLayout aborts some libtpu
builds throw on new kernel shapes) surfaces here as a subprocess
failure instead of wedging a live TPU session's claim.

Usage:
    python tools/aot_check.py            # all graphs, each in a subprocess
    python tools/aot_check.py <name>     # one graph, in-process

Notes:
  * The host platform must be forced to cpu BEFORE backend init (the
    env's sitecustomize registers the tunnel backend otherwise).
  * The local libtpu's Mosaic may be newer than the serving terminal's;
    a pass here is necessary, not sufficient, for the remote compiler.
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _topology():
    import jax
    from jax.experimental import topologies

    jax.config.update("jax_platforms", "cpu")
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:1x1x1",
        chips_per_host_bounds=[1, 1, 1], wrap=[False, False, False])
    mesh = topologies.make_mesh(topo, (1,), ("x",))
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec())


def _spec(shape, dtype, sh):
    import jax

    return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)


def graph_window_attn_l200(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import sam_window_attention_qkv

    rel = jnp.zeros((27, 80), jnp.float32)

    def f(qkv):
        return sam_window_attention_qkv(qkv, rel, rel, (14, 14), 16)

    return f, [_spec((600, 200, 3840), jnp.bfloat16, sh)]


def graph_window_attn_l196(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import sam_window_attention_qkv

    rel = jnp.zeros((27, 80), jnp.float32)

    def f(qkv):
        return sam_window_attention_qkv(qkv, rel, rel, (14, 14), 16)

    return f, [_spec((600, 196, 3840), jnp.bfloat16, sh)]


def graph_window_attn_split(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import sam_window_attention_qkv_split

    rel = jnp.zeros((27, 80), jnp.float32)

    def f(q3, kv3):
        return sam_window_attention_qkv_split(q3, kv3, rel, rel, (14, 14), 16)

    return f, [_spec((600, 200, 1280), jnp.bfloat16, sh),
               _spec((600, 200, 2560), jnp.bfloat16, sh)]


def graph_global_attn(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import sam_global_attention

    rel = jnp.zeros((127, 80), jnp.float32)

    def f(q, k, v):
        return sam_global_attention(q, k, v, rel, rel, (64, 64))

    spec = _spec((2, 4096, 16, 80), jnp.bfloat16, sh)
    return f, [spec, spec, spec]


def graph_flash_attn(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.flash_attention import flash_attention

    def f(q, k, v):
        return flash_attention(q, k, v, causal=True)

    spec = _spec((2, 1024, 8, 128), jnp.bfloat16, sh)
    return f, [spec, spec, spec]


def graph_int8_matmul(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.quant import int8_matmul

    def f(x, w, s):
        return int8_matmul(x, w, s)

    return f, [_spec((512, 1280), jnp.bfloat16, sh),
               _spec((1280, 3840), jnp.int8, sh),
               _spec((3840,), jnp.float32, sh)]


def graph_int4_matmul(sh):
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.quant import int4_matmul

    def f(x, p, s):
        return int4_matmul(x, p, s, group=64, dtype=jnp.bfloat16)

    return f, [_spec((8, 5120), jnp.bfloat16, sh),
               _spec((2560, 13824), jnp.uint8, sh),
               _spec((80, 13824), jnp.float32, sh)]


GRAPHS = {
    "window_attn_l200": graph_window_attn_l200,
    "window_attn_l196": graph_window_attn_l196,
    "window_attn_split": graph_window_attn_split,
    "global_attn": graph_global_attn,
    "flash_attn": graph_flash_attn,
    "int8_matmul": graph_int8_matmul,
    "int4_matmul": graph_int4_matmul,
}


def compile_one(name: str) -> None:
    import jax

    sh = _topology()
    f, specs = GRAPHS[name](sh)
    jax.jit(f).trace(*specs).lower().compile()
    print(f"AOT_OK {name}")


def main():
    if len(sys.argv) > 1:
        compile_one(sys.argv[1])
        return
    failed = []
    for name in GRAPHS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=600)
        ok = p.returncode == 0 and f"AOT_OK {name}" in p.stdout
        print(f"{'PASS' if ok else 'FAIL'} {name}")
        if not ok:
            failed.append(name)
            tail = (p.stderr or p.stdout).strip().splitlines()[-6:]
            for ln in tail:
                print(f"    {ln[:160]}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
