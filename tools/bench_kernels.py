"""Kernel-level microbenchmarks for the measurement campaign.

Subcommands (python tools/bench_kernels.py <cmd> [args]):

  winprof [B]     windowed-SAM-block time split at batch B (default 24):
                  qkv projection, rel-pos band tables, attention kernel,
                  full block — localizes the encoder's per-layer cost
                  (reference counterpart: image_encoder.py:263-318).
  bandforms [B]   A/B of rel-pos band-table einsum formulations.
  winvar [B] [sel] A/B of windowed-attention kernel structures (head
                  slicing vs head-on-grid DMA vs two-dot vs in-kernel
                  transpose) at several group sizes; band tables are
                  precomputed so only kernel structure is measured.
  int8mxu         does the MXU run int8 x int8 at 2x bf16 rate? Pallas
                  tiled matmul, identical structure, int8 vs bf16.
  w8a8 [--interpret]
                  XLA bf16 dot vs XLA int8 (quant.int8_matmul) vs Pallas
                  fused W8A8 (quant.pallas_int8_matmul) at real
                  SAM-encoder shapes; --interpret runs a CPU parity
                  check instead of timing.
  w4a16           XLA per-layer int4 dequant vs fused Pallas nibble
                  unpack (quant.pallas_int4_matmul) at 13B decode shapes.

Axon-tunnel timing rules (see ROUND_NOTES.md): every timed quantity is
a lax.fori_loop chain of N applications inside ONE jit returning a
device-reduced SCALAR; wall time divides by N after a warm-up call.
jax.block_until_ready is NOT trusted under the tunnel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


_TUNNEL_CONST = None


def _tunnel_const():
    """Fixed per-call dispatch+readback round trip (~34 ms through the
    axon tunnel, ~0 locally), measured once with a trivial jit. Short
    chains would otherwise fold this constant into every per-iteration
    number (int8mxu at n=8 read 5.4 TOP/s on a 118 TF/s chip)."""
    global _TUNNEL_CONST
    if _TUNNEL_CONST is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: x * 1.0)
        x = jnp.zeros(())
        float(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        _TUNNEL_CONST = min(ts)
    return _TUNNEL_CONST


def timeit(run, *args, n=1):
    """Compile+warm, then one timed call of an N-chained jit; the fixed
    tunnel round-trip constant is subtracted before dividing by N."""
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return max(time.perf_counter() - t0 - _tunnel_const(), 0.0) / n


# --------------------------------------------------------------------------
# winprof / bandforms — windowed SAM encoder block split
# --------------------------------------------------------------------------

def _win_setup(batch):
    import jax.numpy as jnp

    WIN, C, NH = 14, 1280, 16
    L, D = WIN * WIN, C // NH
    # Mirror the production gate (default ON): HAFF_WINDOW_LPAD=0 benches
    # the legacy exact-196 window token dim instead of the tile-padded 200.
    if os.environ.get("HAFF_WINDOW_LPAD", "1") == "1":
        L = -(-L // 8) * 8
    BW = batch * 25
    kp = 16
    while (NH * kp) % 128:
        kp += 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(BW, L, C).astype(np.float32), jnp.bfloat16)
    wqkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.02,
                       jnp.bfloat16)
    rel_h = jnp.asarray(rng.randn(2 * WIN - 1, D).astype(np.float32) * 0.02)
    rel_w = jnp.asarray(rng.randn(2 * WIN - 1, D).astype(np.float32) * 0.02)
    return WIN, C, NH, L, D, BW, kp, x, wqkv, rel_h, rel_w


def cmd_winprof(batch=24, n=10):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import (_natural_band_tables,
                                                sam_window_attention_qkv)

    WIN, C, NH, L, D, BW, kp, x, wqkv, rel_h, rel_w = _win_setup(batch)
    qkv0 = x @ wqkv
    q4 = qkv0[:, :, :C].reshape(BW, L, NH, D)
    scale = D ** -0.5

    def bench(name, run, *args):
        print(f"{name:6s} {timeit(run, *args, n=n) * 1e3:8.3f} ms/layer",
              flush=True)

    @jax.jit
    def run_qkv(x):
        def body(i, acc):
            return (acc @ wqkv)[:, :, :C]
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def run_band(q4):
        def body(i, acc):
            bh, bw = _natural_band_tables(
                q4 + acc * 0, rel_h, rel_w, (WIN, WIN), kp)
            return (q4 + (jnp.sum(bh.astype(jnp.float32))
                          + jnp.sum(bw.astype(jnp.float32)))
                    * 1e-30).astype(q4.dtype)
        out = jax.lax.fori_loop(0, n, body, q4)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def run_attn(qkv):
        def body(i, acc):
            o = sam_window_attention_qkv(
                qkv + acc * 1e-30, rel_h, rel_w, (WIN, WIN), NH,
                sm_scale=scale)
            return (qkv + jnp.sum(o.astype(jnp.float32))
                    * 1e-30).astype(qkv.dtype)
        out = jax.lax.fori_loop(0, n, body, qkv)
        return jnp.sum(out.astype(jnp.float32))

    bench("qkv", run_qkv, x)
    bench("band", run_band, q4)
    bench("attn", run_attn, qkv0)

    from haff_tpu.core.config import ModelConfig
    from haff_tpu.nn.sam_image_encoder import SamBlock

    cfg = ModelConfig.preset("7b").sam_encoder
    blk = SamBlock(cfg=cfg, window_size=WIN, dtype=jnp.bfloat16)
    xi = jnp.asarray(
        np.random.RandomState(1).randn(batch, 64, 64, C).astype(np.float32),
        jnp.bfloat16)
    params = jax.jit(blk.init)(jax.random.PRNGKey(0), xi)

    @jax.jit
    def run_block(xi):
        def body(i, acc):
            return blk.apply(params, acc)
        out = jax.lax.fori_loop(0, n, body, xi)
        return jnp.sum(out.astype(jnp.float32))

    bench("block", run_block, xi)


def cmd_bandforms(batch=24, n=10):
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import _natural_band_tables
    from haff_tpu.nn.sam_image_encoder import get_rel_pos

    WIN, C, NH, L, D, BW, kp, _, _, rel_h, rel_w = _win_setup(batch)
    H = W = WIN
    rng = np.random.RandomState(0)
    q4 = jnp.asarray(rng.randn(BW, L, NH, D).astype(np.float32),
                     jnp.bfloat16)

    def bench(name, fn):
        @jax.jit
        def run(q4):
            def body(i, acc):
                bh, bw = fn(q4 + acc[..., :1, :1, :1] * 0)
                return (q4 + (jnp.sum(bh.astype(jnp.float32))
                              + jnp.sum(bw.astype(jnp.float32)))
                        * 1e-30).astype(q4.dtype)
            out = jax.lax.fori_loop(0, n, body, q4)
            return jnp.sum(out.astype(jnp.float32))
        try:
            print(f"{name}: {timeit(run, q4, n=n) * 1e3:8.3f} ms/layer",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    def padded_tables(dtype):
        Rh = jnp.pad(get_rel_pos(H, H, rel_h),
                     ((0, 0), (0, kp - H), (0, 0))).astype(dtype)
        Rw = jnp.pad(get_rel_pos(W, W, rel_w),
                     ((0, 0), (0, kp - W), (0, 0))).astype(dtype)
        return Rh, Rw

    def v1(q):  # current production formulation
        return _natural_band_tables(q, rel_h, rel_w, (WIN, WIN), kp)

    def v2(q):  # pre-gathered (L, kp, d) tables, l-major einsum
        Rh, Rw = padded_tables(q.dtype)
        rows, cols = np.arange(L) // W, np.arange(L) % W
        Bh = jnp.einsum("blnc,lkc->blnk", q, Rh[rows],
                        preferred_element_type=jnp.float32)
        Bw = jnp.einsum("blnc,lkc->blnk", q, Rw[cols],
                        preferred_element_type=jnp.float32)
        return (Bh.astype(q.dtype).reshape(BW, L, NH * kp),
                Bw.astype(q.dtype).reshape(BW, L, NH * kp))

    def v3(q):  # h/w-major, pure bf16 accumulation
        Rh, Rw = padded_tables(q.dtype)
        r_q = q.reshape(BW, H, W, NH, D)
        Bh = jnp.einsum("bhwnc,hkc->bhwnk", r_q, Rh)
        Bw = jnp.einsum("bhwnc,wkc->bhwnk", r_q, Rw)
        return (Bh.reshape(BW, L, NH * kp), Bw.reshape(BW, L, NH * kp))

    def v4(q):  # both tables through one fused einsum
        Rh, Rw = padded_tables(jnp.float32)
        rows, cols = np.arange(L) // W, np.arange(L) % W
        Rcat = jnp.concatenate([Rh[rows], Rw[cols]], axis=1).astype(q.dtype)
        Bcat = jnp.einsum("blnc,lkc->blnk", q, Rcat,
                          preferred_element_type=jnp.float32).astype(q.dtype)
        return (Bcat[..., :kp].reshape(BW, L, NH * kp),
                Bcat[..., kp:].reshape(BW, L, NH * kp))

    for name, fn in (("v1-current", v1), ("v2-pregather", v2),
                     ("v3-hwmajor", v3), ("v4-fusedcat", v4)):
        bench(name, fn)


# --------------------------------------------------------------------------
# winvar — windowed-attention KERNEL structure A/B (band tables given)
# --------------------------------------------------------------------------

def cmd_winvar(batch=24, n=10):
    """A/B of windowed-attention kernel structures, band tables
    precomputed outside the timed region (isolates kernel cost):

      v0-inkslice[G]  production kernel: (G, L, 3C) lane blocks, heads
                      sliced in-kernel at misaligned 80-lane offsets.
      v1-headgrid[G]  heads on the GRID: 5D BlockSpec delivers aligned
                      (G, L, D) per-head blocks by DMA; no in-kernel
                      lane slicing (strided 160 B HBM bursts instead).
      v2-twodot[G]    headgrid + s = dot(q,k) + dot(bcat, ecat): kills
                      the misaligned lane concat at 2x QK MXU cost.
      v3-transpose[G] in-kernel (G,L,NH,D)->(G*NH,L,D) relayout, ONE
                      batched dot over all heads.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from haff_tpu.kernels.sam_attention import _natural_band_tables

    WIN, C, NH, L, D, BW, kp, _, _, rel_h, rel_w = _win_setup(batch)
    H = W = WIN
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(BW, L, 3 * C).astype(np.float32),
                      jnp.bfloat16)
    q_nat = qkv[:, :, :C].reshape(BW, L, NH, D)
    bh, bw = _natural_band_tables(q_nat, rel_h, rel_w, (WIN, WIN), kp)
    bh = jax.device_put(bh)
    bw = jax.device_put(bw)
    sm_scale = D ** -0.5

    def iota_eh_ew(l, dtype):
        rows = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (l, kp), 1)
        eh = (rows // W == ridx).astype(dtype)
        ew = (rows % W == ridx).astype(dtype)
        return eh, ew

    # ---- v0: production structure (in-kernel head lane slices) ----
    def k_v0(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref):
        g, l, _ = q_ref.shape
        eh, ew = iota_eh_ew(l, q_ref.dtype)
        ehg = jnp.broadcast_to(eh[None], (g, l, kp))
        ewg = jnp.broadcast_to(ew[None], (g, l, kp))
        for h in range(NH):
            qh = q_ref[:, :, h * D:(h + 1) * D]
            kh = k_ref[:, :, C + h * D:C + (h + 1) * D]
            vh = v_ref[:, :, 2 * C + h * D:2 * C + (h + 1) * D]
            bhh = bh_ref[:, :, h * kp:(h + 1) * kp]
            bwh = bw_ref[:, :, h * kp:(h + 1) * kp]
            qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
            qa = jnp.concatenate([qs, bhh, bwh], axis=2)
            ka = jnp.concatenate([kh, ehg, ewg], axis=2)
            s = jax.lax.dot_general(
                qa, ka, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            lsum = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, h * D:(h + 1) * D] = (o / lsum).astype(o_ref.dtype)

    def run_v0(qkv, bh, bw, group):
        bwp = qkv.shape[0]
        assert bwp % group == 0
        return pl.pallas_call(
            k_v0,
            grid=(bwp // group,),
            in_specs=[
                pl.BlockSpec((group, L, 3 * C), lambda i: (i, 0, 0)),
                pl.BlockSpec((group, L, 3 * C), lambda i: (i, 0, 0)),
                pl.BlockSpec((group, L, 3 * C), lambda i: (i, 0, 0)),
                pl.BlockSpec((group, L, NH * kp), lambda i: (i, 0, 0)),
                pl.BlockSpec((group, L, NH * kp), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((group, L, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bwp, L, C), qkv.dtype),
        )(qkv, qkv, qkv, bh, bw)

    # ---- v4: 8-head (640-lane) blocks + head-half grid dim: legal
    # lane blocking (640 % 128 == 0) shrinks per-step VMEM 2x, so the
    # window-batch G can grow to amortize MXU fill latency. ----
    HH = NH // 2  # heads per step

    def k_v4(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref):
        g, l, _ = q_ref.shape
        eh, ew = iota_eh_ew(l, q_ref.dtype)
        ehg = jnp.broadcast_to(eh[None], (g, l, kp))
        ewg = jnp.broadcast_to(ew[None], (g, l, kp))
        for h in range(HH):
            qh = q_ref[:, :, h * D:(h + 1) * D]
            kh = k_ref[:, :, h * D:(h + 1) * D]
            vh = v_ref[:, :, h * D:(h + 1) * D]
            bhh = bh_ref[:, :, h * kp:(h + 1) * kp]
            bwh = bw_ref[:, :, h * kp:(h + 1) * kp]
            qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
            qa = jnp.concatenate([qs, bhh, bwh], axis=2)
            ka = jnp.concatenate([kh, ehg, ewg], axis=2)
            s = jax.lax.dot_general(
                qa, ka, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            lsum = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[:, :, h * D:(h + 1) * D] = (o / lsum).astype(o_ref.dtype)

    def run_v4(qkv, bh, bw, group):
        bwp = qkv.shape[0]
        HC = HH * D     # 640
        HB = HH * kp    # 128
        out = pl.pallas_call(
            k_v4,
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 4 + h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, L, C), qkv.dtype),
        )(qkv, qkv, qkv, bh, bw)
        return out

    # ---- v5: one giant batched dot — stack all heads of the step into
    # the batch dim so Mosaic amortizes MXU fill across HH*G dots. ----
    def k_v5(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref):
        g, l, _ = q_ref.shape
        eh, ew = iota_eh_ew(l, q_ref.dtype)
        qa_list, ka_list, v_list = [], [], []
        for h in range(HH):
            qh = q_ref[:, :, h * D:(h + 1) * D]
            kh = k_ref[:, :, h * D:(h + 1) * D]
            v_list.append(v_ref[:, :, h * D:(h + 1) * D])
            bhh = bh_ref[:, :, h * kp:(h + 1) * kp]
            bwh = bw_ref[:, :, h * kp:(h + 1) * kp]
            qs = (qh.astype(jnp.float32) * sm_scale).astype(qh.dtype)
            qa_list.append(jnp.concatenate([qs, bhh, bwh], axis=2))
            ka_list.append(jnp.concatenate(
                [kh, jnp.broadcast_to(eh[None], (g, l, kp)),
                 jnp.broadcast_to(ew[None], (g, l, kp))], axis=2))
        qa = jnp.concatenate(qa_list, axis=0)   # (HH*G, L, D+2kp)
        ka = jnp.concatenate(ka_list, axis=0)
        vv = jnp.concatenate(v_list, axis=0)
        s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        lsum = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vv.dtype), vv,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o / lsum                             # (HH*G, L, D)
        for h in range(HH):
            o_ref[:, :, h * D:(h + 1) * D] = \
                o[h * g:(h + 1) * g].astype(o_ref.dtype)

    def run_v5(qkv, bh, bw, group):
        bwp = qkv.shape[0]
        HC = HH * D
        HB = HH * kp
        out = pl.pallas_call(
            k_v5,
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 4 + h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, L, C), qkv.dtype),
        )(qkv, qkv, qkv, bh, bw)
        return out

    # ---- v6: v5 structure + Mosaic compiler params (parallel grid
    # semantics + raised scoped-VMEM limit so bigger window groups
    # compile). ----
    from jax.experimental.pallas import tpu as pltpu

    def run_v6(qkv, bh, bw, group):
        bwp = qkv.shape[0]
        HC = HH * D
        HB = HH * kp
        return pl.pallas_call(
            k_v5,
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 4 + h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, L, C), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv, qkv, qkv, bh, bw)

    variants = {"v0-inkslice": (run_v0, (1,)),
                "v4-lane640": (run_v4, (2, 4, 8)),
                "v5-dotbatch": (run_v5, (2, 4)),
                "v6-params": (run_v6, (2, 4, 8))}
    if len(sys.argv) > 3:  # optional filter: winvar B name
        sel = sys.argv[3]
        variants = {k: v for k, v in variants.items() if sel in k}

    ref = None
    for name, (run_fn, groups) in variants.items():
        for g in groups:
            if BW % g:
                continue
            try:
                out = jax.jit(functools.partial(run_fn, group=g))(
                    qkv, bh, bw)
                if ref is None:
                    ref = np.asarray(out[:50], np.float32)
                    err = 0.0
                else:
                    err = float(np.max(np.abs(
                        np.asarray(out[:50], np.float32) - ref)))

                @jax.jit
                def chain(qkv, bh, bw):
                    def body(i, carry):
                        o = run_fn(qkv, carry, bw, group=g)
                        s = jnp.sum(o.astype(jnp.float32)) * 1e-30
                        return (carry + s).astype(carry.dtype)
                    out = jax.lax.fori_loop(0, n, body, bh)
                    return jnp.sum(out.astype(jnp.float32))

                dt = timeit(chain, qkv, bh, bw, n=n)
                print(f"{name:14s} G={g:<3d} {dt * 1e3:8.3f} ms/layer"
                      f"  maxdiff={err:.4f}", flush=True)
            except Exception as e:
                print(f"{name:14s} G={g:<3d} FAILED {type(e).__name__} "
                      f"{str(e)[:140]}", flush=True)


# --------------------------------------------------------------------------
# attnpath — where does the production windowed-attention PATH spend time?
# --------------------------------------------------------------------------

def cmd_attnpath(batch=24, n=10):
    """Decomposes the production sam_window_attention_qkv call:

      add-qkv    chain overhead: one (BW, L, 3C) add per iteration
      add-q4     chain overhead: one (BW, L, NH, D) add per iteration
      full       the production path (band tables from the strided
                 qkv[:, :, :C] slice + dot-batched kernel)
      band-slice band tables ONLY, from the production strided slice
      band-dense band tables ONLY, from a contiguous q operand (what a
                 split q-dense / kv-dense layer assembly would feed)

    Every chain perturbs its large operand with the carried scalar so
    XLA cannot hoist any stage out of the fori_loop; subtract the add-*
    overhead rows to get real stage costs.
    """
    import jax
    import jax.numpy as jnp

    from haff_tpu.kernels.sam_attention import (_natural_band_tables,
                                                sam_window_attention_qkv)

    WIN, C, NH, L, D, BW, kp, x, wqkv, rel_h, rel_w = _win_setup(batch)
    qkv0 = x @ wqkv
    q40 = qkv0[:, :, :C].reshape(BW, L, NH, D)
    q40 = jax.device_put(np.asarray(q40))      # dense, not a lazy slice
    scale = D ** -0.5

    def chain(body):
        @jax.jit
        def run(big):
            def step(i, carry):
                s = body(big, carry)
                return s * 1e-30
            out = jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))
            return out
        return run

    def bench(name, run, big):
        print(f"{name:11s} {timeit(run, big, n=n) * 1e3:8.3f} ms/layer",
              flush=True)

    def add_qkv(qkv, c):
        # full-tensor reduce so XLA cannot dead-code the add; this row
        # therefore measures add + reduce (the reduce also rides the
        # consumers in the other rows).
        return jnp.sum((qkv + c).astype(jnp.float32))

    def add_q4(q4, c):
        return jnp.sum((q4 + c).astype(jnp.float32))

    def full(qkv, c):
        o = sam_window_attention_qkv(qkv + c, rel_h, rel_w, (WIN, WIN),
                                     NH, sm_scale=scale)
        return jnp.sum(o.astype(jnp.float32))

    def band_slice(qkv, c):
        q4 = (qkv + c)[:, :, :C].reshape(BW, L, NH, D)
        bh, bw = _natural_band_tables(q4, rel_h, rel_w, (WIN, WIN), kp)
        return (jnp.sum(bh.astype(jnp.float32))
                + jnp.sum(bw.astype(jnp.float32)))

    def band_dense(q4, c):
        bh, bw = _natural_band_tables(q4 + c, rel_h, rel_w, (WIN, WIN), kp)
        return (jnp.sum(bh.astype(jnp.float32))
                + jnp.sum(bw.astype(jnp.float32)))

    # The production kernel (dot-batched, group 2) with (a) parameter
    # band tables vs (b) tables computed in-graph: isolates whether the
    # pallas call slows down when its operands are fusion outputs.
    import functools as _ft

    from jax.experimental import pallas as pl

    from haff_tpu.kernels.sam_attention import (_natural_band_tables_cat,
                                                _window_qkv_kernel_db)

    HH = NH // 2
    HC, HB = HH * D, HH * 2 * kp
    group = 2

    def run_db(qkv, bt):
        bwp = qkv.shape[0]
        return pl.pallas_call(
            _ft.partial(_window_qkv_kernel_db, hh=HH, d=D, kp=kp,
                        hw=(WIN, WIN), lcont=L, sm_scale=scale),
            grid=(bwp // group, 2),
            in_specs=[
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 2 + h)),
                pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, 4 + h)),
                pl.BlockSpec((group, L, HB), lambda i, h: (i, 0, h)),
            ],
            out_specs=pl.BlockSpec((group, L, HC), lambda i, h: (i, 0, h)),
            out_shape=jax.ShapeDtypeStruct((bwp, L, NH * D), qkv.dtype),
        )(qkv, qkv, qkv, bt)

    bt0 = jax.jit(
        lambda q4: _natural_band_tables_cat(q4, rel_h, rel_w, (WIN, WIN),
                                            kp))(q40)
    bt0 = jax.device_put(np.asarray(bt0))

    def kernel_param(qkv, c):
        o = run_db(qkv + c, bt0)
        return jnp.sum(o.astype(jnp.float32))

    def kernel_fed(qkv, c):
        q4 = (qkv + c)[:, :, :C].reshape(BW, L, NH, D)
        bt = _natural_band_tables_cat(q4, rel_h, rel_w, (WIN, WIN), kp)
        o = run_db(qkv + c, bt.astype(qkv.dtype))
        return jnp.sum(o.astype(jnp.float32))

    # End-to-end matmul+attention A/B: fused (BW, L, 3C) qkv dense vs
    # column-split q/kv denses feeding sam_window_attention_qkv_split
    # (HAFF_WINDOW_SPLIT production candidate). Chains from x so the
    # projection cost (one N=3840 dot vs two N=1280/2560 dots reading x
    # twice) is inside the measurement.
    from haff_tpu.kernels.sam_attention import sam_window_attention_qkv_split

    def path_fused(x, c):
        xc = (x + c).reshape(BW * L, C)
        qkv = (xc @ wqkv).reshape(BW, L, 3 * C)
        o = sam_window_attention_qkv(qkv, rel_h, rel_w, (WIN, WIN), NH,
                                     sm_scale=scale)
        return jnp.sum(o.astype(jnp.float32))

    def path_split(x, c):
        xc = (x + c).reshape(BW * L, C)
        q3 = (xc @ wqkv[:, :C]).reshape(BW, L, C)
        kv3 = (xc @ wqkv[:, C:]).reshape(BW, L, 2 * C)
        o = sam_window_attention_qkv_split(q3, kv3, rel_h, rel_w,
                                           (WIN, WIN), NH, sm_scale=scale)
        return jnp.sum(o.astype(jnp.float32))

    bench("add-qkv", chain(add_qkv), qkv0)
    bench("add-q4", chain(add_q4), q40)
    bench("full", chain(full), qkv0)
    bench("band-slice", chain(band_slice), qkv0)
    bench("band-dense", chain(band_dense), q40)
    bench("kern-param", chain(kernel_param), qkv0)
    bench("kern-fed", chain(kernel_fed), qkv0)
    bench("path-fused", chain(path_fused), x)
    bench("path-split", chain(path_split), x)


# --------------------------------------------------------------------------
# int8mxu — raw MXU int8 vs bf16 rate
# --------------------------------------------------------------------------

def cmd_int8mxu(n=100):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = K = N = 2048
    BM, BK, BN = 512, 2048, 512

    def mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, nk, out_dtype):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_ref.dtype)

        @pl.when(ki == nk - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(out_dtype)

    def make_mm(dtype, acc_dtype):
        nk = K // BK

        def mm(a, b):
            return pl.pallas_call(
                functools.partial(mm_kernel, nk=nk, out_dtype=dtype),
                grid=(M // BM, N // BN, nk),
                in_specs=[
                    pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
                    pl.BlockSpec((BK, BN), lambda i, j, k: (k, j)),
                ],
                out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), dtype),
                scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
            )(a, b)
        return mm

    def bench(name, dtype, acc_dtype):
        rng = np.random.RandomState(0)
        if dtype == jnp.int8:
            a = jnp.asarray(rng.randint(-127, 127, (M, K), dtype=np.int8))
            b = jnp.asarray(rng.randint(-127, 127, (K, N), dtype=np.int8))
        else:
            a = jnp.asarray(rng.randn(M, K).astype(np.float32), dtype)
            b = jnp.asarray(rng.randn(K, N).astype(np.float32), dtype)
        mm = make_mm(dtype, acc_dtype)

        @jax.jit
        def run(a, b):
            def body(i, carry):
                a_, s = carry
                o = mm(a_, b)
                if dtype == jnp.int8:
                    # renormalize so the chain doesn't overflow int32
                    a2 = (o // (K * 64)).astype(jnp.int8)
                    return a2, s + jnp.sum(o.astype(jnp.float32)) * 1e-30
                return (o.astype(dtype),
                        s + jnp.sum(o.astype(jnp.float32)) * 1e-30)
            out, s = jax.lax.fori_loop(
                0, n, body, (a, jnp.zeros((), jnp.float32)))
            return s + jnp.sum(out.astype(jnp.float32)) * 1e-30

        dt = timeit(run, a, b, n=n)
        tops = 2 * M * K * N / dt / 1e12
        print(f"{name}: {dt * 1e3:.3f} ms/matmul = {tops:.1f} TOP/s",
              flush=True)

    bench("bf16", jnp.bfloat16, jnp.float32)
    bench("int8", jnp.int8, jnp.int32)


# --------------------------------------------------------------------------
# w8a8 — serving dense paths at real SAM-encoder shapes
# --------------------------------------------------------------------------

def cmd_w8a8(interpret=False, n=8):
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.quant import (int8_matmul, pallas_int8_matmul,
                                   quantize_activation, quantize_kernel)

    if interpret:
        jax.config.update("jax_platforms", "cpu")
        shapes = [(512, 128, 256)]
    else:
        shapes = [(117600, 1280, 3840),   # windowed qkv @ batch 24
                  (98304, 1280, 5120),    # mlp lin1
                  (98304, 5120, 1280)]    # mlp lin2
    rng = np.random.RandomState(0)
    for (M, K, N) in shapes:
        x = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w = rng.randn(K, N).astype(np.float32) * 0.02
        wq, ws = quantize_kernel(jnp.asarray(w))
        wbf = jnp.asarray(w, jnp.bfloat16)

        def pl_int8(xx, ww, ss):
            qa = quantize_activation(xx)
            return pallas_int8_matmul(qa.values, ww, qa.scales, ss,
                                      interpret=interpret)

        if interpret:
            a = pl_int8(x, wq, ws)
            b = int8_matmul(x, wq, ws)
            d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
            rel = d / float(jnp.max(jnp.abs(b.astype(jnp.float32))))
            print(f"parity max abs diff vs int8_matmul: {d:.5f} "
                  f"(rel {rel:.4f})")
            assert rel < 0.02, rel
            continue

        def bench(name, f, *args):
            @jax.jit
            def run(x0, *a):
                # carry feeds the activation so the loop body is NOT
                # loop-invariant (XLA would hoist a constant matmul out)
                def body(i, xx):
                    o = f(xx, *a)
                    return xx + jnp.mean(o.astype(jnp.float32)).astype(
                        xx.dtype) * 1e-30
                out = jax.lax.fori_loop(0, n, body, x0)
                return jnp.sum(out.astype(jnp.float32))
            try:
                dt = timeit(run, *args, n=n)
                tput = 2 * M * K * N / dt / 1e12
                print(f"  {name:9s} {dt * 1e3:8.3f} ms  {tput:6.1f} T/s",
                      flush=True)
            except Exception as e:
                print(f"  {name:9s} FAILED {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)

        print(f"shape M={M} K={K} N={N}", flush=True)
        bench("xla-bf16", lambda xx, ww: jnp.dot(
            xx, ww,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            x, wbf)
        bench("xla-int8", int8_matmul, x, wq, ws)
        bench("pl-int8", pl_int8, x, wq, ws)


# --------------------------------------------------------------------------
# w4a16 — 13B decode dense paths
# --------------------------------------------------------------------------

def cmd_w4a16(n=25):
    import jax
    import jax.numpy as jnp

    from haff_tpu.nn.quant import (int4_matmul, pallas_int4_matmul,
                                   quantize_kernel_int4)

    SHAPES = [  # (M, K, N) — 13B decode: qkv/o 5120x5120, mlp 5120x13824
        (8, 5120, 5120),
        (8, 5120, 13824),
        (8, 13824, 5120),
        (256, 5120, 13824),
    ]

    def bench(fn, x):
        def chain(x):
            def body(_, c):
                y = fn(c)
                # scalar feedback keeps the chain carry-dependent for
                # any (K, N) relation (a [:, :K] slice breaks for N < K)
                return c + jnp.mean(y.astype(jnp.float32)).astype(
                    c.dtype) * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, n, body, x))
        return timeit(jax.jit(chain), x, n=n)

    for M, K, N in SHAPES:
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02)
        p, s = quantize_kernel_int4(w, group=64)
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        t_xla = bench(lambda c: int4_matmul(c, p, s, group=64), x)
        try:
            t_pl = bench(lambda c: pallas_int4_matmul(
                c, p, s, group=64, dtype=jnp.bfloat16), x)
        except Exception as e:  # Mosaic rejection — report, keep going
            t_pl = float("nan")
            print(f"  pallas failed: {type(e).__name__}: {str(e)[:200]}")
        gbs = (K * N / 2) / max(t_pl, 1e-9) / 1e9
        print(f"M{M} K{K} N{N}: xla {t_xla * 1e3:.3f} ms  "
              f"pallas {t_pl * 1e3:.3f} ms (packed-traffic {gbs:.0f} GB/s)",
              flush=True)


def main():
    cmds = {"winprof": cmd_winprof, "bandforms": cmd_bandforms,
            "winvar": cmd_winvar, "attnpath": cmd_attnpath,
            "int8mxu": cmd_int8mxu, "w8a8": cmd_w8a8, "w4a16": cmd_w4a16}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(__doc__)
        sys.exit(2)
    cmd, rest = sys.argv[1], sys.argv[2:]
    kwargs = {}
    if cmd in ("winprof", "bandforms", "winvar", "attnpath") and rest \
            and rest[0].isdigit():
        kwargs["batch"] = int(rest[0])
    if cmd == "int8mxu" and rest and rest[0].isdigit():
        kwargs["n"] = int(rest[0])
    if cmd == "w8a8" and "--interpret" in rest:
        kwargs["interpret"] = True
    cmds[cmd](**kwargs)


if __name__ == "__main__":
    main()
