"""Compiled-executable FLOP accounting for self-auditing benchmarks.

VERDICT r3 item 4: perf claims must carry achieved TFLOP/s and % of the
chip's MEASURED matmul peak next to fps, so "near-MXU-bound" is
checkable from the bench artifact alone. The FLOP count comes from XLA's
own cost model over the compiled executable (`compile().cost_analysis()`
— the number XLA budgets for the exact HLO it runs, fusion included),
not a hand model of the Python code.

The peak reference is the chip's measured sustained matmul rate, not the
datasheet: tools/mxu_bench.py chained 2048^3 Pallas matmuls sustain
149.8 TFLOP/s bf16 on this v5e (round-2 session-8 campaign); the same
harness shows int8 at ~69 TOP/s, i.e. int8 is NOT 2x on this part —
int8 MFU is reported against the bf16 peak because that is the rate the
MXU actually runs either way.
"""

from __future__ import annotations

import os
from typing import Optional

# Measured sustained matmul peak of the target chip (TFLOP/s). Override
# with HAFF_PEAK_TFLOPS when benching other parts.
MEASURED_PEAK_TFLOPS = float(os.environ.get("HAFF_PEAK_TFLOPS", "149.8"))


def executable_flops(compiled) -> Optional[float]:
    """FLOPs per execution of an AOT-compiled executable per XLA's cost
    model; None when the backend does not expose cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def aot_with_flops(jit_fn, *args, **kwargs):
    """AOT-compile `jit_fn` for `args` and return (callable, flops).

    ONE compile serves both the measurement loop and the cost model
    (benches must not pay a second compile through the tunnel). Falls
    back to (jit_fn, None) where lower/compile is unsupported.
    """
    try:
        compiled = jit_fn.lower(*args, **kwargs).compile()
    except Exception:
        return jit_fn, None
    return compiled, executable_flops(compiled)


def compiled_flops(jit_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one execution of `jit_fn(*args)` per XLA's cost model.

    Returns None when the backend does not expose cost analysis (some
    remote/plugin backends) — callers must treat the fields as optional.
    """
    return aot_with_flops(jit_fn, *args, **kwargs)[1]


def mfu_fields(flops_per_call: Optional[float], calls_per_sec: float,
               prefix: str = "") -> dict:
    """{tflops, mfu_pct} dict (empty when flops unknown)."""
    if not flops_per_call:
        return {}
    tflops = flops_per_call * calls_per_sec / 1e12
    return {
        prefix + "tflops": round(tflops, 2),
        prefix + "mfu_pct": round(100.0 * tflops / MEASURED_PEAK_TFLOPS, 1),
    }
