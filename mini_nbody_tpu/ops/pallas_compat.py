"""Shared Pallas-TPU shims for the kernel modules.

CompilerParams: jax renamed pltpu.TPUCompilerParams -> CompilerParams
across versions; resolve once here instead of per-module.

fast_rsqrt_cube: whether w = rsqrt((r2*r2)*r2) (one rsqrt, two mults —
measured +3% over inv*inv*inv in ops/pallas_force.py) is numerically safe:
r2^3 must not underflow to 0 for the closest pairs, which holds whenever
softening >= 1e-12 (r2 >= softening, and 1e-36 is above the fp32 denormal
floor).
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

CompilerParams = getattr(pltpu, "CompilerParams", None) or getattr(
    pltpu, "TPUCompilerParams"
)


def fast_rsqrt_cube(softening) -> bool:
    return float(softening) >= 1e-12
