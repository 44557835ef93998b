"""Compile-verify the interpolated resident VMEM-admission rows that
auto_tile can actually select (round-5 VERDICT item 8).

_MAX_NB's mxu 640/384/256/128 entries (and their fp32-mass twins) were
"interpolate the linear model, stay conservative" — the exact failure
class that bit round 4's fp32-mass episode. This probe compiles
simulate_resident_sym at each such (tile, cap-nb) in BOTH mass modes and
prints OK/FAIL so every reachable entry can be marked (v) or corrected.

Run: python benchmarks/probe_admission_r5.py
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops.resident_sym import (
    RESIDENT_SYM_MAX_N, _MAX_NB, _MAX_NB_FP32_MASS, simulate_resident_sym)


def check(tile, nb, mxu, use_mass):
    n = min(tile * nb, RESIDENT_SYM_MAX_N)
    s = minit.plummer(jax.random.key(0), n)
    mass = s.mass if use_mass else None
    t0 = time.time()
    try:
        p, _ = simulate_resident_sym(s.pos, s.vel, mass, steps=2, dt=1e-3,
                                     mxu=mxu, tile=tile, fold=False)
        np.asarray(jax.device_get(p.ravel()[0]))
        return {"ok": True, "compile_s": round(time.time() - t0, 1)}
    except Exception as e:
        return {"ok": False, "err": str(e)[-200:]}


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    jobs = []
    for tile in (640, 384, 256, 128):
        jobs.append((tile, _MAX_NB[True][tile], True, False))
        jobs.append((tile, _MAX_NB[True][tile], True, True))
    for tile in (384, 256, 128):  # fp32-mass interpolated rows
        jobs.append((tile, _MAX_NB_FP32_MASS[tile], False, True))
        jobs.append((tile, _MAX_NB[False][tile], False, False))
    for tile, nb, mxu, mass in jobs:
        r = check(tile, nb, mxu, mass)
        print(json.dumps({"tile": tile, "nb": nb, "mxu": int(mxu),
                          "mass": int(mass), **r}), flush=True)


if __name__ == "__main__":
    main()
