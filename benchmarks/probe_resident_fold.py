"""Probe: folded-diagonal resident kernel — admission, rates, routing.

Round-4 left the resident band's small-N fractions at 0.35/0.46/0.56
(N=1k/2k/4k) with the diagnosis "all geometry": at N ~ tile the single
diagonal slot burns T^2 evals for T(T-1)/2 pairs. The fold
(_force_fold_block) halves the diagonal eval count; at N <= tile the cure
needs tile = N/2 (nb=2: one folded slot + one cross slot = N^2/2 evals).

Matrix per (N, tile, mode): fold on/off, delta-timed (two step counts, the
difference removes launch overhead), plus the STREAMED slot-traversal step
at the same N (sim step, resident=False) — the routing alternative. Sets:
  * _fold_auto + fold-aware auto_tile scoring (resident_sym.py)
  * RESIDENT_AUTO_MAX_N re-check (streamed slot+fold moved too)

Run: python benchmarks/probe_resident_fold.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops.resident_sym import simulate_resident_sym
from mini_nbody_tpu.sim import init_carry, make_step_fn
from mini_nbody_tpu.utils.config import SimConfig
from mini_nbody_tpu.utils.harness import time_step_fn


def resident_rate(n, tile, mxu, fold, use_mass=False):
    key = jax.random.key(0)
    s = minit.plummer(key, n)
    mass = s.mass if use_mass else None

    def timed(steps, reps=3):
        p, _ = simulate_resident_sym(s.pos, s.vel, mass, steps=steps,
                                     dt=1e-3, mxu=mxu, tile=tile, fold=fold)
        np.asarray(jax.device_get(p.ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            p, _ = simulate_resident_sym(s.pos, s.vel, mass, steps=steps,
                                         dt=1e-3, mxu=mxu, tile=tile,
                                         fold=fold)
            np.asarray(jax.device_get(p.ravel()[0]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    s1, s2 = (2048, 8192) if n <= 2048 else (256, 1024)
    t1, t2 = timed(s1), timed(s2)
    per = (t2 - t1) / (s2 - s1)
    return per


def streamed_rate(n, mxu):
    cfg = SimConfig(n=n, dt=1e-3, backend="sym_mxu" if mxu else "sym",
                    resident=False)
    state = minit.plummer(jax.random.key(0), n)
    step = make_step_fn(cfg)
    return time_step_fn(step, init_carry(cfg, state), n, reps=3)


def g(n, sec):
    return n * float(n) / sec / 1e9


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    jobs = [
        # (n, tile, mxu) resident fold/nofold pairs
        (1024, 512, True), (1024, 1024, True), (1024, 512, False),
        (2048, 1024, True), (2048, 512, True),
        (4096, 1024, True),
        (8192, 1024, True),
        (512, 256, True), (512, 512, True), (512, 256, False),
        (1024, 1024, False), (512, 512, False),
    ]
    for n, tile, mxu in jobs:
        row = {"n": n, "tile": tile, "mxu": int(mxu)}
        for fold in (True, False):
            if fold and n // tile < 2 and n <= tile:
                row[f"fold{int(fold)}"] = None  # nb==1: fold impossible
                continue
            try:
                per = resident_rate(n, tile, mxu, fold)
                row["fold" if fold else "nofold"] = {
                    "us_step": round(per * 1e6, 2),
                    "ginter_s": round(g(n, per), 1)}
            except Exception as e:
                row["fold" if fold else "nofold"] = {"error": str(e)[-400:]}
        print(json.dumps(row), flush=True)
    for n in (1024, 2048, 4096, 8192):
        for mxu in (True, False):
            try:
                sec = streamed_rate(n, mxu)
                print(json.dumps({"n": n, "streamed_mxu": int(mxu),
                                  "us_step": round(sec * 1e6, 2),
                                  "ginter_s": round(g(n, sec), 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "streamed_mxu": int(mxu),
                                  "error": str(e)[-300:]}), flush=True)


if __name__ == "__main__":
    main()
