"""On-chip check + rates for the batched-resident ensemble kernel (r3g).

1. Bitwise: simulate_resident_sym_ensemble vs per-system
   simulate_resident_sym on the REAL chip (Mosaic semantics of the
   4-D batched grid: per-system block bases, step-start accumulator
   zeroing, integrate-slot block offsets).
2. Rates: streamed simulate_ensemble (resident=False) vs the batched-
   resident path (resident=True) at several (B, N) per precision class —
   sets RESIDENT_ENSEMBLE_AUTO_MAX_N (sim.py).

Run: python benchmarks/probe_resident_ensemble.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_nbody_tpu import SimConfig
from mini_nbody_tpu.models import init
from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.ops.resident_sym import (
    auto_tile_ensemble,
    simulate_resident_sym,
    simulate_resident_sym_ensemble,
)
from mini_nbody_tpu.sim import simulate_ensemble
from mini_nbody_tpu.utils.harness import time_fn

STEPS = 200


def _state(b, n, key0=500):
    ss = [init.plummer(jax.random.key(key0 + i), n) for i in range(b)]
    return ss, BodyState(pos=jnp.stack([s.pos for s in ss]),
                         vel=jnp.stack([s.vel for s in ss]),
                         mass=jnp.stack([s.mass for s in ss]))


def main():
    print(json.dumps({"backend": jax.default_backend(), "steps": STEPS}),
          flush=True)

    # 1. on-chip bitwise, both classes, masses + unit
    b, n = 4, 512
    ss, st = _state(b, n)
    for mxu in (True, False):
        tile = auto_tile_ensemble(b, n, mxu)
        p, v = simulate_resident_sym_ensemble(
            st.pos, st.vel, st.mass, steps=8, dt=1e-3, mxu=mxu, tile=tile)
        for i in range(b):
            pi, vi = simulate_resident_sym(
                ss[i].pos, ss[i].vel, ss[i].mass, steps=8, dt=1e-3,
                mxu=mxu, tile=tile)
            assert (np.asarray(p[i]) == np.asarray(pi)).all(), (mxu, i)
            assert (np.asarray(v[i]) == np.asarray(vi)).all(), (mxu, i)
        print(json.dumps({"check": "bitwise_vs_standalone", "mxu": mxu,
                          "tile": tile, "ok": True}), flush=True)

    # 2. streamed vs resident rates — ONE timed dispatch of k fused steps
    # sized for >= ~2 s of device time (the tunnel's fixed ~33 ms dispatch
    # sync otherwise biases a 200-step run by ~165 us/step — the
    # r3b harness lesson, utils/harness.auto_inner).
    from mini_nbody_tpu.sim import (_ensemble_initial_acc, _ensemble_run_k)

    for backend, mxu in (("sym_mxu", True), ("sym", False)):
        for b, n in ((256, 256), (64, 1024), (32, 2048), (16, 4096),
                     (8, 8192)):
            try:
                auto_tile_ensemble(b, n, mxu)
            except ValueError:
                print(json.dumps({"kind": "ens", "backend": backend,
                                  "B": b, "n": n,
                                  "skip": "not admissible"}), flush=True)
                continue
            ss, st = _state(b, n)
            # ~8e11 slot-pairs per timed dispatch (~2-4 s device time)
            k = max(64, min(65536, int(8e11 / (b * float(n) * n / 2))))
            pairs = b * k * float(n) * n / 2
            row = {"kind": "ens", "backend": backend, "B": b, "n": n,
                   "k": k}
            cfg = SimConfig(n=n, dt=1e-4, steps=k, backend=backend,
                            use_masses=True, integrator="euler",
                            resident=False)
            acc = _ensemble_initial_acc(cfg, None, st)
            sec = time_fn(
                lambda: _ensemble_run_k(cfg, None, st, acc, k)[0].pos,
                reps=2)
            row["streamed_us_step"] = round(sec / k * 1e6, 2)
            row["streamed_gpairs_s"] = round(pairs / sec / 1e9, 2)
            sec = time_fn(
                lambda: simulate_resident_sym_ensemble(
                    st.pos, st.vel, st.mass, steps=k, dt=1e-4,
                    mxu=mxu)[0],
                reps=2)
            row["resident_us_step"] = round(sec / k * 1e6, 2)
            row["resident_gpairs_s"] = round(pairs / sec / 1e9, 2)
            row["speedup"] = round(row["streamed_us_step"]
                                   / row["resident_us_step"], 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
