"""Yoshida4 certification (round-5 VERDICT item 6).

Three measurements, all on-chip, energy via diagnostics.total_energy
(fp32 pairwise PE kernel):

1. Config-3-size streamed y4 drift gate: N=262,144, sym_mxu, plummer,
   softening 1e-2, dt 1e-3, 1000 steps (3000 force evals) — the y4 row
   for the drift table at the same size/gate as the leapfrog rows.
2. Resident fused y4 drift: N=32,767 (the reference envelope edge, same
   as the resident leapfrog row), mxu mode, 1000 steps in watchdog-sized
   resident dispatches.
3. Equal-cost comparison: same force-eval budget — y4 at dt vs leapfrog
   at dt/3 (both 3 evals per dt of simulated time), N=16,384, 1.8 time
   units. dt is chosen LARGE (6e-3) so leapfrog's O(dt^2) drift is far
   above the fp32 energy-measurement floor; y4's O(dt^4) advantage is
   the whole reason the integrator exists.

Run: python benchmarks/probe_y4_cert.py [quick]
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops import diagnostics as diag
from mini_nbody_tpu.sim import simulate
from mini_nbody_tpu.utils.config import SimConfig


def drift(cfg, state):
    e0 = float(diag.total_energy(state, cfg.softening))
    out = simulate(cfg, state)
    e1 = float(diag.total_energy(out, cfg.softening))
    return abs(e1 - e0) / abs(e0)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    # 1. streamed y4 at config-3 size
    n = 262144 if not quick else 8192
    steps = 1000 if not quick else 50
    st = minit.plummer(jax.random.key(3), n)
    cfg = SimConfig(n=n, dt=1e-3, steps=steps, softening=1e-2,
                    backend="sym_mxu", integrator="yoshida4",
                    use_masses=True, resident=False)
    print(json.dumps({"case": "streamed_y4_config3", "n": n,
                      "steps": steps, "dt": 1e-3,
                      "energy_drift": drift(cfg, st)}), flush=True)

    # 2. resident fused y4 at the reference envelope edge
    n = 32767 if not quick else 4096
    st = minit.plummer(jax.random.key(4), n)
    cfg = SimConfig(n=n, dt=1e-3, steps=steps, softening=1e-2,
                    backend="sym_mxu", integrator="yoshida4",
                    use_masses=True, resident=True)
    print(json.dumps({"case": "resident_y4_32767", "n": n,
                      "steps": steps, "dt": 1e-3,
                      "energy_drift": drift(cfg, st)}), flush=True)

    # 3. equal-cost: y4 at dt vs leapfrog at dt/3 (same force evals)
    n = 16384 if not quick else 4096
    st = minit.plummer(jax.random.key(5), n)
    t_total = 1.8 if not quick else 0.18
    for name, integ, dt in (("y4", "yoshida4", 6e-3),
                            ("leapfrog", "leapfrog", 2e-3)):
        steps_ec = int(round(t_total / dt))
        cfg = SimConfig(n=n, dt=dt, steps=steps_ec, softening=1e-2,
                        backend="sym_mxu", integrator=integ,
                        use_masses=True, resident=False)
        print(json.dumps({"case": f"equal_cost_{name}", "n": n,
                          "dt": dt, "steps": steps_ec,
                          "force_evals": steps_ec * (3 if name == "y4"
                                                     else 1),
                          "energy_drift": drift(cfg, st)}), flush=True)


if __name__ == "__main__":
    main()
