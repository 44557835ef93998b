"""Probe: shard_map wrapper overhead on a 1-device mesh (real chip).

The parallel/ subsystem has full correctness evidence (CPU-mesh suites,
two-process gloo) but — round-4 VERDICT missing #2 — no measured number.
Real multi-chip hardware is unavailable here, so this measures the part
that CAN be measured on one chip: the per-step cost the shard_map wrapper
adds over the bare simulate step at the same N (same backend, integrator,
kernels). On a 1-device mesh every collective (all_gather, psum_scatter,
ppermute) degenerates to an identity/copy, so the measured delta bounds
the framework-side overhead of the sharded path: shard_map tracing resolves
at compile time; what can remain at runtime is identity-collective copies
and any layout round-trips.

The ICI comm-vs-compute model for the real 8-device config-4 is written up
in benchmarks/RESULTS.md §sharded (bytes/hop, published v5e ICI rates,
overlap assumption) with this probe's number as the wrapper term.

Run: python benchmarks/probe_sharded_overhead.py [quick]
"""

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import Mesh

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.parallel.sharded import (
    init_sharded_carry, make_sharded_step_fn, shard_state)
from mini_nbody_tpu.sim import init_carry, make_step_fn
from mini_nbody_tpu.utils.config import SimConfig
from mini_nbody_tpu.utils.harness import Throughput, time_step_fn

from mini_nbody_tpu.parallel.mesh import BODY_AXIS


def rates(n, comm):
    cfg = SimConfig(n=n, dt=1e-3, backend="sym_mxu", resident=False,
                    comm=comm)
    state = minit.uniform_random(jax.random.key(0), n)

    # bare step
    step = make_step_fn(cfg)
    sec_bare = time_step_fn(step, init_carry(cfg, state), n, reps=3)

    # 1-device mesh sharded step
    mesh = Mesh(np.asarray(jax.devices()[:1]), (BODY_AXIS,))
    sstate = shard_state(state, mesh, pad_far=not cfg.use_masses)
    sstep = make_sharded_step_fn(cfg, mesh)
    carry = init_sharded_carry(cfg, mesh, sstate)
    sec_sh = time_step_fn(sstep, carry, n, reps=3)
    g = lambda s: Throughput(n=n, steps=1, seconds=s).ginteractions_per_s
    return {
        "n": n, "comm": comm,
        "bare_us": round(sec_bare * 1e6, 1),
        "sharded_us": round(sec_sh * 1e6, 1),
        "overhead_us": round((sec_sh - sec_bare) * 1e6, 1),
        "overhead_pct": round(100 * (sec_sh / sec_bare - 1), 2),
        "bare_ginter_s": round(g(sec_bare), 1),
        "sharded_ginter_s": round(g(sec_sh), 1),
    }


if __name__ == "__main__":
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    sizes = [65536] if quick else [262144, 1048576]
    for n in sizes:
        for comm in ("all_gather", "ring"):
            print(json.dumps(rates(n, comm)), flush=True)
