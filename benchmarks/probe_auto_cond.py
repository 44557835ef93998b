"""Probe: per-step cost of the in-jit coincident='auto' routing at mid N.

The round-3f shmoo leaves streamed sym_mxu below the maskless roofline at
8k/16k (0.67/0.81) while 65k+ sits at 0.97-1.01. Diagonal-block waste
(nb/(nb+1): 0.889 at 8k, 0.941 at 16k) explains part; the remaining
~50-100 us/step suspect is the per-step `lax.cond(any_coincident(pos), ...)`
inside the jitted step — an N-element 3-key lexsort per step whose cost
does not shrink with N. The pre-maskless table agrees: at 16k the MASKED
family (no cond, no scan) measured 391.3 vs auto's 382.3.

Stages (all on-chip, streamed path, unit-mass euler):
  1. streamed step with coincident in {scan-auto, masked, fast} at
     N = 4096 / 8192 / 16384 / 32768 / 65536 — 'scan-auto' bypasses the
     r4 resolve_auto N-gate (COINCIDENT_AUTO_MIN_N patched to 0) so the
     true duplicate-scan + lax.cond cost is visible at every N; with the
     gate, 'auto' below the threshold IS 'masked'. This table pins
     COINCIDENT_AUTO_MIN_N (sym_mxu_force.py): the gate should sit where
     masked stops beating scan-auto.
  2. isolated any_coincident cost: a scanned chain of the scan's
     select-consumed result at the same N.

Run: python benchmarks/probe_auto_cond.py
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.sim import make_step_fn, init_carry
from mini_nbody_tpu.utils.config import SimConfig
from mini_nbody_tpu.utils.harness import Throughput, time_step_fn, time_fn
from mini_nbody_tpu.ops.sym_mxu_force import any_coincident


def step_rate(n, coincident):
    cfg = SimConfig(n=n, dt=1e-3, backend="sym_mxu", resident=False,
                    coincident=coincident)
    state = minit.uniform_random(jax.random.key(0), n)
    step = make_step_fn(cfg)
    carry = init_carry(cfg, state)
    sec = time_step_fn(step, carry, n, reps=3)
    t = Throughput(n=n, steps=1, seconds=sec)
    return sec, t.ginteractions_per_s


def scan_cost(n):
    """Per-iteration cost of any_coincident inside a scanned chain: the
    flag gates a select on the carry so XLA cannot hoist it."""
    pos = minit.uniform_random(jax.random.key(1), n).pos

    @jax.jit
    def chain(p):
        def body(c, _):
            flag = any_coincident(c)
            return jnp.where(flag, c * 1.0000001, c * 0.9999999), None

        c, _ = jax.lax.scan(body, p, None, length=200)
        return c

    return time_fn(chain, pos, reps=3) / 200


if __name__ == "__main__":
    from mini_nbody_tpu.ops import sym_mxu_force as smf

    print(json.dumps({"backend": jax.default_backend(),
                      "gate": smf.COINCIDENT_AUTO_MIN_N}))
    for n in (4096, 8192, 16384, 32768, 65536):
        rows = {}
        for coin in ("scan-auto", "masked", "fast"):
            if coin == "scan-auto":
                saved, smf.COINCIDENT_AUTO_MIN_N = \
                    smf.COINCIDENT_AUTO_MIN_N, 0
                try:
                    sec, g = step_rate(n, "auto")
                finally:
                    smf.COINCIDENT_AUTO_MIN_N = saved
            else:
                sec, g = step_rate(n, coin)
            rows[coin] = {"s_per_step": round(sec, 8), "ginter_s": round(g, 1)}
        sc = scan_cost(n)
        print(json.dumps({"n": n, **rows,
                          "any_coincident_s": round(sc, 8)}), flush=True)
