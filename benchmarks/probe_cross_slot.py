"""Probe: time the PRODUCTION cross kernel per slot, scan-amortized.

probe_mxu_residual.py's repeat-grid harness measured its 'full' variant at
5.36 us/slot while the production-derived figure (N=1M step time minus the
tri calls' share) is ~4.4 us/slot — a 20% gap that is either a harness
artifact (the R-axis) or a real body difference. This times the REAL
`_build_calls` cross kernel (maskless, split_w=False — the N>=16384 'auto'
configuration) as a jitted lax.scan of `reps` calls per sync, outputs
threaded into the carry so XLA cannot DCE or CSE the calls.

Run on-chip: python benchmarks/probe_cross_slot.py

MEASURED (r4, v5e, ~2 s device work per sync): 4.412 us/slot at
c=32768 (475.4 G 2-per-eval inter/s) and 4.417 us/slot at c=131072
(474.7) — NO call-geometry effect; the apparent 5.3-vs-4.9 c-dependence
of the first revisions was entirely the 13-25% sync share of their
0.1-0.24 s calls. Matches the production-step-derived 4.41-4.44
us/slot at N=1M/4M exactly. Writeup: RESULTS.md "Slot decomposition".
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.ops.sym_mxu_force import _build_calls, _pack
from mini_nbody_tpu.utils.config import SOFTENING
from mini_nbody_tpu.utils.harness import time_fn

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
T = 1024
# Target ~2 s of device work per sync: the ~28-33 ms fixed tunnel overhead
# drops below 1.5% (the first revision's 0.1-0.24 s calls carried a 13-25%
# sync share, inflating slot times by up to ~1.1 us).
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else max(
    2, int(2.0 / ((N / T) ** 2 * 4.4e-6)))


def main():
    from mini_nbody_tpu.models import init

    print(json.dumps({"backend": jax.default_backend(), "n": N, "tile": T,
                      "reps": REPS}))
    _, cross_call = _build_calls(SOFTENING, T, N, interpret=False,
                                 split_w=False, mask_offdiag=False)
    s = init.plummer(jax.random.key(7), 2 * N)
    pa, _, va = _pack(s.pos[:N], None, N, N)
    _, pbt, vb = _pack(s.pos[N:], None, N, N)

    @jax.jit
    def multi(p):
        def body(c, _):
            rows, colsT = cross_call(c, pbt, va, vb)
            # Thread the outputs back into the carry (defeats CSE/DCE);
            # one (N,3) elementwise add of zeros is ~free.
            return c + 0.0 * rows[:, :3], None

        c2, _ = jax.lax.scan(body, p, None, length=REPS)
        return c2

    dt = time_fn(multi, pa)
    slots = REPS * (N // T) ** 2
    print(json.dumps({
        "us_call": round(dt * 1e6, 1),
        "us_slot": round(dt * 1e6 / slots, 3),
        "g_inter_s": round(2.0 * REPS * N * N / dt / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
