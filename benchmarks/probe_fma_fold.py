"""Probe: can folding SOFTENING into the d2 FMA chain buy a VPU slot?

The maskless w-pipeline today (ops/sym_mxu_force._w_block) is
    d2 = dx*dx + dy*dy + dz*dz      # mul, fma, fma
    r2 = d2 + SOFTENING             # plain add -- no mul left to fuse
    w  = rsqrt((r2*r2)*r2)
i.e. the softening add occupies its own VPU issue slot. Reassociating to
    r2 = dz*dz + (dy*dy + (dx*dx + SOFTENING))   # fma, fma, fma
starts the chain from the constant so every add has a multiply to fuse
with: one fewer instruction slot out of ~13 (rsqrt ~4.7 slots), a
predicted ~5-7% on the VPU-bound portion of the force pass.

This probe A/Bs the two bodies with the probe_vpu_peak w_mix harness
(same ILP chains, same scan; see that module for why the chain cannot be
constant-folded). Rates are reported in CHAIN BODIES/s (bodies * elems /
s), which is the honest unit for an A/B of two different instruction
sequences. Run on-chip:
    python benchmarks/probe_fma_fold.py
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.utils.harness import time_fn

SHAPE = (2048, 512)
SCAN = 400


def make_mix(chains, folded, k_unroll=16):
    @jax.jit
    def run(x):
        def body(c, _):
            ys = [c * (1.0 + float(k) * 1e-3) for k in range(chains)]
            for _ in range(k_unroll):
                new = []
                for y in ys:
                    dx = y - 0.125
                    dy = y - 1.0
                    dz = y - 2.0
                    if folded:
                        r2 = dz * dz + (dy * dy + (dx * dx + 1.0))
                    else:
                        d2 = dx * dx + dy * dy + dz * dz
                        r2 = d2 + 1.0
                    new.append(jax.lax.rsqrt((r2 * r2) * r2))
                ys = new
            c = ys[0]
            for y in ys[1:]:
                c = c + y
            return c * (1.0 / chains), None

        c, _ = jax.lax.scan(body, x, None, length=SCAN)
        return c

    return run, k_unroll * chains * SCAN


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}))
    x = jax.random.uniform(jax.random.key(0), SHAPE, jnp.float32, 0.25, 0.75)
    elems = SHAPE[0] * SHAPE[1]
    for chains in (16, 32, 64):
        row = {"chains": chains}
        for name, folded in (("plain", False), ("folded", True)):
            run, bodies = make_mix(chains, folded)
            dt = time_fn(lambda: run(x))
            row[name] = bodies * elems / dt / 1e9  # G bodies/s
        row["speedup"] = row["folded"] / row["plain"]
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}))
