"""Standalone single-chunk default-tile fix (r3g): measured rates.

body_force_symmetric/_sym_mxu with tile=None now resolve the padding-
aware scored tile for single-chunk N (symmetric_force.padded_auto_tile)
instead of the flat 1024/896-capped default. This probe times the force
pass amortized over auto_inner(n) steps per sync (the harness pattern)
for the affected regimes: fp32 mass mode at N=1024..8192 (the old 896
tile padded c to 1792/2688/4480/8960) and sym_mxu N=1024 (512 beats the
all-ordered 1024 diagonal block), old default vs new.

Run: python benchmarks/probe_standalone_tiles.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu
from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric
from mini_nbody_tpu.utils.harness import time_step_fn


def _rate(fn, s, n):
    # pseudo-Euler carry keeps values sane across the amortizing scan while
    # making every step's force computation live (no DCE).
    sec = time_step_fn(lambda pos: pos + 1e-12 * fn(pos), s.pos, n, reps=2)
    return n * float(n) / 2 / sec / 1e9


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for n in (1024, 2048, 4096, 8192):
        s = init.plummer(jax.random.key(n), n)
        old = _rate(lambda p: body_force_symmetric(p, s.mass, tile=896), s, n)
        new = _rate(lambda p: body_force_symmetric(p, s.mass), s, n)
        print(json.dumps({"kind": "fp32_mass", "n": n,
                          "old_896_gpairs_s": round(old, 1),
                          "new_default_gpairs_s": round(new, 1),
                          "speedup": round(new / old, 3)}), flush=True)
    for n in (1024, 2048):
        s = init.plummer(jax.random.key(n + 1), n)
        old = _rate(lambda p: body_force_sym_mxu(p, s.mass, tile=1024), s, n)
        new = _rate(lambda p: body_force_sym_mxu(p, s.mass), s, n)
        print(json.dumps({"kind": "sym_mxu_mass", "n": n,
                          "old_1024_gpairs_s": round(old, 1),
                          "new_default_gpairs_s": round(new, 1),
                          "speedup": round(new / old, 3)}), flush=True)


if __name__ == "__main__":
    main()
