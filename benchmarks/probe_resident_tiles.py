"""Post-scratch-cleanup VMEM probe for ops/resident_sym.py tile caps.

The auto_tile caps (fp32 768 / mxu 1024, and 512 above N=32768) were
compile-verified BEFORE the (tile, 8) pw scratch replaced the old 4 MB
identity scratch; bigger tiles may now fit. Compiles + times each
candidate on the real chip. Usage:
  python benchmarks/probe_resident_tiles.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.ops.resident_sym import simulate_resident_sym


def probe(n, tile, mxu, use_mass=False, s1=256, s2=1024):
    key = jax.random.key(0)
    kp, kv = jax.random.split(key)
    pos = jax.random.normal(kp, (n, 3), jnp.float32)
    vel = 0.01 * jax.random.normal(kv, (n, 3), jnp.float32)
    mass = (1.0 + jax.random.uniform(key, (n,), jnp.float32)
            if use_mass else None)

    def timed(steps, reps=3):
        p, v = simulate_resident_sym(pos, vel, mass, steps=steps, dt=0.01,
                                     mxu=mxu, tile=tile)
        np.asarray(jax.device_get(p.ravel()[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            p, v = simulate_resident_sym(pos, vel, mass, steps=steps,
                                         dt=0.01, mxu=mxu, tile=tile)
            np.asarray(jax.device_get(p.ravel()[0]))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    try:
        # scale step counts down for big N so each probe stays ~seconds
        if n >= 32768:
            s1, s2 = 16, 64
        elif n >= 8192:
            s1, s2 = 64, 256
        t1 = timed(s1)
        t2 = timed(s2)
        per = (t2 - t1) / (s2 - s1)
        print(f"n={n:7d} tile={tile:5} mxu={int(mxu)} mass={int(use_mass)}"
              f"  OK  per_step={per * 1e6:9.2f} us  "
              f"ginter={n * n / per / 1e9:7.1f} G/s", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"n={n:7d} tile={tile:5} mxu={int(mxu)} mass={int(use_mass)}"
              f"  FAIL  {msg}", flush=True)


if __name__ == "__main__":
    cases = [
        # fp32 tile=1024 (old cap 768 — did the freed 4 MB unlock it?)
        (8192, 1024, False),
        # above-32k band: old cap 512; try 768/1024 both classes
        (65536, 768, False),
        (65536, 1024, True),
        # mid-N mxu with max tile (in-cap, for the floor comparison)
        (8192, 1024, True),
    ]
    import sys as _s
    if len(_s.argv) > 1:
        # "n,tile,mxu" triplets from argv
        cases = []
        for a in _s.argv[1:]:
            parts = a.split(",")
            n, t, m = int(parts[0]), int(parts[1]), bool(int(parts[2]))
            um = bool(int(parts[3])) if len(parts) > 3 else False
            cases.append((n, t, m, um))
    for case in cases:
        probe(*case)
