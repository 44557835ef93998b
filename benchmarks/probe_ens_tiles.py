"""On-chip check + tile shmoo for the batched-grid ensemble kernel (r3f).

1. Bitwise equivalence: batched ensemble force vs standalone per-system
   calls, on the REAL chip (the CPU interpret suite already passes; this
   confirms Mosaic's block-transition semantics for the leading system
   axis — per-system colsT blocks, rows revisits across the s boundary).
2. Per-system tile shmoo of the 200-step ensemble sim: at tile=N each
   system is ONE diagonal block paying ~19 VPU ops per ORDERED
   interaction (no symmetry halving); nb=2/4 halve less of the work but
   run smaller (T,T) vector ops. Measures which wins at N=1024, B=64.

Run: python benchmarks/probe_ens_tiles.py
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
from mini_nbody_tpu.ops.sym_mxu_force import (body_force_sym_mxu,
                                              body_force_sym_mxu_ensemble)
from mini_nbody_tpu.sim import simulate_ensemble
from mini_nbody_tpu.utils.config import round_up
from mini_nbody_tpu.utils.harness import time_fn

B, N, STEPS = 64, 1024, 200


def main():
    print(json.dumps({"backend": jax.default_backend(), "B": B, "n": N}),
          flush=True)
    ss = [init.plummer(jax.random.key(300 + i), N) for i in range(B)]
    st = BodyState(pos=jnp.stack([s.pos for s in ss]),
                   vel=jnp.stack([s.vel for s in ss]),
                   mass=jnp.stack([s.mass for s in ss]))

    # 1. on-chip bitwise vs standalone (masses + unit, tile 1024 and 512)
    for tile in (1024, 512):
        c = round_up(N, tile)
        f = np.asarray(body_force_sym_mxu_ensemble(st.pos, st.mass,
                                                   tile=tile))
        for i in (0, B // 2, B - 1):
            ref = np.asarray(body_force_sym_mxu(ss[i].pos, ss[i].mass,
                                                tile=tile, chunk=c))
            assert (f[i] == ref).all(), f"tile={tile} sys={i} mismatch"
        print(json.dumps({"check": "bitwise_vs_standalone", "tile": tile,
                          "ok": True}), flush=True)

    # 2. tile shmoo of the full sim (amortized; pairs = ordered/2)
    pairs = B * STEPS * float(N) * N / 2
    for tile in (1024, 512, 256):
        cfg = SimConfig(n=N, dt=1e-4, steps=STEPS, backend="sym_mxu",
                        sym_tile=tile, use_masses=True)
        sec = time_fn(lambda c=cfg: simulate_ensemble(c, st).pos, reps=3)
        print(json.dumps({"kind": "ens_sim", "tile": tile,
                          "us_per_step": round(sec / STEPS * 1e6, 1),
                          "gpairs_s": round(pairs / sec / 1e9, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
