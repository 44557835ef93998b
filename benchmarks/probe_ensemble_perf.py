"""Diagnose the batched-ensemble throughput anomaly (r3e probe follow-up).

probe_coincident_r3d measured simulate_ensemble at B=64, N=1024, 200 steps
taking ~20 s (0.3 G pairs/s) while 64 looped standalone simulate() calls took
0.30 s (22.6 G/s) — the opposite of the design claim ("batched systems run at
the big-N streamed rate"). This probe times the components to localize the
cost:

  * one ensemble force eval per coincident mode (auto / masked / fast),
  * the vmapped any_coincident duplicate scan alone (the per-step lexsort
    'auto' pays inside the jitted step),
  * the full 200-step simulate_ensemble per coincident mode,
  * one standalone streamed force eval at the same N for scale.

Run on the real chip: `python benchmarks/probe_ensemble_perf.py`.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mini_nbody_tpu import SimConfig
from mini_nbody_tpu.models import init
from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.ops.sym_mxu_force import (any_coincident,
                                              body_force_sym_mxu,
                                              body_force_sym_mxu_ensemble)
from mini_nbody_tpu.utils.harness import time_fn

B, N, STEPS = 64, 1024, 200


def _emit(kind, mode, sec, pairs, extra=None):
    row = {"kind": kind, "mode": mode, "sec": round(sec, 6),
           "gpairs_s": round(pairs / sec / 1e9, 2)}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    print(json.dumps({"backend": jax.default_backend(), "B": B, "n": N,
                      "steps": STEPS}), flush=True)
    ss = [init.uniform_random(jax.random.key(200 + i), N) for i in range(B)]
    st = BodyState(pos=jnp.stack([s.pos for s in ss]),
                   vel=jnp.stack([s.vel for s in ss]),
                   mass=jnp.stack([s.mass for s in ss]))
    pairs_eval = B * float(N) * N / 2

    # 1. single ensemble force eval, per mode
    for mode in ("auto", "masked", "fast"):
        sec = time_fn(lambda m=mode: body_force_sym_mxu_ensemble(
            st.pos, coincident=m))
        _emit("ens_force_eval", mode, sec, pairs_eval)

    # 2. the duplicate scan alone (what 'auto' adds per step)
    scan = jax.jit(lambda p: jnp.any(jax.vmap(any_coincident)(p)))
    sec = time_fn(lambda: scan(st.pos))
    _emit("dup_scan_vmapped", "auto", sec, pairs_eval)
    scan1 = jax.jit(any_coincident)
    sec = time_fn(lambda: scan1(st.pos[0]))
    _emit("dup_scan_single", "auto", sec, float(N) * N / 2)

    # 3. full multi-step run, per mode
    from mini_nbody_tpu.sim import simulate_ensemble

    for mode in ("auto", "masked", "fast"):
        cfg = SimConfig(n=N, dt=1e-4, steps=STEPS, backend="sym_mxu",
                        coincident=mode)
        sec = time_fn(lambda c=cfg: simulate_ensemble(c, st).pos, reps=2)
        _emit("ens_sim_200", mode, sec, pairs_eval * STEPS,
              {"us_per_step": round(sec / STEPS * 1e6, 1)})

    # 4. standalone streamed force eval at the same per-system N for scale
    s0 = ss[0]
    for mode in ("auto", "masked"):
        sec = time_fn(lambda m=mode: body_force_sym_mxu(
            s0.pos, coincident=m))
        _emit("standalone_force_eval_n1024", mode, sec, float(N) * N / 2)
    # and one big-N eval for the "streamed rate" yardstick
    sb = init.uniform_random(jax.random.key(7), B * N)
    sec = time_fn(lambda: body_force_sym_mxu(sb.pos))
    _emit("standalone_force_eval_n65536", "auto", sec,
          float(B * N) * (B * N) / 2)


if __name__ == "__main__":
    main()
