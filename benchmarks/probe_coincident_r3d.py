"""Probe: on-chip rates for the round-3d coincident-routing family.

Measures masked vs auto vs fast for every kernel that gained the flag in
round 3d, on one v5e:

  bwd_mxu   — vjp_pos_sym_mxu (the production bf16-class backward),
              unit-mass and mass_grad, N=65536
  bwd_fp32  — vjp_pos_sym (fp32-exact backward), unit-mass, N=65536
  resident  — simulate_resident_sym masked vs fast (auto == masked there),
              mxu N=4096/65536 and fp32 N=512, amortized over many steps
  mxu_sq    — body_force_mxu square call, masked vs auto, N=262144

Also asserts on-chip equivalence per kernel's documented class: bitwise
for the matmul-fed kernels (bwd_mxu, mxu_sq), few-ulp for the
elementwise-chain ones (bwd_fp32, resident).

Usage: python benchmarks/probe_coincident_r3d.py [--reps 3]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init
from mini_nbody_tpu.utils.harness import time_fn


def _emit(kind, mode, n, seconds, pairs_per_call, extra=None):
    rec = {"kind": kind, "mode": mode, "n": n, "sec": round(seconds, 6),
           "gops": round(pairs_per_call / seconds / 1e9, 1)}
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)
    return rec["gops"]


def probe_bwd_mxu(reps):
    from mini_nbody_tpu.ops.vjp_mxu import vjp_pos_sym_mxu

    n = 65536
    s = init.plummer(jax.random.key(1), n)
    g = jax.random.normal(jax.random.key(2), (n, 3), jnp.float32)
    outs = {}
    for mode in ("masked", "auto", "fast"):
        fn = lambda: vjp_pos_sym_mxu(s.pos, g, coincident=mode)
        sec = time_fn(fn, reps=reps)
        _emit("bwd_mxu_unit", mode, n, sec, n * n / 2)
        outs[mode] = np.asarray(fn())
    assert (outs["auto"] == outs["masked"]).all(), "bwd_mxu auto != masked"
    assert (outs["fast"] == outs["masked"]).all(), "bwd_mxu fast != masked"
    for mode in ("masked", "auto"):
        fn = lambda: vjp_pos_sym_mxu(s.pos, g, s.mass, coincident=mode,
                                     mass_grad=True)
        sec = time_fn(fn, reps=reps)
        _emit("bwd_mxu_massgrad", mode, n, sec, n * n / 2)


def probe_bwd_fp32(reps):
    from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym

    n = 65536
    s = init.plummer(jax.random.key(3), n)
    g = jax.random.normal(jax.random.key(4), (n, 3), jnp.float32)
    outs = {}
    for mode in ("masked", "auto", "fast"):
        fn = lambda: vjp_pos_sym(s.pos, g, coincident=mode)
        sec = time_fn(fn, reps=reps)
        _emit("bwd_fp32_unit", mode, n, sec, n * n / 2)
        outs[mode] = np.asarray(fn())
    scale = np.abs(outs["masked"]).max()
    for mode in ("auto", "fast"):
        err = np.abs(outs[mode] - outs["masked"]).max() / scale
        print(json.dumps({"kind": "bwd_fp32_relerr", "mode": mode,
                          "err": float(err)}), flush=True)
        assert err < 3e-5, f"bwd_fp32 {mode} beyond few-ulp window: {err}"


def probe_resident(reps):
    from mini_nbody_tpu.ops.resident_sym import simulate_resident_sym

    for mxu, n, steps in ((True, 4096, 2000), (True, 65536, 20),
                          (False, 512, 20000)):
        s = init.uniform_random(jax.random.key(5), n)
        outs = {}
        for mode in ("masked", "fast"):
            fn = lambda: simulate_resident_sym(
                s.pos, s.vel, steps=steps, dt=1e-4, mxu=mxu,
                coincident=mode)
            sec = time_fn(fn, reps=reps)
            _emit(f"resident_{'mxu' if mxu else 'fp32'}", mode, n,
                  sec, steps * n * n / 2, {"steps": steps})
            outs[mode] = np.asarray(fn()[0])
        scale = np.abs(outs["masked"]).max()
        err = np.abs(outs["fast"] - outs["masked"]).max() / scale
        print(json.dumps({"kind": "resident_relerr", "mxu": mxu, "n": n,
                          "err": float(err)}), flush=True)


def probe_mxu_square(reps):
    from mini_nbody_tpu.ops.mxu_force import body_force_mxu

    n = 262144
    s = init.uniform_random(jax.random.key(6), n)
    outs = {}
    for mode in ("masked", "auto"):
        fn = lambda: body_force_mxu(s.pos, s.pos, coincident=mode)
        sec = time_fn(fn, reps=reps)
        _emit("mxu_square", mode, n, sec, float(n) * n)
        outs[mode] = np.asarray(fn())
    assert (outs["auto"] == outs["masked"]).all(), "mxu_sq auto != masked"


def probe_ensemble(reps):
    """Ensemble throughput: B systems batched in one program vs B
    standalone streamed runs (r3e feature; expect the batched rate near
    the big-N streamed rate while per-system launches pay dispatch
    overhead per system)."""
    import jax.numpy as jnp

    from mini_nbody_tpu import SimConfig, simulate, simulate_ensemble
    from mini_nbody_tpu.models.state import BodyState

    bb, n, steps = 64, 1024, 200
    ss = [init.uniform_random(jax.random.key(200 + i), n) for i in range(bb)]
    st = BodyState(pos=jnp.stack([s.pos for s in ss]),
                   vel=jnp.stack([s.vel for s in ss]),
                   mass=jnp.stack([s.mass for s in ss]))
    cfg = SimConfig(n=n, dt=1e-4, steps=steps, backend="sym_mxu")
    sec = time_fn(lambda: simulate_ensemble(cfg, st).pos, reps=reps)
    _emit("ensemble_batched", "sym_mxu", n, sec,
          bb * steps * float(n) * n / 2, {"B": bb, "steps": steps})
    cfg1 = cfg.replace(resident=False)
    sec1 = time_fn(
        lambda: [simulate(cfg1, s).pos for s in ss][-1], reps=max(1, reps - 1))
    _emit("ensemble_looped", "sym_mxu", n, sec1,
          bb * steps * float(n) * n / 2, {"B": bb, "steps": steps})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", choices=["bwd_mxu", "bwd_fp32", "resident",
                                       "mxu_sq", "ensemble"], default=None)
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend(),
                      "device": jax.devices()[0].device_kind}), flush=True)
    probes = {"bwd_mxu": probe_bwd_mxu, "bwd_fp32": probe_bwd_fp32,
              "resident": probe_resident, "mxu_sq": probe_mxu_square,
              "ensemble": probe_ensemble}
    for name, fn in probes.items():
        if args.only in (None, name):
            fn(args.reps)


if __name__ == "__main__":
    main()
