"""Measure the batched ensemble BACKWARD vs the r3 scan-of-backwards.

Round-3 VERDICT missing #3: the ensemble forward needed a leading-system-
axis grid kernel to escape a 241x per-system-launch anomaly (commit
e987bec), but the ensemble VJP stayed a lax.scan of standalone backward
launches with no measurement of whether it suffered the same class. Round
4 built vjp_pos_sym_ensemble / vjp_pos_sym_mxu_ensemble (the batched grid
backwards, bitwise per system on TPU); this probe times, at B=64 N=1024
(the forward anomaly's shape) and B=8 N=512:

  * the batched ensemble backward (ONE pallas_call, grid (B, nb, nd));
  * the r3 pattern: lax.scan over systems of the standalone backward;
  * B separate standalone backward calls (Python loop, per-call sync) —
    the "standalone-sum" yardstick the verdict's done-criterion names.

Rates in G pair-grads/s = B * N^2 / sec / 1e9 (each system's backward
touches N^2 ordered pair gradients). Run on chip:
    python benchmarks/probe_ens_bwd.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym, vjp_pos_sym_ensemble
from mini_nbody_tpu.ops.vjp_mxu import vjp_pos_sym_mxu, vjp_pos_sym_mxu_ensemble
from mini_nbody_tpu.utils.harness import time_fn


def batch(b, n):
    ss = [init.plummer(jax.random.key(300 + i), n) for i in range(b)]
    pos = jnp.stack([s.pos for s in ss])
    g = jnp.stack([jnp.sin(7.0 * s.pos) for s in ss])
    mass = jnp.stack([s.mass for s in ss])
    return pos, g, mass


def emit(kind, cls, b, n, sec):
    print(json.dumps({"kind": kind, "class": cls, "B": b, "n": n,
                      "sec": round(sec, 6),
                      "gpairgrads_s": round(b * n * n / sec / 1e9, 2)}),
          flush=True)


def chained(apply_bwd, pos, g, mass, k):
    """Amortize the ~33 ms tunnel sync over k chained backward calls:
    each iteration's cotangent is the previous pbar (scaled bounded), so
    XLA cannot hoist or dedupe the calls. Returns sec per call."""

    @jax.jit
    def chain(pos, g, mass):
        def body(gc, _):
            pbar = apply_bwd(pos, gc, mass)
            return 1e-3 * pbar, None

        out, _ = jax.lax.scan(body, g, None, length=k)
        return out

    return time_fn(chain, pos, g, mass, reps=3) / k


def main():
    k = 100
    print(json.dumps({"backend": jax.default_backend(), "chain_k": k}),
          flush=True)
    for b, n in ((64, 1024), (8, 512)):
        pos, g, mass = batch(b, n)
        for cls, ens, one in (("fp32", vjp_pos_sym_ensemble, vjp_pos_sym),
                              ("mxu", vjp_pos_sym_mxu_ensemble,
                               vjp_pos_sym_mxu)):
            sec = chained(functools.partial(ens, tile=None), pos, g, mass, k)
            emit("batched", cls, b, n, sec)

            def scan_of_standalone(pos, gc, mass, _one=one):
                def body(_, args):
                    p, gb, m = args
                    return None, _one(p, gb, m)

                _, bars = jax.lax.scan(body, None, (pos, gc, mass))
                return bars

            sec = chained(scan_of_standalone, pos, g, mass, k)
            emit("scan_of_standalone", cls, b, n, sec)

            # B separate standalone calls per chain iteration (the r3
            # pre-batched reality minus per-call dispatch: the kernels'
            # own per-launch cost at standalone grid sizes)
            def loop_standalone(pos, gc, mass, _one=one, _b=b):
                return jnp.stack([_one(pos[i], gc[i], mass[i])
                                  for i in range(_b)])

            sec = chained(loop_standalone, pos, g, mass, k // 4)
            emit("loop_standalone", cls, b, n, sec)


if __name__ == "__main__":
    main()
