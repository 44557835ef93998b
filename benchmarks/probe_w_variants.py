"""Probe: per-pair VPU cost of the sym_mxu w-body's components on chip.

The sym_mxu headline (417.9 G/s at N=1M) runs at 0.99 of the 19-op/pair
roofline model, so any further gain must come from removing per-pair VPU
work. This probe monkeypatches sym_mxu_force._w_block with variants and
re-jits the full N=1M force pass fresh per variant (the jit cache does not
key on module globals), measuring what each op actually costs:

  base      — shipped body: d2 + softening + fast rsqrt(r2^3) + d2==0 mask
  nomask    — mask dropped (BREAKS exact-coincident zeroing; ceiling probe)
  mulmask   — mask as w * (d2 != 0) cast (select -> convert+mul)
  d5        — w = d2 * rsqrt(r2^5): arithmetic zero at d2==0, no compare/
              select, but +2 mul (op-neutral in theory; distorts the
              softened core by d2/r2 — probe only)
  slowcube  — inv = rsqrt(r2); w = inv*inv*inv (mask kept): the non-fast
              path, for the rsqrt(x^3)-vs-rsqrt(x)+muls tradeoff on chip

Usage: python benchmarks/probe_w_variants.py [--n 1048576] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import time

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mini_nbody_tpu.ops.sym_mxu_force as M
from mini_nbody_tpu.models import init as minit


def _core(pi, pjt):
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt[0:1, :] - xi
    dy = pjt[1:2, :] - yi
    dz = pjt[2:3, :] - zi
    return dx * dx + dy * dy + dz * dz


_ORIG_W_BLOCK = M._w_block


def w_base(pi, pjt, softening, fast, mask=True):
    return _ORIG_W_BLOCK(pi, pjt, softening, fast, mask=True)


def w_nomask(pi, pjt, softening, fast, mask=True):
    d2 = _core(pi, pjt)
    r2 = d2 + jnp.asarray(softening, d2.dtype)
    if fast:
        return jax.lax.rsqrt((r2 * r2) * r2)
    inv = jax.lax.rsqrt(r2)
    return (inv * inv) * inv


def w_mulmask(pi, pjt, softening, fast, mask=True):
    d2 = _core(pi, pjt)
    r2 = d2 + jnp.asarray(softening, d2.dtype)
    w = jax.lax.rsqrt((r2 * r2) * r2)
    return w * (d2 != 0.0).astype(w.dtype)


def w_d5(pi, pjt, softening, fast, mask=True):
    d2 = _core(pi, pjt)
    r2 = d2 + jnp.asarray(softening, d2.dtype)
    r4 = r2 * r2
    return d2 * jax.lax.rsqrt((r4 * r4) * r2)


def w_slowcube(pi, pjt, softening, fast, mask=True):
    d2 = _core(pi, pjt)
    r2 = d2 + jnp.asarray(softening, d2.dtype)
    inv = jax.lax.rsqrt(r2)
    w = (inv * inv) * inv
    return jnp.where(d2 == 0.0, jnp.asarray(0.0, w.dtype), w)


def w_foldsoft(pi, pjt, softening, fast, mask=True):
    """Maskless body with softening folded into the square chain (the
    reference's dzsoft does dz^2+SOFT in ONE FMA — src/dzsoft.vhd:201).
    d2 is never materialized, so if Mosaic emits FMAs for a*b+c this
    saves the standalone +soft add (~1 op = ~6%). NOT bitwise-compatible
    with the shipped family (different association order) — probe only;
    adopting it would change both masked and maskless bodies together."""
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt[0:1, :] - xi
    dy = pjt[1:2, :] - yi
    dz = pjt[2:3, :] - zi
    r2 = dx * dx + (dy * dy + (dz * dz
                               + jnp.asarray(softening, dx.dtype)))
    return jax.lax.rsqrt((r2 * r2) * r2)


VARIANTS = {
    "base": w_base,
    "nomask": w_nomask,
    "mulmask": w_mulmask,
    "d5": w_d5,
    "slowcube": w_slowcube,
    "foldsoft": w_foldsoft,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    state = minit.uniform_random(jax.random.key(0), args.n)
    pos = jax.device_put(state.pos)
    inner = functools.partial(
        M.body_force_sym_mxu.__wrapped__,
        softening=1e-9, tile=1024, chunk=131072, interpret=False,
        split_w=False, coincident="masked")  # one kernel family: the patch
        # hits every block; variants ignore the mask kwarg by design
    orig = M._w_block
    results = {}
    for name in args.variants.split(","):
        M._w_block = VARIANTS[name]
        try:
            f = jax.jit(lambda p: inner(p))
            out = f(pos)
            np.asarray(jax.device_get(out[0, 0]))  # compile + warm
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = f(pos)
                np.asarray(jax.device_get(out[0, 0]))
                times.append(time.perf_counter() - t0)
            sec = float(np.median(times))
            gips = args.n * args.n / sec / 1e9
            results[name] = gips
            print(f"{name:10s} {sec*1e3:9.1f} ms  {gips:7.1f} GInter/s")
        finally:
            M._w_block = orig
    base = results.get("base")
    if base:
        for k, v in results.items():
            print(f"{k:10s} {v / base:+.3%} vs base" if k != "base" else "")


if __name__ == "__main__":
    main()
