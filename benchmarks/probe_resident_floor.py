"""Ablation probe: where does the resident_sym per-band-slot floor come from?

Mirrors ops/resident_sym.py's grid structure ((steps, nb + n_int, nd), fp32
VPU force path) with toggleable phases, and times the per-step cost by the
slope between two step counts (launch/sync overhead cancels).

Variants:
  full        — force + per-block integrate slots (the shipped structure)
  noforce     — force body ablated (transpose + zeroing + integrate kept)
  empty       — all @pl.when bodies ablated: the pure grid-slot floor
  fusedint    — force kept, the nb integrate slots replaced by ONE slot
                running a fori_loop over blocks
  notranspose — full minus the per-(step,i) pw transpose

Run AFTER the TPU suite finishes (each variant x steps is a fresh remote
Mosaic compile). Usage: python benchmarks/probe_resident_floor.py [--n 8192]
[--tile 512] [--mxu]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.ops.pallas_compat import CompilerParams, fast_rsqrt_cube
from mini_nbody_tpu.ops import resident_sym as rs
from mini_nbody_tpu.utils.config import FAR, SOFTENING, round_up


def _kernel(in_ref, st_ref, rows_ref, cols_ref, pw_ref, *,
            tile, nb, nd, dt, softening, masses, mxu, fast,
            do_force, do_int, fuse_int, do_transpose):
    del in_ref
    i = pl.program_id(1)
    d = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, d == 0))
    def _zero():
        rows_ref[:] = jnp.zeros_like(rows_ref)
        cols_ref[:] = jnp.zeros_like(cols_ref)

    is_force = i < nb

    if do_transpose:
        @pl.when(jnp.logical_and(is_force, d == 0))
        def _transpose_i_tile():
            pw_ref[:] = jnp.swapaxes(rs._blk(st_ref, i), 0, 1)

    force_on = jnp.logical_and(
        is_force, jnp.logical_or(d * 2 != nb, i * 2 < nb))

    if do_force:
        @pl.when(force_on)
        def _force():
            rs._force_block(st_ref, rows_ref, cols_ref, pw_ref,
                            i, d, nb=nb, softening=softening,
                            masses=masses, mxu=mxu, fast=fast)

    if do_int and not fuse_int:
        blk = (i - nb) * nd + d

        @pl.when(jnp.logical_and(i >= nb, blk < nb))
        def _integrate():
            rs._integrate_block(st_ref, rows_ref, cols_ref, blk,
                                dt=dt, mxu=mxu)

    if do_int and fuse_int:
        # single trailing slot integrates every block via fori_loop
        @pl.when(jnp.logical_and(i == nb, d == 0))
        def _integrate_all():
            def body(b, _):
                rs._integrate_block(st_ref, rows_ref, cols_ref, b,
                                    dt=dt, mxu=mxu)
                return 0
            jax.lax.fori_loop(0, nb, body, 0)


def run_variant(pos, vel, *, steps, tile, mxu, variant, interpret=False):
    n = pos.shape[0]
    tile = min(tile, round_up(n, 8))
    tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    nb = np_ // tile
    nd = nb // 2 + 1
    do_force = variant in ("full", "fusedint", "notranspose")
    do_int = True
    fuse_int = variant == "fusedint"
    do_transpose = (variant != "notranspose") and (variant != "empty")
    if variant == "empty":
        do_force = False
        do_int = False
    if variant == "noforce":
        do_force = False
    if fuse_int:
        n_int = 1
    else:
        n_int = -(-nb // nd)

    pad = np_ - n
    pos = pos.astype(jnp.float32)
    vel = vel.astype(jnp.float32)
    if pad:
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=FAR)
        vel = jnp.pad(vel, ((0, pad), (0, 0)))
    m = jnp.ones((np_,), jnp.float32)
    wide = jnp.concatenate(
        [pos.T, vel.T, m[None, :], jnp.zeros((1, np_), jnp.float32)], axis=0)
    wide = (wide.reshape(8, nb, tile).transpose(1, 0, 2)
            .reshape(8 * nb, tile))

    fast = fast_rsqrt_cube(SOFTENING)
    vm = pltpu.VMEM
    fn = pl.pallas_call(
        functools.partial(_kernel, tile=tile, nb=nb, nd=nd, dt=0.01,
                          softening=float(SOFTENING), masses=False,
                          mxu=mxu, fast=fast, do_force=do_force,
                          do_int=do_int, fuse_int=fuse_int,
                          do_transpose=do_transpose),
        grid=(steps, nb + n_int, nd),
        in_specs=[pl.BlockSpec((8 * nb, tile), lambda s, i, d: (0, 0),
                               memory_space=vm)],
        out_specs=pl.BlockSpec((8 * nb, tile), lambda s, i, d: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((8 * nb, tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8 * nb, tile), jnp.float32),
            pltpu.VMEM((8 * nb, tile), jnp.float32),
            pltpu.VMEM((tile, 8), jnp.float32),
        ],
        input_output_aliases={0: 0},
        compiler_params=CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return fn(wide)


def timed(pos, vel, *, steps, tile, mxu, variant, reps=3):
    out = run_variant(pos, vel, steps=steps, tile=tile, mxu=mxu,
                      variant=variant)
    np.asarray(jax.device_get(out.ravel()[0]))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_variant(pos, vel, steps=steps, tile=tile, mxu=mxu,
                          variant=variant)
        np.asarray(jax.device_get(out.ravel()[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--mxu", action="store_true")
    ap.add_argument("--s1", type=int, default=256)
    ap.add_argument("--s2", type=int, default=1024)
    ap.add_argument("--variants", type=str,
                    default="full,noforce,empty,fusedint")
    args = ap.parse_args()

    key = jax.random.key(0)
    kp, kv = jax.random.split(key)
    pos = jax.random.normal(kp, (args.n, 3), jnp.float32)
    vel = 0.01 * jax.random.normal(kv, (args.n, 3), jnp.float32)

    tile = min(args.tile, round_up(args.n, 8))
    np_ = round_up(args.n, round_up(tile, 128))
    nb = np_ // round_up(tile, 128)
    nd = nb // 2 + 1
    print(f"# n={args.n} tile={args.tile} mxu={args.mxu} nb={nb} nd={nd} "
          f"force_slots/step={nb * nd} int_slots/step={nb}")
    for variant in args.variants.split(","):
        t1 = timed(pos, vel, steps=args.s1, tile=args.tile, mxu=args.mxu,
                   variant=variant)
        t2 = timed(pos, vel, steps=args.s2, tile=args.tile, mxu=args.mxu,
                   variant=variant)
        per_step = (t2 - t1) / (args.s2 - args.s1)
        slots = nb * nd + (1 if variant == "fusedint" else nb)
        if variant == "empty":
            slots = nb * nd + nb
        print(f"{variant:12s} per_step={per_step * 1e6:8.2f} us  "
              f"per_slot={per_step / slots * 1e6:6.3f} us  "
              f"ginter={args.n * args.n / per_step / 1e9:7.1f} G/s")


if __name__ == "__main__":
    main()
