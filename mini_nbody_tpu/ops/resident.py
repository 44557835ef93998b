"""Whole-simulation-resident kernel: the ENTIRE trajectory runs inside ONE
Pallas kernel launch, with the full body state living in VMEM across steps.

SUPERSEDED (round 3) by ops/resident_sym.py — sublane-major 32 B/body
state (vs this kernel's lane-padded 512 B/body), symmetric + MXU-hybrid
math, leapfrog support, and a 16x larger N cap. sim.simulate routes there;
this module remains as the direct-ordered baseline variant and for its
round-2 measurements. NOTE: its "3.9x streamed at N=4096" figure below was
measured against the round-2 un-amortized harness; with scan-amortized
timing the streamed path wins at N=4096 (see resident_sym's docstring).

Why: at small N every backend is launch-bound, not compute-bound — measured
~500 us of fixed per-step overhead (kernel launch + scan iteration) against
~96 us of pure force compute at N=4096 (23 VPU ops/ordered pair at the
measured 4e12 ops/s; benchmarks/RESULTS.md "small-N").
The reference FPGA's home regime IS small N (it caps at 32,767 bodies and
its pitch is low fixed overhead: a ~145-cycle pass setup,
/root/reference .../top_level.vhd:45 + SURVEY §6). The TPU answer is to
hoist the STEP LOOP into the kernel grid: grid = (steps, i-blocks,
j-blocks), so the launch cost amortizes over the whole trajectory and the
per-step cost approaches pure compute.

Layout: state rides in a (Np, 8) fp32 buffer [x y z vx vy vz m pad] —
"wide" rows give the i-side its column operands for free. The j-side needs
(8, T) transposed rows; a per-step transposed copy is built tile-by-tile
with one MXU identity-matmul per j-tile (out[c, a] = sum_k wide[k, c]
I[k, a] — the standard TPU transpose-via-matmul, ~1 us per tile, done only
at i == 0). Double-buffered wide state (read step s from one buffer, write
integrated rows to the other, parity-swapped) keeps later i-blocks reading
the un-integrated positions — the in-VMEM analog of the reference keeping
state in the shared RAM across passes (src/top_level.vhd:180-186).

Force math is the direct ordered-pair form (self pair contributes d*w = 0
exactly, as in ops/pallas_force.py; FAR-padded tails underflow). Euler
semantics (v += dt F; x += dt v) fused per i-tile at its last j-block —
the reference's host-side integrate, in-kernel.

VMEM bounds the resident size: two (Np, 8) wide buffers lane-pad to
512 B/body, so N <= ~8192 fits comfortably (T=512). (sim.simulate no
longer routes here — resident_sym superseded this module, see the note
above.) Accumulator is a (T, 8) scratch reused across i-blocks (grid
iterations are sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_nbody_tpu.utils.config import FAR, SOFTENING, round_up

from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams,
    fast_rsqrt_cube,
)

#: VMEM bound for the resident path: 2 double-buffered (N, 8) wide buffers
#: at 512 B/body (lane padding) + block temporaries.
RESIDENT_MAX_N = 8192


def _transpose_tile(wide_tile, tile):
    """(T, 8) -> (8, T) via an MXU identity matmul (module docstring)."""
    ident = (jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
             ).astype(jnp.float32)
    return jax.lax.dot_general(
        wide_tile, ident, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # identity contraction: exact
        preferred_element_type=jnp.float32,
    )


def _step_block(src, dst, trans_ref, acc_ref, i, j, *, tile, nb, dt,
                softening, masses, fast):
    """One (i-tile, j-block) of one step, reading wide src / writing dst.
    (An in-kernel fori_loop over j measured SLOWER than the grid form —
    94.5 vs 100.7 GInter/s at N=4096 — so j stays a grid dimension; the
    accumulator is a (T, 8) scratch reused across i-tiles since grid
    iterations are sequential.)"""
    ci = pl.ds(i * tile, tile)
    cj = pl.ds(j * tile, tile)

    @pl.when(i == 0)
    def _build_trans():
        trans_ref[:, cj] = _transpose_tile(src[cj, :], tile)

    pi = src[ci, :]  # (T, 8)
    tj = trans_ref[:, cj]  # (8, T)
    dx = tj[0:1, :] - pi[:, 0:1]
    dy = tj[1:2, :] - pi[:, 1:2]
    dz = tj[2:3, :] - pi[:, 2:3]
    r2 = dx * dx + dy * dy + dz * dz + jnp.asarray(softening, jnp.float32)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if masses:
        w = w * tj[6:7, :]
    fx = jnp.sum(w * dx, axis=1, keepdims=True)
    fy = jnp.sum(w * dy, axis=1, keepdims=True)
    fz = jnp.sum(w * dz, axis=1, keepdims=True)
    f = jnp.concatenate(
        [fx, fy, fz, jnp.zeros((fx.shape[0], 5), jnp.float32)], axis=1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = f

    @pl.when(j > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + f

    @pl.when(j == nb - 1)
    def _integrate():
        vnew = pi[:, 3:6] + dt * acc_ref[:, 0:3]
        xnew = pi[:, 0:3] + dt * vnew
        dst[ci, :] = jnp.concatenate([xnew, vnew, pi[:, 6:8]], axis=1)


def _resident_kernel(in_ref, a_ref, b_ref, trans_ref, acc_ref, *, tile, nb,
                     dt, softening, masses, fast):
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(s == 0, jnp.logical_and(i == 0, j == 0)))
    def _load():
        a_ref[...] = in_ref[...]

    block = functools.partial(
        _step_block, trans_ref=trans_ref, acc_ref=acc_ref, i=i, j=j,
        tile=tile, nb=nb, dt=dt, softening=softening, masses=masses,
        fast=fast)

    @pl.when(s % 2 == 0)
    def _even():
        block(a_ref, b_ref)

    @pl.when(s % 2 == 1)
    def _odd():
        block(b_ref, a_ref)


@functools.partial(
    jax.jit,
    static_argnames=("steps", "dt", "softening", "tile", "interpret"),
)
def simulate_resident(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    tile: int | None = None,
    interpret: bool = False,
):
    """Run `steps` Euler steps entirely inside one kernel launch (module
    docstring). Returns (pos, vel) after the final step. N is bounded by
    RESIDENT_MAX_N (VMEM); mass=None is the unit-mass fast path. tile=None
    auto-sizes: 1024 up to N=4096 (125.4 GInter/s at N=4096 vs 100.1 at
    512), 512 above (1024's (T,T) temporaries exceed VMEM with the larger
    wide buffers)."""
    n = pos.shape[0]
    if tile is None:
        tile = 1024 if n <= 4096 else 512
    if n > RESIDENT_MAX_N:
        raise ValueError(
            f"simulate_resident holds the whole state in VMEM: N={n} > "
            f"{RESIDENT_MAX_N}; use sim.simulate (streamed kernels)")
    if steps < 1:
        raise ValueError("simulate_resident needs steps >= 1")
    masses = mass is not None
    pos = pos.astype(jnp.float32)
    vel = vel.astype(jnp.float32)

    tile = min(tile, round_up(n, 8))
    if not interpret:
        tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    nb = np_ // tile

    pad = np_ - n
    if pad:
        # FAR tails: w underflows against real bodies; FAR-vs-FAR pairs have
        # d = 0 so their (huge-w) * 0 force is exactly 0, and integration
        # keeps them at FAR. Zero masses make them inert in mass mode too.
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=FAR)
        vel = jnp.pad(vel, ((0, pad), (0, 0)))
    m = (jnp.pad(mass.astype(jnp.float32), (0, pad)) if masses
         else jnp.ones((np_,), jnp.float32))
    wide0 = jnp.concatenate(
        [pos, vel, m[:, None], jnp.zeros((np_, 1), jnp.float32)], axis=1)

    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    out_a, out_b = pl.pallas_call(
        functools.partial(_resident_kernel, tile=tile, nb=nb, dt=float(dt),
                          softening=float(softening), masses=masses,
                          fast=fast),
        grid=(steps, nb, nb),
        in_specs=[pl.BlockSpec((np_, 8), lambda s, i, j: (0, 0),
                               memory_space=vm)],
        out_specs=[
            pl.BlockSpec((np_, 8), lambda s, i, j: (0, 0), memory_space=vm),
            pl.BlockSpec((np_, 8), lambda s, i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 8), jnp.float32),
            jax.ShapeDtypeStruct((np_, 8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, np_), jnp.float32),
            pltpu.VMEM((tile, 8), jnp.float32),
        ],
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=22 * steps * np_ * np_,
            bytes_accessed=np_ * 64,
            transcendentals=steps * np_ * np_,
        ),
        interpret=interpret,
    )(wide0)

    # Step s reads a/b by parity and writes the other: the final step
    # s = steps-1 wrote b when even, a when odd.
    final = out_b if (steps - 1) % 2 == 0 else out_a
    return final[:n, 0:3], final[:n, 3:6]
