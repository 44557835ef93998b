"""Tiled Pallas TPU kernel for the softened all-pairs bodyForce.

TPU-native re-design of the reference FPGA datapath (SURVEY.md §1 L3-L4):

* The reference holds 12 i-bodies in registers and streams one j-target per
  cycle to all 12 force lanes (``src/top_level.vhd:83,233-254``;
  ``src/compute_store.vhd:94-111``). Here an i-tile of ``tile_i`` bodies is
  resident in VMEM and a j-block of ``tile_j`` bodies streams through the
  Pallas grid per step — same structure, VPU width instead of 12 lanes.
* The reference hides FMA latency with 16 rotating partial sums plus a
  flush/scatter epoch and a shared 16->1 adder tree
  (``src/fxyz.vhd:80-87,130-184``; ``src/final_adder.vhd``). Here the
  accumulator is the output block in VMEM, revisited across the j grid
  dimension; the lane-axis reduction is a single ``jnp.sum`` the Mosaic
  compiler schedules optimally.
* Tail handling: the reference masks writes for i > N
  (``WRITE_MASK``, ``src/top_level.vhd:201-205``); here tails are padded to
  tile multiples with zero-mass bodies (zero force contribution, results
  sliced off).

Math per pair (identical to ``src/dxy.vhd:94-122``, ``src/dzsoft.vhd:186-202``,
``src/fxyz.vhd:101-127``): d = p_j - p_i; r2 = |d|^2 + SOFTENING;
w = rsqrt(r2)^3 * m_j; F_i += d * w. All fp32 on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_nbody_tpu.utils.config import FAR, SOFTENING, round_up

# Pallas TPU compiler-params class was renamed across JAX versions.
from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams,
    fast_rsqrt_cube,
)


def _direct_kernel(pi_ref, pjt_ref, out_ref, *, softening, acc_steps,
                   unit_mass, fast_rsqrt_cube):
    """One (i-tile, j-block) grid step of the direct VPU force kernel.

    unit_mass: skip the mass multiply (reference semantics; tails handled by
      far-padding, whose w underflows to exactly 0).
    fast_rsqrt_cube: compute w = rsqrt(r2^3) instead of rsqrt(r2)^3 — one VPU
      op cheaper, +3% measured, max 1e-7 relative delta; valid while
      softening^3 stays normal (softening >= ~1e-12) and overflow of r2^3 is
      benign (rsqrt(inf) = 0, exactly what far-padding wants).
    """
    j = pl.program_id(1)

    pi = pi_ref[:]  # (TI, 3)
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]  # (TI, 1) each
    xj = pjt_ref[0:1, :]  # (1, TJ)
    yj = pjt_ref[1:2, :]
    zj = pjt_ref[2:3, :]

    dx = xj - xi  # (TI, TJ) broadcast
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + (dz * dz + jnp.asarray(softening, dx.dtype))
    if fast_rsqrt_cube:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if not unit_mass:
        w = w * pjt_ref[3:4, :]

    fx = jnp.sum(dx * w, axis=1, keepdims=True)  # (TI, 1)
    fy = jnp.sum(dy * w, axis=1, keepdims=True)
    fz = jnp.sum(dz * w, axis=1, keepdims=True)
    f = jnp.concatenate([fx, fy, fz], axis=1)  # (TI, 3)

    if acc_steps == 1:
        out_ref[:] = f
    else:
        @pl.when(j == 0)
        def _init():
            out_ref[:] = f

        @pl.when(j > 0)
        def _acc():
            out_ref[:] = out_ref[:] + f


def _fused_euler_kernel(pi_ref, vi_ref, pjt_ref, pos_ref, vel_ref, acc_ref, *,
                        softening, acc_steps, unit_mass, fast_rsqrt_cube, dt):
    """Direct kernel + semi-implicit Euler epilogue (SURVEY §7 step 2 /
    BASELINE north star "fused force accumulation with the integrate step"):
    the force accumulates in VMEM scratch and the last j step writes the
    integrated (pos', vel') directly — F never round-trips HBM."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pi = pi_ref[:]
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt_ref[0:1, :] - xi
    dy = pjt_ref[1:2, :] - yi
    dz = pjt_ref[2:3, :] - zi
    r2 = dx * dx + dy * dy + (dz * dz + jnp.asarray(softening, dx.dtype))
    if fast_rsqrt_cube:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if not unit_mass:
        w = w * pjt_ref[3:4, :]
    f = jnp.concatenate(
        [jnp.sum(dx * w, axis=1, keepdims=True),
         jnp.sum(dy * w, axis=1, keepdims=True),
         jnp.sum(dz * w, axis=1, keepdims=True)], axis=1)
    acc_ref[:] += f

    @pl.when(j == acc_steps - 1)
    def _integrate():
        step = jnp.asarray(dt, pi.dtype)
        vel = vi_ref[:] + step * acc_ref[:]
        vel_ref[:] = vel
        pos_ref[:] = pi + step * vel


@functools.partial(
    jax.jit,
    static_argnames=("softening", "dt", "tile_i", "tile_j", "interpret"),
)
def euler_step_fused(
    pos,
    vel,
    mass=None,
    dt: float = 0.01,
    softening: float = SOFTENING,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
):
    """One fused force+Euler step on the direct kernel: (pos', vel').

    Ablation target for the blueprint's fused-integrate epilogue; measured
    perf vs the unfused step is recorded in benchmarks/RESULTS.md (the
    integrate is O(N) against an O(N^2) force — the win is bounded by the
    F round-trip it saves).
    """
    n = pos.shape[0]
    unit_mass = mass is None
    pos = pos.astype(jnp.float32)
    vel = vel.astype(jnp.float32)

    tile_i = min(tile_i, round_up(n, 8))
    tile_j = min(tile_j, round_up(n, 128))
    np_ = round_up(round_up(n, tile_i), tile_j)
    if np_ != n:
        # i-rows must see the true sources; pad FAR (unit mass) or zero-mass.
        pos = jnp.pad(pos, ((0, np_ - n), (0, 0)),
                      constant_values=FAR if unit_mass else 0.0)
        vel = jnp.pad(vel, ((0, np_ - n), (0, 0)))
        if not unit_mass:
            mass = jnp.pad(mass.astype(jnp.float32), (0, np_ - n))

    pjt_rows = [pos.T]
    if not unit_mass:
        pjt_rows.append(mass[None, :])
    pjt = jnp.concatenate(pjt_rows, axis=0) if len(pjt_rows) > 1 else pjt_rows[0]

    grid = (np_ // tile_i, np_ // tile_j)
    kernel = functools.partial(
        _fused_euler_kernel, softening=float(softening), acc_steps=grid[1],
        unit_mass=unit_mass, fast_rsqrt_cube=fast_rsqrt_cube(softening),
        dt=float(dt),
    )
    pairs = np_ * np_
    pos_new, vel_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pjt.shape[0], tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 3), jnp.float32),
            jax.ShapeDtypeStruct((np_, 3), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_i, 3), jnp.float32)],
        compiler_params=_CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * pairs,
            bytes_accessed=(np_ * 6 + np_ * 4 + np_ * 6) * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(pos, vel, pjt)
    return pos_new[:n], vel_new[:n]


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile_i", "tile_j", "interpret"),
)
def body_force_pallas(
    pos_i,
    pos_j,
    mass_j=None,
    softening: float = SOFTENING,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
):
    """Forces on pos_i (Ni,3) due to sources pos_j (Nj,3) with masses mass_j.

    Rectangular so the same kernel serves single-chip (pos_i is pos_j) and
    sharded use (local i-shard vs gathered/ring-passed j-shard). fp32 in/out.
    """
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    unit_mass = mass_j is None

    dtype = jnp.float32
    pos_i = pos_i.astype(dtype)
    pos_j = pos_j.astype(dtype)

    tile_i = min(tile_i, round_up(ni, 8))
    tile_j = min(tile_j, round_up(nj, 128))
    ni_p = round_up(ni, tile_i)
    nj_p = round_up(nj, tile_j)

    if ni_p != ni:
        pos_i = jnp.pad(pos_i, ((0, ni_p - ni), (0, 0)))
    if nj_p != nj:
        if unit_mass:
            # Far-padding: w underflows to exactly 0 for padded bodies (the
            # WRITE_MASK analog, src/top_level.vhd:201-205, for free).
            pos_j = jnp.pad(pos_j, ((0, nj_p - nj), (0, 0)),
                            constant_values=FAR)
        else:
            pos_j = jnp.pad(pos_j, ((0, nj_p - nj), (0, 0)))
            mass_j = jnp.pad(mass_j.astype(dtype), (0, nj_p - nj))

    # j data transposed: coords (and mass, if any) along lanes.
    pjt_rows = [pos_j.T]
    if not unit_mass:
        pjt_rows.append(mass_j.astype(dtype)[None, :])
    pjt = jnp.concatenate(pjt_rows, axis=0) if len(pjt_rows) > 1 else pjt_rows[0]

    grid = (ni_p // tile_i, nj_p // tile_j)
    acc_steps = grid[1]

    # rsqrt(r2^3) needs softening^3 to stay a normal fp32.
    fast = fast_rsqrt_cube(softening)

    kernel = functools.partial(
        _direct_kernel, softening=float(softening), acc_steps=acc_steps,
        unit_mass=unit_mass, fast_rsqrt_cube=fast,
    )

    pairs = ni_p * nj_p
    cost = pl.CostEstimate(
        flops=20 * pairs,  # the conventional 20-flops/interaction accounting
        bytes_accessed=(ni_p * 3 + nj_p * 4 + ni_p * 3) * 4,
        transcendentals=pairs,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pjt.shape[0], tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ni_p, 3), dtype),
        compiler_params=_CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(pos_i, pjt)

    return out[:ni]
