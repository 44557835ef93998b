"""MXU-hybrid force kernel: route the O(N^2) force accumulation through the
128x128 systolic array while keeping the pair-distance math exact fp32 on the
VPU.

Why: the direct kernel (pallas_force.py) is VPU-bound at ~23 VPU-op
equivalents per interaction (measured on v5e). The accumulation identity

    F_i = sum_j w_ij (p_j - p_i)
        = (W @ [p_j | 1])[:, :3] - p_i * (W @ [p_j | 1])[:, 3]

moves the 3 multiply+lane-reduce pairs (~5 VPU ops/pair) into one
(TI,TJ)x(TJ,4) matmul on the MXU. Distances r2 stay in the direct
(d.d + eps) form — full fp32 relative accuracy, unlike the gram-matrix form
(|pi|^2+|pj|^2-2pi.pj) whose absolute ~ulp(|p|^2) error wrecks close pairs.
(A full bf16 gram variant was measured Pareto-dominated on both speed
[135 vs 239 GInter/s] and accuracy [5e-2 vs 2e-3 median] and removed.)

Accumulation precision (per BASELINE.json config 3, "bf16-pair /
fp32-accumulate"):
  * pair_dtype=bfloat16 -> MXU DEFAULT: single-pass bf16 operands, fp32
    accumulator. ~239 GInter/s at N=262k on v5e (vs 172 direct). Per-body
    force error: the uniform ~3e-3 w-rounding class; the free compensated
    split of the [p|1] operand (see _hybrid_kernel docstring) removes the
    former cancellation-amplified tails (was ~0.5 max, now ~1e-2). The
    throughput mode.
  * pair_dtype=float32 -> MXU HIGHEST: true fp32 contract; error ~6e-6 but
    the fp32 MXU passes make it slower than the direct kernel (~117 GInter/s)
    — provided for completeness; prefer backend="pallas" for fp32.

Self/coincident pairs: their true contribution is zero, but their huge
w = eps^-1.5 would swamp the fp32 accumulator (the ulp(w*|p|) residue
survives the epilogue subtraction — measured 3e6 relative error without the
mask). The mask tests the PRE-softening |d|^2 == 0, not r2 == eps: in fp32
the latter is also satisfied by genuinely near-coincident distinct pairs
(|d| < ~sqrt(ulp(eps)/2) ~ 6e-9 at eps=1e-9), which would silently zero a
real ~eps^-1.5 |d| force. |d|^2 sums non-negative squares, so it is 0 iff
every component square is 0 — i.e. d == 0 exactly for any position scale
above the fp32 subnormal floor (|d_c| < 2^-75). This matches the reference,
which computes-not-skips j==i for the same zero result (SURVEY.md §0).
Round 3: square calls take the coincident flag — self pairs only live in
blocks whose i/j ranges intersect, so off-overlap blocks run a ~2-op
maskless body behind the same duplicate scan as ops/sym_mxu_force
(bitwise identical: w feeds the matmul directly).

Structure mirrors the reference datapath like pallas_force.py: i-tile
resident (``src/top_level.vhd:83``), j-blocks streamed
(``src/top_level.vhd:233-254``), accumulator carried across the j grid
(the rotating-partial-sum analog, ``src/fxyz.vhd:80-87``). Tail masking uses
far-padding: padded bodies sit at 1e18 so w underflows to exactly 0 — the
WRITE_MASK analog (``src/top_level.vhd:201-205``) with no mask multiply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_nbody_tpu.utils.config import FAR, SOFTENING, round_up, check_coincident

from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams,
)


def _pair_sums(pi, pjt, vj, *, softening, unit_mass, acc_precision, mask):
    """(TI, 4|8) accumulation matmul for one (i-tile, j-block): fp32
    distances + w on the VPU, the weighted sums on the MXU. mask drops the
    d2 == 0 zeroing (~2 of the ~19 VPU ops) — valid only for blocks with
    no hot coincident pair (see _hybrid_kernel's mask_mode)."""
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt[0:1, :] - xi  # (TI, TJ)
    dy = pjt[1:2, :] - yi
    dz = pjt[2:3, :] - zi
    soft = jnp.asarray(softening, dx.dtype)
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + soft
    inv = jax.lax.rsqrt(r2)
    w = (inv * inv) * inv
    if mask:
        # Exact-coincidence mask — module docstring. d2 == 0 iff d == 0.
        w = jnp.where(d2 == 0.0, jnp.asarray(0.0, w.dtype), w)
    if not unit_mass:
        w = w * pjt[3:4, :]

    # (TI,TJ) @ (TJ,4|8) = [sum w*pj | sum w] (x2 halves) on the MXU.
    return jax.lax.dot_general(
        w, vj,
        (((1,), (0,)), ((), ())),
        precision=acc_precision,
        preferred_element_type=jnp.float32,
    )


def _hybrid_kernel(pi_ref, pjt_ref, vj_ref, out_ref, acc_ref, *, softening,
                   nj_steps, unit_mass, acc_precision, vcols,
                   mask_mode="all", tile_i=0, tile_j=0):
    """Direct fp32 r2 on VPU; accumulation matmul on MXU.

    In bf16 mode vj is the (TJ, 8) [vhi | vlo] compensated operand split
    (see sym_mxu_force._pack): without it the bf16 rounding of [p|1] is
    amplified by net-force cancellation into per-body error tails to ~0.5;
    with it (free — VMEM lane padding and the MXU's native width absorb
    the extra columns) the error is the uniform ~4e-3 w-rounding class.
    vcols = 4 in fp32-HIGHEST mode where the split would be pure waste.

    mask_mode: "all" masks every block (any call pattern). "overlap"
    (square calls only, coincident routing) masks only blocks whose i/j
    body ranges intersect — the only blocks that can hold a SELF pair;
    every other hot d2 == 0 source is absent there (duplicates gated by
    the caller's scan, j FAR pads underflow w, i zero-pads only write
    sliced-off rows)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pi = pi_ref[:]  # (TI, 3)
    kw = dict(softening=softening, unit_mass=unit_mass,
              acc_precision=acc_precision)
    if mask_mode == "all":
        acc_ref[:] += _pair_sums(pi, pjt_ref[:], vj_ref[:], mask=True, **kw)
    else:
        i = pl.program_id(0)
        lo_i, hi_i = i * tile_i, (i + 1) * tile_i
        lo_j, hi_j = j * tile_j, (j + 1) * tile_j
        overlap = jnp.logical_and(lo_i < hi_j, lo_j < hi_i)

        @pl.when(overlap)
        def _masked():
            acc_ref[:] += _pair_sums(pi, pjt_ref[:], vj_ref[:], mask=True,
                                     **kw)

        @pl.when(jnp.logical_not(overlap))
        def _maskless():
            acc_ref[:] += _pair_sums(pi, pjt_ref[:], vj_ref[:], mask=False,
                                     **kw)

    @pl.when(j == nj_steps - 1)
    def _epilogue():
        s_tot = acc_ref[:]
        if vcols == 8:
            s_tot = s_tot[:, 0:4] + s_tot[:, 4:8]
        out_ref[:] = s_tot[:, 0:3] - pi * s_tot[:, 3:4]


def body_force_mxu(
    pos_i,
    pos_j,
    mass_j=None,
    softening: float = SOFTENING,
    tile_i: int = 512,
    tile_j: int = 2048,
    interpret: bool = False,
    pair_dtype=jnp.bfloat16,
    coincident: str = "masked",
):
    """Forces on pos_i (Ni,3) from (pos_j, mass_j) via the MXU-hybrid kernel.

    pair_dtype selects the MXU accumulation operand precision: bfloat16 =
    single-pass (fast, throughput mode), float32 = exact fp32 contract (slow;
    prefer the direct kernel). Distances are always exact fp32.

    coincident applies to SQUARE calls only (pos_j is the same array object
    as pos_i): "auto" duplicate-scans pos once and routes blocks off the
    diagonal overlap to the ~2-op-cheaper maskless body when safe; "fast"
    skips the scan (caller guarantees distinct positions; self pairs stay
    exact — overlap blocks always mask); "masked" is the round-2 behavior.
    Rectangular calls always mask regardless (pos_i may be EMBEDDED in
    pos_j under the sharded all_gather exchange, so its self pairs sit at
    a caller-only-known offset; disjoint-set callers wanting the maskless
    win should use sym_mxu_force.body_force_pair_mxu, which owns the flag).

    Squareness is detected by ARRAY IDENTITY here, outside the jit
    boundary (inside it the same array arrives as two distinct tracers) —
    same contract as ops/force.body_force's sym dispatch.
    """
    check_coincident(coincident)
    return _body_force_mxu_impl(
        pos_i, pos_j, mass_j, softening=softening, tile_i=tile_i,
        tile_j=tile_j, interpret=interpret, pair_dtype=pair_dtype,
        coincident=coincident, square=pos_i is pos_j)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile_i", "tile_j", "interpret",
                     "pair_dtype", "coincident", "square"),
)
def _body_force_mxu_impl(
    pos_i,
    pos_j,
    mass_j,
    *,
    softening,
    tile_i,
    tile_j,
    interpret,
    pair_dtype,
    coincident,
    square,
):
    ni_n, nj_n = pos_i.shape[0], pos_j.shape[0]
    unit_mass = mass_j is None
    if square:
        from mini_nbody_tpu.ops.sym_mxu_force import resolve_auto

        coincident = resolve_auto(coincident, ni_n)
    if coincident == "auto" and square:
        from mini_nbody_tpu.ops.sym_mxu_force import any_coincident

        dup = any_coincident(pos_i)

    pos_i = pos_i.astype(jnp.float32)
    pos_j = pos_j.astype(jnp.float32)

    tile_i = min(tile_i, round_up(ni_n, 8))
    tile_j = min(tile_j, round_up(nj_n, 128))
    ni_p = round_up(ni_n, tile_i)
    nj_p = round_up(nj_n, tile_j)

    if ni_p != ni_n:
        pos_i = jnp.pad(pos_i, ((0, ni_p - ni_n), (0, 0)))
    if nj_p != nj_n:
        # Far-padding: rsqrt(r2)^3 underflows to 0, so padded j are inert.
        pos_j = jnp.pad(pos_j, ((0, nj_p - nj_n), (0, 0)), constant_values=FAR)
        if not unit_mass:
            mass_j = jnp.pad(mass_j.astype(jnp.float32), (0, nj_p - nj_n))

    grid = (ni_p // tile_i, nj_p // tile_j)
    pairs = ni_p * nj_p
    acc_precision = (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(pair_dtype) == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    vj = jnp.concatenate([pos_j, jnp.ones((nj_p, 1), jnp.float32)], axis=1)
    vcols = 4
    if acc_precision == jax.lax.Precision.DEFAULT:
        # Compensated operand split (kernel docstring). reduce_precision,
        # not astype: XLA folds the f32->bf16->f32 round-trip to identity.
        vhi = jax.lax.reduce_precision(vj, 8, 7)
        vj = jnp.concatenate([vhi, vj - vhi], axis=1)
        vcols = 8
    pjt_rows = [pos_j.T] if unit_mass else [pos_j.T, mass_j[None, :]]
    pjt = jnp.concatenate(pjt_rows, axis=0)  # (3 or 4, Nj)

    def run(mask_mode):
        kernel = functools.partial(
            _hybrid_kernel, softening=float(softening), nj_steps=grid[1],
            unit_mass=unit_mass, acc_precision=acc_precision, vcols=vcols,
            mask_mode=mask_mode, tile_i=tile_i, tile_j=tile_j,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pjt.shape[0], tile_j), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_j, vcols), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ni_p, 3), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tile_i, vcols), jnp.float32)],
            compiler_params=_CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            cost_estimate=pl.CostEstimate(
                flops=20 * pairs,
                bytes_accessed=(ni_p * 3 + nj_p * 8 + ni_p * 3) * 4,
                transcendentals=pairs,
            ),
            interpret=interpret,
        )(pos_i, pjt, vj)

    if not square or coincident == "masked":
        out = run("all")
    elif coincident == "fast":
        out = run("overlap")
    else:
        out = jax.lax.cond(dup, lambda: run("all"), lambda: run("overlap"))

    return out[:ni_n]
