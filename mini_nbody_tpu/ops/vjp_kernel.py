"""Pallas TPU kernel for the force VJP (the backward pass of bodyForce).

The chunked-jnp backward in autodiff.py is correct but memory-bound
(~1 G pair-grads/s at N=65536: it materializes (C, N, 3) broadcast
intermediates in HBM). This kernel keeps everything in VMEM with the same
i-resident/j-streamed structure as the forward kernels (~35 VPU ops per
ordered pair -> ~100 G pair-grads/s expected on v5e).

Math (see ops/autodiff.py for the derivation): with d = p_j - p_k,
s = |d|^2 + eps, w = s^-3/2, u = s^-5/2, cotangent g:

  pos_bar_k = sum_j m_j [ -w g_k + 3 u (g_k.d) d ]          (receiver)
            + m_k sum_j [  w g_j - 3 u (g_j.d) d ]          (source)

For unit masses both terms share u and fold into one fused pass:
  pos_bar_k = sum_j [ 3 u ((g_k - g_j).d) d + w g_j ] - g_k sum_j w

The self term j = k cancels only ANALYTICALLY: at SOFTENING=1e-9 its weight
w = eps^-1.5 ~ 3e13 swamps the fp32 running sums (measured 64x relative
gradient error unmasked), so w and u are zeroed on exactly-coincident pairs
(pre-softening |d|^2 == 0), matching ops/autodiff.py and ops/mxu_force.py.
The symmetric backward (vjp_pos_sym) additionally adopts the forward
hybrid's coincident='auto' refinement: off-diagonal blocks drop the mask
behind an exact duplicate scan + lax.cond (bitwise identical for every
input); the ordered kernels keep it everywhere — each of their blocks can
contain the self pairs the mask absorbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_nbody_tpu.utils.config import SOFTENING, round_up, check_coincident

from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams,
)


def _ordered_rows(pk, gk, pjt_ref, gjt_ref, softening, unit_mass, mask):
    """(T, 3) ordered-pair pos_bar rows for one (k-tile, j-block).

    mask=False drops the d2 == 0 zeroing — valid for blocks whose k/j body
    ranges cannot hold a self pair when a duplicate scan ruled out distinct
    coincident bodies (pads stay safe: unit-mass FAR pads underflow w/u
    against real rows, and FAR-vs-FAR pairs only write sliced-off pad
    rows with exactly-zero cotangents on both sides; mass-mode origin pads
    carry m = 0 AND g = 0, zeroing every term — vjp_pos_pallas pad
    docstring)."""
    xk, yk, zk = pk[:, 0:1], pk[:, 1:2], pk[:, 2:3]
    gkx, gky, gkz = gk[:, 0:1], gk[:, 1:2], gk[:, 2:3]

    dx = pjt_ref[0:1, :] - xk  # (T, TJ)
    dy = pjt_ref[1:2, :] - yk
    dz = pjt_ref[2:3, :] - zk
    d2 = dx * dx + dy * dy + dz * dz
    s = d2 + jnp.asarray(softening, dx.dtype)
    inv = jax.lax.rsqrt(s)
    inv2 = inv * inv
    w = inv2 * inv
    u = w * inv2
    if mask:
        # Coincident-pair mask (module docstring): the self pair's analytic
        # cancellation fails in fp32 at small softening.
        zero = d2 == 0.0
        w = jnp.where(zero, jnp.asarray(0.0, w.dtype), w)
        u = jnp.where(zero, jnp.asarray(0.0, u.dtype), u)

    gjx = gjt_ref[0:1, :]
    gjy = gjt_ref[1:2, :]
    gjz = gjt_ref[2:3, :]

    dot_gk_d = gkx * dx + gky * dy + gkz * dz  # (T, TJ)
    dot_gj_d = gjx * dx + gjy * dy + gjz * dz

    if unit_mass:
        coeff = 3.0 * (u * (dot_gk_d - dot_gj_d))
        tx = jnp.sum(coeff * dx + w * gjx, axis=1, keepdims=True)
        ty = jnp.sum(coeff * dy + w * gjy, axis=1, keepdims=True)
        tz = jnp.sum(coeff * dz + w * gjz, axis=1, keepdims=True)
        sw = jnp.sum(w, axis=1, keepdims=True)
        return jnp.concatenate(
            [tx - gkx * sw, ty - gky * sw, tz - gkz * sw], axis=1)
    mj = pjt_ref[3:4, :]  # (1, TJ)
    mk = pk[:, 3:4]  # (T, 1)
    # receiver: sum_j m_j (-w g_k + 3 u (g_k.d) d)
    a = 3.0 * (u * mj * dot_gk_d)
    smw = jnp.sum(w * mj, axis=1, keepdims=True)
    rx = jnp.sum(a * dx, axis=1, keepdims=True) - gkx * smw
    ry = jnp.sum(a * dy, axis=1, keepdims=True) - gky * smw
    rz = jnp.sum(a * dz, axis=1, keepdims=True) - gkz * smw
    # source: m_k sum_j (w g_j - 3 u (g_j.d) d)
    b = 3.0 * (u * dot_gj_d)
    sx = jnp.sum(w * gjx - b * dx, axis=1, keepdims=True)
    sy = jnp.sum(w * gjy - b * dy, axis=1, keepdims=True)
    sz = jnp.sum(w * gjz - b * dz, axis=1, keepdims=True)
    return jnp.concatenate(
        [rx + mk * sx, ry + mk * sy, rz + mk * sz], axis=1)


def _vjp_kernel(pk_ref, gk_ref, pjt_ref, gjt_ref, out_ref, *, softening,
                acc_steps, unit_mass, mask_mode="all", tile_i=0, tile_j=0):
    """One (k-tile, j-block) step of the backward pass.

    mask_mode "overlap" (square calls under coincident routing) masks only
    blocks whose k/j body ranges intersect — the only ones that can hold a
    self pair (mxu_force._hybrid_kernel rationale)."""
    j = pl.program_id(1)

    pk = pk_ref[:]  # (T, 3 or 4): positions (+ mass col in mass mode)
    gk = gk_ref[:]  # (T, 3)

    def store(f):
        if acc_steps == 1:
            out_ref[:] = f
        else:
            @pl.when(j == 0)
            def _init():
                out_ref[:] = f

            @pl.when(j > 0)
            def _acc():
                out_ref[:] = out_ref[:] + f

    if mask_mode == "all":
        store(_ordered_rows(pk, gk, pjt_ref, gjt_ref, softening,
                            unit_mass, mask=True))
    else:
        i = pl.program_id(0)
        lo_i, hi_i = i * tile_i, (i + 1) * tile_i
        lo_j, hi_j = j * tile_j, (j + 1) * tile_j
        overlap = jnp.logical_and(lo_i < hi_j, lo_j < hi_i)

        @pl.when(overlap)
        def _masked():
            store(_ordered_rows(pk, gk, pjt_ref, gjt_ref, softening,
                                unit_mass, mask=True))

        @pl.when(jnp.logical_not(overlap))
        def _maskless():
            store(_ordered_rows(pk, gk, pjt_ref, gjt_ref, softening,
                                unit_mass, mask=False))


def _pair_grad_block(pa, ga, pbt, gbt, softening, masses,
                     mass_grad=False, mask=True):
    """Per-UNORDERED-pair gradient contribution, summed both ways.

    With d = p_b - p_a and shared w = s^-3/2, u = s^-5/2, the pair's
    contribution to pos_bar_a is

        t = w (m_a g_b - m_b g_a) + 3 u (m_b (g_a.d) - m_a (g_b.d)) d

    and its contribution to pos_bar_b is exactly -t (translation invariance:
    the pair's gradient sums to zero), so like the force itself the backward
    is antisymmetric and each unordered pair needs computing ONCE. Returns
    (row sums of t over b, column sums of t over a) — caller adds rows to a
    and SUBTRACTS the column sums from b."""
    xa, ya, za = pa[:, 0:1], pa[:, 1:2], pa[:, 2:3]
    dx = pbt[0:1, :] - xa
    dy = pbt[1:2, :] - ya
    dz = pbt[2:3, :] - za
    d2 = dx * dx + dy * dy + dz * dz
    s = d2 + jnp.asarray(softening, dx.dtype)
    inv = jax.lax.rsqrt(s)
    inv2 = inv * inv
    w = inv2 * inv
    u = w * inv2
    if mask:
        # d2 == 0 pairs here are exactly-coincident DISTINCT bodies (self
        # pairs never reach this block — the diagonal uses _ordered_block,
        # always masked). Skippable when a duplicate scan ruled those out:
        # pads stay safe maskless in BOTH modes (unit-mass FAR pads
        # underflow w and u against every real body at |d| ~ 1e18;
        # mass-mode origin pads carry m = 0 AND g = 0, zeroing every term
        # they touch) — the backward mirror of ops/sym_mxu_force._w_block.
        zero = d2 == 0.0
        w = jnp.where(zero, jnp.asarray(0.0, w.dtype), w)
        u = jnp.where(zero, jnp.asarray(0.0, u.dtype), u)

    gax, gay, gaz = ga[:, 0:1], ga[:, 1:2], ga[:, 2:3]
    gbx, gby, gbz = gbt[0:1, :], gbt[1:2, :], gbt[2:3, :]
    dot_a = gax * dx + gay * dy + gaz * dz  # g_a . d
    dot_b = gbx * dx + gby * dy + gbz * dz  # g_b . d

    if masses:
        ma = pa[:, 3:4]
        mb = pbt[3:4, :]
        coeff = 3.0 * (u * (mb * dot_a - ma * dot_b))
        tx = coeff * dx + w * (ma * gbx - mb * gax)
        ty = coeff * dy + w * (ma * gby - mb * gay)
        tz = coeff * dz + w * (ma * gbz - mb * gaz)
    else:
        coeff = 3.0 * (u * (dot_a - dot_b))
        tx = coeff * dx + w * (gbx - gax)
        ty = coeff * dy + w * (gby - gay)
        tz = coeff * dz + w * (gbz - gaz)

    row_parts = [jnp.sum(tx, axis=1, keepdims=True),
                 jnp.sum(ty, axis=1, keepdims=True),
                 jnp.sum(tz, axis=1, keepdims=True)]
    col_parts = [jnp.sum(tx, axis=0, keepdims=True),
                 jnp.sum(ty, axis=0, keepdims=True),
                 jnp.sum(tz, axis=0, keepdims=True)]
    if mass_grad:
        # dF_b/dm_a = -w d and dF_a/dm_b = w d (w has no mass factor):
        # mass_bar_a += -w (g_b.d), mass_bar_b += w (g_a.d).
        row_parts.append(jnp.sum(-w * dot_b, axis=1, keepdims=True))
        col_parts.append(jnp.sum(w * dot_a, axis=0, keepdims=True))
    return (jnp.concatenate(row_parts, axis=1),
            jnp.concatenate(col_parts, axis=0))


def _ordered_block(pk, gk, pjt, gjt, softening, unit_mass,
                   mass_grad=False):
    """Full ordered-pair pos_bar rows for one block — the _vjp_kernel math
    as a pure-array helper (used for the diagonal blocks of the symmetric
    backward, where row sums already cover both pair orders). With
    mass_grad (mass mode only), also returns the block's mass-cotangent
    column sums (1,T): mass_bar_j = sum_k w (g_k . d_kj)."""
    xk, yk, zk = pk[:, 0:1], pk[:, 1:2], pk[:, 2:3]
    gkx, gky, gkz = gk[:, 0:1], gk[:, 1:2], gk[:, 2:3]
    dx = pjt[0:1, :] - xk
    dy = pjt[1:2, :] - yk
    dz = pjt[2:3, :] - zk
    d2 = dx * dx + dy * dy + dz * dz
    s = d2 + jnp.asarray(softening, dx.dtype)
    inv = jax.lax.rsqrt(s)
    inv2 = inv * inv
    w = inv2 * inv
    u = w * inv2
    zero = d2 == 0.0
    w = jnp.where(zero, jnp.asarray(0.0, w.dtype), w)
    u = jnp.where(zero, jnp.asarray(0.0, u.dtype), u)

    gjx = gjt[0:1, :]
    gjy = gjt[1:2, :]
    gjz = gjt[2:3, :]
    dot_gk_d = gkx * dx + gky * dy + gkz * dz
    dot_gj_d = gjx * dx + gjy * dy + gjz * dz

    if unit_mass:
        coeff = 3.0 * (u * (dot_gk_d - dot_gj_d))
        tx = jnp.sum(coeff * dx + w * gjx, axis=1, keepdims=True)
        ty = jnp.sum(coeff * dy + w * gjy, axis=1, keepdims=True)
        tz = jnp.sum(coeff * dz + w * gjz, axis=1, keepdims=True)
        sw = jnp.sum(w, axis=1, keepdims=True)
        return jnp.concatenate(
            [tx - gkx * sw, ty - gky * sw, tz - gkz * sw], axis=1)
    mj = pjt[3:4, :]
    mk = pk[:, 3:4]
    a = 3.0 * (u * mj * dot_gk_d)
    smw = jnp.sum(w * mj, axis=1, keepdims=True)
    rx = jnp.sum(a * dx, axis=1, keepdims=True) - gkx * smw
    ry = jnp.sum(a * dy, axis=1, keepdims=True) - gky * smw
    rz = jnp.sum(a * dz, axis=1, keepdims=True) - gkz * smw
    b = 3.0 * (u * dot_gj_d)
    sx = jnp.sum(w * gjx - b * dx, axis=1, keepdims=True)
    sy = jnp.sum(w * gjy - b * dy, axis=1, keepdims=True)
    sz = jnp.sum(w * gjz - b * dz, axis=1, keepdims=True)
    f = jnp.concatenate(
        [rx + mk * sx, ry + mk * sy, rz + mk * sz], axis=1)
    if mass_grad:
        return f, jnp.sum(w * dot_gk_d, axis=0, keepdims=True)
    return f


def _sym_vjp_tri_kernel(p_ref, g_ref, pt_ref, gt_ref, rows_ref, colsT_ref, *,
                        softening, tile, nb, masses, mass_grad,
                        mask_offdiag=True, axis_off=0):
    """Diagonal-band step of the symmetric backward (structure identical to
    symmetric_force._tri_kernel): block (i, (i+d) mod nb) at grid (i, d).
    d == 0 uses the ordered formula (rows cover both orders); d > 0 computes
    each unordered pair once and scatters antisymmetrically (the mass
    cotangent rides as a 4th rows column / colsT row; its pair term is NOT
    antisymmetric, so its column side accumulates with + while the position
    columns accumulate with -).

    axis_off=1 runs the SAME body under the batched-ensemble grid
    (system, i, d) — sym_mxu_force._tri_kernel rationale: the
    (i == 0, d == 0) colsT zero-init refires per system because program
    ids reset along the leading axis."""
    i = pl.program_id(axis_off)
    d = pl.program_id(axis_off + 1)
    jg = jax.lax.rem(i + d, jnp.int32(nb))

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    active = jnp.logical_or(d * 2 != nb, i * 2 < nb)

    @pl.when(jnp.logical_and(active, d == 0))
    def _diag():
        out = _ordered_block(
            p_ref[:], g_ref[:], pt_ref[:], gt_ref[:], softening,
            unit_mass=not masses, mass_grad=mass_grad)
        if mass_grad:
            f, mcols = out
            rows_ref[:, 0:3] = f
            rows_ref[:, 3:4] = jnp.zeros_like(rows_ref[:, 3:4])
            cj = pl.ds(jg * tile, tile)
            colsT_ref[3:4, cj] = colsT_ref[3:4, cj] + mcols
        else:
            rows_ref[:] = out

    @pl.when(jnp.logical_and(active, d > 0))
    def _band():
        rows, cols = _pair_grad_block(
            p_ref[:], g_ref[:], pt_ref[:], gt_ref[:], softening, masses,
            mass_grad=mass_grad, mask=mask_offdiag)
        rows_ref[:] = rows_ref[:] + rows
        cj = pl.ds(jg * tile, tile)
        if mass_grad:
            colsT_ref[0:3, cj] = colsT_ref[0:3, cj] - cols[0:3]
            colsT_ref[3:4, cj] = colsT_ref[3:4, cj] + cols[3:4]
        else:
            colsT_ref[:, cj] = colsT_ref[:, cj] - cols


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "mass_grad",
                     "coincident"),
)
def vjp_pos_sym(
    pos,
    g,
    mass=None,
    softening: float = SOFTENING,
    tile: int = 640,  # measured best on v5e (72.5 G pair-grads/s at N=65536;
                      # 69.6 at 512, 71.4 at 768; 1024 exceeds VMEM)
    interpret: bool = False,
    mass_grad: bool = False,
    coincident: str = "auto",
):
    """pos_bar for cotangent g of the square self-force, each unordered pair
    computed ONCE (the pairwise gradient is antisymmetric — see
    _pair_grad_block). Same diagonal-band traversal and constant-index
    reaction buffer as the symmetric forward kernel; ~1.5x the ordered
    backward (vjp_pos_pallas). Single-chunk (whole N in one kernel launch):
    the backward is called at trajectory-optimization sizes, far below the
    chunking threshold.

    mass_grad=True (mass mode only) also returns mass_bar — the cotangent
    w.r.t. per-body masses (dF_j/dm_k = w d_jk) — for ~2 extra VPU ops and
    2 reductions per pair: returns (pos_bar, mass_bar).

    coincident: off-diagonal d2 == 0 mask policy, as in the forward
    (ops/sym_mxu_force.body_force_sym_mxu): "auto" duplicate-scans pos and
    lax.cond-routes to maskless off-diagonal blocks when no two bodies
    share a position, "masked" always masks, "fast" never does (caller
    guarantees distinct positions). Diagonal blocks (self pairs) always
    mask. Unlike the forward hybrid (where w feeds matmuls directly and
    maskless is bitwise identical), here w and u feed long elementwise
    chains, and dropping the select changes XLA's fusion/FMA contraction:
    maskless results agree to a few ulp (measured ~5e-6 relative), not
    bitwise. Duplicate inputs under "auto" run the fully-masked kernels
    exactly."""
    from mini_nbody_tpu.utils.config import FAR

    if mass_grad and mass is None:
        raise ValueError("mass_grad=True requires per-body masses")
    check_coincident(coincident)
    n = pos.shape[0]
    masses = mass is not None
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident, resolve_auto

    coincident = resolve_auto(coincident, n)
    if coincident == "auto":
        dup = any_coincident(pos)  # scan the REAL bodies, pre-padding
    pos = pos.astype(jnp.float32)
    g = g.astype(jnp.float32)

    tile = min(tile, round_up(n, 8))
    if not interpret and tile < round_up(n, 8):
        tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    if np_ != n:
        pad = np_ - n
        pos = jnp.pad(pos, ((0, pad), (0, 0)),
                      constant_values=FAR if not masses else 0.0)
        g = jnp.pad(g, ((0, pad), (0, 0)))
        if masses:
            mass = jnp.pad(mass.astype(jnp.float32), (0, pad))
    if masses:
        p = jnp.concatenate([pos, mass.astype(jnp.float32)[:, None]], axis=1)
    else:
        p = pos
    k = p.shape[1]
    pt = p.T
    gt = g.T

    nb = np_ // tile
    nd = nb // 2 + 1
    vm = pltpu.VMEM
    pairs = np_ * np_
    ko = 4 if mass_grad else 3  # output row width (+ mass-cotangent column)

    def run(mask_offdiag):
        return pl.pallas_call(
        functools.partial(_sym_vjp_tri_kernel, softening=float(softening),
                          tile=tile, nb=nb, masses=masses,
                          mass_grad=mass_grad, mask_offdiag=mask_offdiag),
        grid=(nb, nd),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((tile, 3), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((k, tile),
                         lambda i, d: (0, jax.lax.rem(i + d, jnp.int32(nb))),
                         memory_space=vm),
            pl.BlockSpec((3, tile),
                         lambda i, d: (0, jax.lax.rem(i + d, jnp.int32(nb))),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, ko), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((ko, np_), lambda i, d: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, ko), jnp.float32),
            jax.ShapeDtypeStruct((ko, np_), jnp.float32),
        ],
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(26 if mass_grad else 22) * pairs,
            bytes_accessed=(np_ * 24) * 4,
            transcendentals=pairs // 2,
        ),
        interpret=interpret,
        )(p, g, pt, gt)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    total = rows + colsT.T
    if mass_grad:
        return total[:n, 0:3], total[:n, 3]
    return total[:n]


def vjp_pos_sym_ensemble(
    pos,
    g,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    interpret: bool = False,
    mass_grad: bool = False,
    coincident: str = "auto",
):
    """pos_bar for B INDEPENDENT systems in ONE program: the fp32-exact
    batched counterpart of vjp_pos_sym, structured exactly like
    vjp_mxu.vjp_pos_sym_mxu_ensemble (leading system grid axis, per-system
    block-base offsets, per-system (ko, np_) reaction block). Each system
    is bitwise identical to a standalone ``vjp_pos_sym(pos[b], g[b],
    mass[b], tile=tile)`` with the same tile. coincident='auto' scans
    within each system only (vmapped any_coincident)."""
    if mass_grad and mass is None:
        raise ValueError("mass_grad=True requires per-body masses")
    check_coincident(coincident)
    if pos.ndim != 3:
        raise ValueError(f"ensemble pos must be (B, N, 3), got {pos.shape}")
    return _vjp_sym_ensemble_impl(pos, g, mass, softening=float(softening),
                                  tile=tile, interpret=interpret,
                                  mass_grad=mass_grad, coincident=coincident)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "mass_grad",
                     "coincident"),
)
def _vjp_sym_ensemble_impl(pos, g, mass, *, softening, tile, interpret,
                           mass_grad, coincident):
    from mini_nbody_tpu.utils.config import FAR

    b, n = pos.shape[0], pos.shape[1]
    masses = mass is not None
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident, resolve_auto

    coincident = resolve_auto(coincident, n)
    if coincident == "auto":
        dup = jnp.any(jax.vmap(any_coincident)(pos))
    if tile is None:
        from mini_nbody_tpu.ops.symmetric_force import padded_auto_tile

        tile = padded_auto_tile(n, 640, interpret)
    t = min(tile, round_up(n, 8))
    if not interpret:
        t = round_up(t, 128)
    np_ = round_up(n, t)
    posf = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, 0)),
                   constant_values=FAR if not masses else 0.0
                   ).reshape(b * np_, 3)
    gf = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, np_ - n), (0, 0))).reshape(b * np_, 3)
    if masses:
        mf = jnp.pad(mass.astype(jnp.float32),
                     ((0, 0), (0, np_ - n))).reshape(b * np_)
        p = jnp.concatenate([posf, mf[:, None]], axis=1)
    else:
        p = posf
    k = p.shape[1]
    nb = np_ // t
    nd = nb // 2 + 1
    vm = pltpu.VMEM
    pairs = b * np_ * np_
    ko = 4 if mass_grad else 3

    def bi(s, i, d):
        return (s * nb + i, 0)

    def bjt(s, i, d):
        return (0, s * nb + jax.lax.rem(i + d, jnp.int32(nb)))

    def run(mask_offdiag):
        return pl.pallas_call(
            functools.partial(
                _sym_vjp_tri_kernel, softening=float(softening), tile=t,
                nb=nb, masses=masses, mass_grad=mass_grad,
                mask_offdiag=mask_offdiag, axis_off=1),
            grid=(b, nb, nd),
            in_specs=[
                pl.BlockSpec((t, k), bi, memory_space=vm),
                pl.BlockSpec((t, 3), bi, memory_space=vm),
                pl.BlockSpec((k, t), bjt, memory_space=vm),
                pl.BlockSpec((3, t), bjt, memory_space=vm),
            ],
            out_specs=[
                pl.BlockSpec((t, ko), bi, memory_space=vm),
                pl.BlockSpec((ko, np_), lambda s, i, d: (0, s),
                             memory_space=vm),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b * np_, ko), jnp.float32),
                jax.ShapeDtypeStruct((ko, b * np_), jnp.float32),
            ],
            compiler_params=_CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
            ),
            cost_estimate=pl.CostEstimate(
                flops=(26 if mass_grad else 22) * pairs,
                bytes_accessed=(b * np_ * 24) * 4,
                transcendentals=pairs // 2,
            ),
            interpret=interpret,
        )(p, gf, p.T, gf.T)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    total = rows + colsT.T
    if mass_grad:
        return (total[:, 0:3].reshape(b, np_, 3)[:, :n],
                total[:, 3].reshape(b, np_)[:, :n])
    return total.reshape(b, np_, 3)[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile_i", "tile_j", "interpret"),
)
def vjp_pos_rect(
    pos_k,
    g_k,
    pos_j,
    g_j,
    mass_k=None,
    mass_j=None,
    softening: float = SOFTENING,
    tile_i: int = 256,
    tile_j: int = 2048,
    interpret: bool = False,
):
    """pos_bar rows for a RECTANGULAR slice of the square self-force VJP:
    cotangent rows g_k for receivers pos_k, summed over the source set
    (pos_j, g_j) — the per-shard backward of a mesh-sharded force, where
    pos_k/g_k are the local shard and pos_j/g_j the gathered (or visiting)
    bodies. Both the receiver and source terms of the VJP sum over the same
    "other" index (ops/autodiff.py derivation), so the square kernel body is
    reused as-is; pos_k must be a subset of pos_j's system for the result to
    be a true gradient slice (the coincident-pair mask absorbs k's own
    appearance in the source set). Masses optional (both or neither)."""
    if (mass_k is None) != (mass_j is None):
        raise ValueError("vjp_pos_rect needs both masses or neither")
    nk, nj = pos_k.shape[0], pos_j.shape[0]
    unit_mass = mass_k is None
    pos_k = pos_k.astype(jnp.float32)
    g_k = g_k.astype(jnp.float32)
    pos_j = pos_j.astype(jnp.float32)
    g_j = g_j.astype(jnp.float32)

    tile_i = min(tile_i, round_up(nk, 8))
    tile_j = min(tile_j, round_up(nj, 128))
    nk_p = round_up(nk, tile_i)
    nj_p = round_up(nj, tile_j)

    if nk_p != nk:
        pos_k = jnp.pad(pos_k, ((0, nk_p - nk), (0, 0)))
        g_k = jnp.pad(g_k, ((0, nk_p - nk), (0, 0)))
        if not unit_mass:
            mass_k = jnp.pad(mass_k.astype(jnp.float32), (0, nk_p - nk))
    if nj_p != nj:
        from mini_nbody_tpu.utils.config import FAR

        # Far-padded sources: w underflows to 0 so every term is inert even
        # in unit-mass mode (g_j is zero-padded as well).
        pos_j = jnp.pad(pos_j, ((0, nj_p - nj), (0, 0)), constant_values=FAR)
        g_j = jnp.pad(g_j, ((0, nj_p - nj), (0, 0)))
        if not unit_mass:
            mass_j = jnp.pad(mass_j.astype(jnp.float32), (0, nj_p - nj))

    if unit_mass:
        pk = pos_k
        pjt = pos_j.T
    else:
        pk = jnp.concatenate([pos_k, mass_k[:, None]], axis=1)
        pjt = jnp.concatenate([pos_j.T, mass_j[None, :]], axis=0)
    gjt = g_j.T

    grid = (nk_p // tile_i, nj_p // tile_j)
    pairs = nk_p * nj_p
    out = pl.pallas_call(
        functools.partial(_vjp_kernel, softening=float(softening),
                          acc_steps=grid[1], unit_mass=unit_mass),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, pk.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pjt.shape[0], tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nk_p, 3), jnp.float32),
        compiler_params=_CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=35 * pairs,
            bytes_accessed=(nk_p * 12 + nj_p * 12) * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(pk, g_k, pjt, gjt)
    return out[:nk]


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile_i", "tile_j", "interpret",
                     "coincident"),
)
def vjp_pos_pallas(
    pos,
    g,
    mass=None,
    softening: float = SOFTENING,
    tile_i: int = 256,
    tile_j: int = 2048,
    interpret: bool = False,
    coincident: str = "auto",
):
    """pos_bar for cotangent g of F(pos) (square self-force), Pallas kernel.

    Zero-padding the tails is exact here: padded rows are sliced off, and
    padded j columns contribute w*g_j = 0 and coeff*(d) terms with g = 0 on
    both sides only when mass-weighted... in unit-mass mode a padded j at the
    origin would contribute w g_j = 0 (g_j = 0) but ALSO -g_k sum w and
    3u (g_k.d) d with nonzero w — so tails must still be inert: we pad with
    zero cotangents AND zero masses in mass mode, and in unit-mass mode rely
    on far-padding (w underflows to 0).

    coincident: every call is square (self-force), so self pairs only live
    in blocks whose k/j tile ranges intersect; "auto" duplicate-scans pos
    and routes off-overlap blocks to the maskless body when safe, "fast"
    skips the scan, "masked" masks every block. Like vjp_pos_sym (and
    unlike the matmul-fed hybrids), maskless agrees to a few ulp rather
    than bitwise — the w/u select changes XLA FMA contraction in the
    elementwise chains; duplicate inputs under "auto" run the all-masked
    kernel exactly."""
    from mini_nbody_tpu.utils.config import FAR

    check_coincident(coincident)
    n = pos.shape[0]
    unit_mass = mass is None
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident, resolve_auto

    coincident = resolve_auto(coincident, n)
    if coincident == "auto":
        dup = any_coincident(pos)  # scan the REAL bodies, pre-padding
    pos = pos.astype(jnp.float32)
    g = g.astype(jnp.float32)

    tile_i = min(tile_i, round_up(n, 8))
    tile_j = min(tile_j, round_up(n, 128))
    # pad to a common multiple of both tilings
    np_ = round_up(round_up(n, tile_i), tile_j)

    if np_ != n:
        pad = np_ - n
        pos = jnp.pad(pos, ((0, pad), (0, 0)),
                      constant_values=FAR if unit_mass else 0.0)
        g = jnp.pad(g, ((0, pad), (0, 0)))
        if not unit_mass:
            mass = jnp.pad(mass.astype(jnp.float32), (0, pad))

    if unit_mass:
        pk = pos
        pjt_rows = [pos.T]
    else:
        pk = jnp.concatenate([pos, mass[:, None]], axis=1)  # (Np, 4)
        pjt_rows = [pos.T, mass[None, :]]
    pjt = jnp.concatenate(pjt_rows, axis=0) if len(pjt_rows) > 1 else pjt_rows[0]
    gjt = g.T  # (3, Np)

    grid = (np_ // tile_i, np_ // tile_j)
    pairs = np_ * np_

    def run(mask_mode):
        return pl.pallas_call(
            functools.partial(_vjp_kernel, softening=float(softening),
                              acc_steps=grid[1], unit_mass=unit_mass,
                              mask_mode=mask_mode, tile_i=tile_i,
                              tile_j=tile_j),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_i, pk.shape[1]), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pjt.shape[0], tile_j), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_j), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((np_, 3), jnp.float32),
            compiler_params=_CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=35 * pairs,
                bytes_accessed=(np_ * 12) * 4,
                transcendentals=pairs,
            ),
            interpret=interpret,
        )(pk, g, pjt, gjt)

    if coincident == "masked":
        out = run("all")
    elif coincident == "fast":
        out = run("overlap")
    else:
        out = jax.lax.cond(dup, lambda: run("all"), lambda: run("overlap"))
    return out[:n]


def _onesided_grad_block(pa, ga, pbt, softening, masses):
    """Gradient of the ordered pairs (a <- b) with cotangents on the A side
    only — the per-device tile of the 2-D grid backward, where the mesh
    tiles ALL ordered pairs as (row group) x (col group) and each device
    owns the receiver cotangents g_rows of its row group.

    With d = p_b - p_a, the pair force on a is w m_b d, so its cotangent
    contribution is

        t = 3 u m_b (g_a . d) d - w m_b g_a        (u = s^-5/2)

    to pos_bar_a, and exactly -t to pos_bar_b (translation invariance) —
    _pair_grad_block's antisymmetric t specialized to g_b = 0, with the
    dead g_b products removed (~1/3 fewer VPU ops). Returns (row sums of t
    over b, column sums of t over a); caller adds rows to a_bar and
    SUBTRACTS the columns from b_bar."""
    xa, ya, za = pa[:, 0:1], pa[:, 1:2], pa[:, 2:3]
    dx = pbt[0:1, :] - xa
    dy = pbt[1:2, :] - ya
    dz = pbt[2:3, :] - za
    d2 = dx * dx + dy * dy + dz * dz
    s = d2 + jnp.asarray(softening, dx.dtype)
    inv = jax.lax.rsqrt(s)
    inv2 = inv * inv
    w = inv2 * inv
    u = w * inv2
    zero = d2 == 0.0
    w = jnp.where(zero, jnp.asarray(0.0, w.dtype), w)
    u = jnp.where(zero, jnp.asarray(0.0, u.dtype), u)

    gax, gay, gaz = ga[:, 0:1], ga[:, 1:2], ga[:, 2:3]
    dot_a = gax * dx + gay * dy + gaz * dz
    if masses:
        mb = pbt[3:4, :]
        coeff = 3.0 * (u * mb * dot_a)
        wmb = w * mb
        tx = coeff * dx - wmb * gax
        ty = coeff * dy - wmb * gay
        tz = coeff * dz - wmb * gaz
    else:
        coeff = 3.0 * (u * dot_a)
        tx = coeff * dx - w * gax
        ty = coeff * dy - w * gay
        tz = coeff * dz - w * gaz
    rows = jnp.concatenate(
        [jnp.sum(tx, axis=1, keepdims=True),
         jnp.sum(ty, axis=1, keepdims=True),
         jnp.sum(tz, axis=1, keepdims=True)], axis=1)
    cols = jnp.concatenate(
        [jnp.sum(tx, axis=0, keepdims=True),
         jnp.sum(ty, axis=0, keepdims=True),
         jnp.sum(tz, axis=0, keepdims=True)], axis=0)
    return rows, cols


def _pair_vjp_kernel(pa_ref, ga_ref, pbt_ref, rows_ref, colsT_ref, *,
                     softening, tile, masses):
    """Cross-set step (i in A, j in B): rows accumulate per-block over the
    consecutive j revisits; colsT is the whole-B constant-index buffer."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    rows, cols = _onesided_grad_block(
        pa_ref[:], ga_ref[:], pbt_ref[:], softening, masses)

    @pl.when(j == 0)
    def _rows_init():
        rows_ref[:] = rows

    @pl.when(j > 0)
    def _rows_acc():
        rows_ref[:] = rows_ref[:] + rows

    cj = pl.ds(j * tile, tile)
    colsT_ref[:, cj] = colsT_ref[:, cj] - cols


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret"),
)
def vjp_pos_pair(
    pos_a,
    g_a,
    pos_b,
    mass_a=None,
    mass_b=None,
    softening: float = SOFTENING,
    tile: int = 512,
    interpret: bool = False,
):
    """Both-sided position cotangents of the ordered pairs (a <- b), with
    receiver cotangents g_a only: returns (a_bar (Na,3), b_bar (Nb,3)).

    The building block of the O(N/sqrt(P)) 2-D grid backward
    (parallel/sharded.py): the mesh tiles all ordered pairs as row group x
    col group, each device runs this kernel once on its (rows, cols) tile,
    and two psum_scatters (one per mesh axis) reduce a_bar/b_bar to the
    owning shards. Self-coincidences (a body present in both groups meets
    itself) hit the d2 == 0 mask, matching the forward's self-pair
    semantics. Masses optional (both or neither); mass cotangents are zero
    by contract (ops/autodiff.py)."""
    if (mass_a is None) != (mass_b is None):
        raise ValueError("vjp_pos_pair needs both masses or neither")
    na, nb_n = pos_a.shape[0], pos_b.shape[0]
    masses = mass_a is not None
    pos_a = pos_a.astype(jnp.float32)
    g_a = g_a.astype(jnp.float32)
    pos_b = pos_b.astype(jnp.float32)

    t = min(tile, round_up(na, 8), round_up(nb_n, 8))
    if not interpret:
        t = round_up(t, 128)  # 128-aligned colsT lane offsets (Mosaic)
    na_p = round_up(na, t)
    nb_p = round_up(nb_n, t)
    if na_p != na:
        # Zero-padded receivers are inert: g_a = 0 kills both their row
        # gradient and their column contribution.
        pos_a = jnp.pad(pos_a, ((0, na_p - na), (0, 0)))
        g_a = jnp.pad(g_a, ((0, na_p - na), (0, 0)))
        if masses:
            mass_a = jnp.pad(mass_a.astype(jnp.float32), (0, na_p - na))
    if nb_p != nb_n:
        from mini_nbody_tpu.utils.config import FAR

        # FAR-padded sources: w and u underflow to exact 0.
        pos_b = jnp.pad(pos_b, ((0, nb_p - nb_n), (0, 0)),
                        constant_values=FAR)
        if masses:
            mass_b = jnp.pad(mass_b.astype(jnp.float32), (0, nb_p - nb_n))

    if masses:
        pa = jnp.concatenate(
            [pos_a, mass_a.astype(jnp.float32)[:, None]], axis=1)
        pbt = jnp.concatenate(
            [pos_b.T, mass_b.astype(jnp.float32)[None, :]], axis=0)
    else:
        pa = pos_a
        pbt = pos_b.T
    k = pa.shape[1]

    vm = pltpu.VMEM
    pairs = na_p * nb_p
    rows, colsT = pl.pallas_call(
        functools.partial(_pair_vjp_kernel, softening=float(softening),
                          tile=t, masses=masses),
        grid=(na_p // t, nb_p // t),
        in_specs=[
            pl.BlockSpec((t, k), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((t, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((k, t), lambda i, j: (0, j), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((t, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, nb_p), lambda i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_p, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, nb_p), jnp.float32),
        ],
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=26 * pairs,
            bytes_accessed=(na_p + nb_p) * 24 * 4,
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(pa, g_a, pbt)
    return rows[:na], colsT.T[:nb_n]
