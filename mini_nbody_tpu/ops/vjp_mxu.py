"""Symmetric x MXU hybrid BACKWARD kernel: the force-VJP counterpart of
ops/sym_mxu_force.py.

The fp32 symmetric backward (vjp_kernel.vjp_pos_sym) is VPU-bound at ~50
VPU ops per unordered pair (measured 128.6 G pair-grads/s on v5e). Like the
forward, most of those ops are w-weighted accumulations that factor into
matmuls. With d = p_b - p_a, s = |d|^2 + eps, w = s^-3/2, u = s^-5/2, the
pair's gradient contribution to pos_bar_a (and -1x to pos_bar_b) is

    t = w (m_a g_b - m_b g_a) + c d,    c = 3 u (m_b (g_a.d) - m_a (g_b.d))

(ops/vjp_kernel.py derivation). Only the SCALARS w and c depend on both
bodies; every sum of t over a tile is two matmuls against per-body operands:

    row side:  S_g = W @ [g | m],  S_p = C @ [p | 1]
               pos_bar_a += m_a S_g[:, :3] - g_a S_g[:, 3]
                          +     S_p[:, :3] - p_a S_p[:, 3]
    reactions: the SAME combine with W^T / C^T sums over a (the minus of
               the antisymmetric t is baked into the transposed contraction:
               -t = w (m_b g_a - m_a g_b) + c (p_a - p_b)).

The VPU keeps only the distance + rsqrt + two cotangent dot products
(~30 op-equivalents per unordered pair vs ~50), and all d-products and
reductions ride the MXU.

Precision: matmuls run at MXU DEFAULT (single-pass bf16 operands, fp32
accumulation) with the same error-compensated operand split as the forward
hybrid — each operand [v | m] is packed as [vhi | mhi | vlo | mlo] (T, 8)
with vhi = bf16(v) via lax.reduce_precision (sym_mxu_force._pack explains
why astype round-trips silently no-op under XLA), restoring ~16 effective
mantissa bits on the operand for free (VMEM lane-pads the minor dim to 128
either way). Residual error is the ~4e-3-relative bf16 rounding of w and c
— the same uniform class as the forward hybrid, gated by the same style of
tests. Use vjp_pos_sym for fp32-exact gradients.

Self/coincident pairs are masked on the pre-softening |d|^2 == 0 exactly as
in every other backend (the eps^-1.5 self weight otherwise swamps fp32) —
with the forward hybrid's coincident='auto' refinement: diagonal blocks
always mask (self pairs), off-diagonal blocks go maskless behind the same
O(N log N) duplicate scan + lax.cond, bitwise identical to full masking
for every input (sym_mxu_force.any_coincident rationale).

Structure: identical diagonal-band traversal, whole-buffer constant-index
reaction output and tail handling as vjp_pos_sym; single-chunk (the backward
runs at trajectory-optimization sizes). mass_grad rides as a 9th output
column computed on the VPU (2 ops/pair): mass_bar_a = -sum_b w (g_b.d),
mass_bar_b = +sum_a w (g_a.d).
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


def _mm(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _wc_block(pi, pjt, gi, gjt, softening, masses, mass_grad, mask=True):
    """Per-pair scalars for one (i-tile, j-tile) block: returns
    (w, c[, mrow (T,1), mcolT (1,T)]) — everything the matmuls need.

    mask=False drops the d2 == 0 zeroing (~3 of the block's ~30 VPU ops) —
    valid for off-diagonal blocks when a duplicate scan ruled out
    exactly-coincident distinct bodies (FAR pads underflow w and u against
    every real body at |d| ~ 1e18, and pad-vs-pad coincidences only occur
    inside the final tile's DIAGONAL block, which always masks) — the
    backward mirror of ops/sym_mxu_force._w_block."""
    dx = pjt[0:1, :] - pi[:, 0:1]
    dy = pjt[1:2, :] - pi[:, 1:2]
    dz = pjt[2:3, :] - pi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    s = d2 + jnp.asarray(softening, dx.dtype)
    inv = jax.lax.rsqrt(s)
    inv2 = inv * inv
    w = inv2 * inv
    u = w * inv2
    if mask:
        zero = d2 == 0.0
        w = jnp.where(zero, jnp.asarray(0.0, w.dtype), w)
        u = jnp.where(zero, jnp.asarray(0.0, u.dtype), u)

    dot_a = gi[:, 0:1] * dx + gi[:, 1:2] * dy + gi[:, 2:3] * dz
    dot_b = gjt[0:1, :] * dx + gjt[1:2, :] * dy + gjt[2:3, :] * dz
    if masses:
        c = 3.0 * (u * (pjt[3:4, :] * dot_a - pi[:, 3:4] * dot_b))
    else:
        c = 3.0 * (u * (dot_a - dot_b))
    if not mass_grad:
        return w, c, None, None
    wda = w * dot_a
    return (w, c,
            -jnp.sum(w * dot_b, axis=1, keepdims=True),
            jnp.sum(wda, axis=0, keepdims=True))


def _row_sums(w, c, qj, mrow):
    """(T, 8 or 9) row-side sums: ONE (T,2T)@(2T,16) matmul against the
    block-diagonal operand q = [[A_g, 0], [0, A_p]] computes W@A_g and
    C@A_p together — the 16 output lanes live in one 128-lane MXU register
    either way, so merging the two matmuls halves MXU issues for free."""
    r = _mm(jnp.concatenate([w, c], axis=1), qj, ((1,), (0,)))  # (T, 16)
    parts = [r[:, 0:4] + r[:, 4:8], r[:, 8:12] + r[:, 12:16]]
    if mrow is not None:
        parts.append(mrow)
    return jnp.concatenate(parts, axis=1)


def _col_sums(w, c, qi, mcolT):
    """(8 or 9, T) reaction-side sums (contraction over the i-tile), same
    merged block-diagonal matmul as _row_sums."""
    ct = _mm(qi, jnp.concatenate([w, c], axis=0), ((0,), (0,)))  # (16, T)
    parts = [ct[0:4, :] + ct[4:8, :], ct[8:12, :] + ct[12:16, :]]
    if mcolT is not None:
        parts.append(mcolT)
    return jnp.concatenate(parts, axis=0)


def _bwd_tri_kernel(pi_ref, pjt_ref, gi_ref, gjt_ref, qj_ref, qi_ref,
                    rows_ref, colsT_ref, *,
                    softening, tile, nb, masses, mass_grad,
                    mask_offdiag=True, axis_off=0):
    """Diagonal-band step (structure: vjp_kernel._sym_vjp_tri_kernel).
    d == 0: ordered row sums cover both pair orders (t is antisymmetric, so
    row a's sum over the full tile already includes the reaction of every
    in-tile partner) and always masks d2 == 0 (self pairs); d > 0: rows
    accumulate +t sums, the constant-index reaction buffer accumulates the
    transposed-contraction sums, masked only when mask_offdiag (the
    maskless body is exact unless distinct coincident bodies exist —
    _wc_block / the forward's _tri_kernel rationale).

    axis_off=1 runs the SAME body under the batched-ensemble grid
    (system, i, d) — exactly as in sym_mxu_force._tri_kernel: the
    (i == 0, d == 0) colsT zero-init refires at the start of every system
    because program ids reset per leading-axis step."""
    i = pl.program_id(axis_off)
    d = pl.program_id(axis_off + 1)
    jg = jax.lax.rem(i + d, jnp.int32(nb))

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    active = jnp.logical_or(d * 2 != nb, i * 2 < nb)

    @pl.when(d == 0)  # always active; self pairs: always masked
    def _diag():
        w, c, mrow, _ = _wc_block(
            pi_ref[:], pjt_ref[:], gi_ref[:], gjt_ref[:], softening,
            masses, mass_grad)
        rows_ref[:] = _row_sums(w, c, qj_ref[:], mrow)

    @pl.when(jnp.logical_and(active, d > 0))
    def _off():
        w, c, mrow, mcolT = _wc_block(
            pi_ref[:], pjt_ref[:], gi_ref[:], gjt_ref[:], softening,
            masses, mass_grad, mask=mask_offdiag)
        rows_ref[:] = rows_ref[:] + _row_sums(w, c, qj_ref[:], mrow)
        ct = _col_sums(w, c, qi_ref[:], mcolT)
        cj = pl.ds(jg * tile, tile)
        colsT_ref[:, cj] = colsT_ref[:, cj] + ct


def _bwd_rect_kernel(pi_ref, pjt_ref, gi_ref, gjt_ref, qj_ref, rows_ref, *,
                     softening, masses, mask_mode="all", tile_k=0, tile_j=0):
    """Rectangular backward step: ONLY the row-side sums for the local
    receivers (the ordered VJP formula factors into exactly the rows half
    of the symmetric backward — see vjp_rect_mxu). j streams via
    consecutive output-block revisits.

    mask_mode "overlap" (square calls only — vjp_rect_mxu detects array
    identity): self pairs only live in blocks whose k/j body ranges
    intersect; FAR-vs-FAR pad pairs sit in the (last k-tile, last j-block)
    block, which overlaps by construction (equal padded lengths), so pads
    stay exact too."""
    j = pl.program_id(1)

    def store(rows):
        @pl.when(j == 0)
        def _init():
            rows_ref[:] = rows

        @pl.when(j > 0)
        def _acc():
            rows_ref[:] = rows_ref[:] + rows

    def rows_for(mask):
        w, c, _, _ = _wc_block(pi_ref[:], pjt_ref[:], gi_ref[:], gjt_ref[:],
                               softening, masses, mass_grad=False, mask=mask)
        return _row_sums(w, c, qj_ref[:], None)

    if mask_mode == "all":
        store(rows_for(True))
    else:
        i = pl.program_id(0)
        lo_i, hi_i = i * tile_k, (i + 1) * tile_k
        lo_j, hi_j = j * tile_j, (j + 1) * tile_j
        overlap = jnp.logical_and(lo_i < hi_j, lo_j < hi_i)

        @pl.when(overlap)
        def _masked():
            store(rows_for(True))

        @pl.when(jnp.logical_not(overlap))
        def _maskless():
            store(rows_for(False))


def _split8(v):
    """Compensated [vhi | vlo] operand (sym_mxu_force._pack rationale):
    hi half MUST come from lax.reduce_precision, not an astype round-trip."""
    vhi = jax.lax.reduce_precision(v, 8, 7)
    return jnp.concatenate([vhi, v - vhi], axis=1)


def _combine(total, mf, gf, posf):
    """pos_bar from the (., 8/9) row+reaction sums: m*S_g[:, :3] - g*S_g[:, 3]
    + S_p[:, :3] - p*S_p[:, 3] with the three products materialized behind an
    optimization_barrier. Without it XLA contracts mul+sub into FMAs, and the
    CONTRACTION CHOICE is shape-dependent: the batched-ensemble combine (B*N
    rows, reshape after) fused differently from the standalone (N rows) and
    broke bitwise per-system equality by ~5e-6 relative (mass mode only —
    unit mass multiplies by 1.0, which rounds identically either way). With
    every product rounded separately the add/sub chain is associativity-fixed
    and both shapes agree bitwise. Cost: three O(N) stores per call."""
    sg = total[:, 0:4]
    sp = total[:, 4:8]
    t_m, t_g, t_p = jax.lax.optimization_barrier(
        (mf[:, None] * sg[:, 0:3], gf * sg[:, 3:4], posf * sp[:, 3:4]))
    return t_m - t_g + sp[:, 0:3] - t_p


def _blockdiag_q(a_g, a_p, nblk, tile):
    """(2*N, 16) per-block block-diagonal operand [[A_g, 0], [0, A_p]]
    (_row_sums rationale)."""
    zeros8 = jnp.zeros_like(a_g)
    return jnp.concatenate([
        jnp.concatenate([a_g, zeros8], axis=1).reshape(nblk, tile, 16),
        jnp.concatenate([zeros8, a_p], axis=1).reshape(nblk, tile, 16),
    ], axis=1).reshape(2 * nblk * tile, 16)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "mass_grad",
                     "coincident"),
)
def vjp_pos_sym_mxu(
    pos,
    g,
    mass=None,
    softening: float = SOFTENING,
    tile: int = 512,
    interpret: bool = False,
    mass_grad: bool = False,
    coincident: str = "auto",
):
    """pos_bar for cotangent g of the square self-force via the MXU hybrid
    backward (module docstring): each unordered pair's w, c computed ONCE on
    the VPU, all accumulations as bf16-operand/fp32-accumulate matmuls with
    the compensated operand split. bf16-rounding error class (~4e-3 relative
    per pair, uniform); use vjp_pos_sym for fp32-exact.

    mass_grad=True (mass mode) also returns mass_bar: (pos_bar, mass_bar).

    coincident: off-diagonal d2 == 0 mask policy, exactly as in
    vjp_kernel.vjp_pos_sym and the forward hybrid — "auto" (default)
    duplicate-scans pos and routes to maskless off-diagonal blocks when
    safe (bitwise identical to "masked" for every input), "masked" always
    masks, "fast" never does. Diagonal blocks (self pairs) always mask.
    """
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
    if not interpret:
        # 128-align always: Mosaic must prove the colsT lane offsets
        # (sym_mxu_force._resolve_tiling rationale).
        tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    if np_ != n:
        pad = np_ - n
        # FAR-padded tails: w and c underflow to 0 against every real body,
        # and FAR-vs-FAR pairs hit the |d|^2 == 0 coincidence mask.
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=FAR)
        g = jnp.pad(g, ((0, pad), (0, 0)))
        if masses:
            mass = jnp.pad(mass.astype(jnp.float32), (0, pad))
    if masses:
        m = mass.astype(jnp.float32)
        p = jnp.concatenate([pos, m[:, None]], axis=1)
    else:
        m = jnp.ones((np_,), jnp.float32)
        p = pos
    k = p.shape[1]
    a_g = _split8(jnp.concatenate([g, m[:, None]], axis=1))
    a_p = _split8(
        jnp.concatenate([pos, jnp.ones((np_, 1), jnp.float32)], axis=1))

    nb = np_ // tile
    q = _blockdiag_q(a_g, a_p, nb, tile)
    nd = nb // 2 + 1
    vm = pltpu.VMEM
    ko = 9 if mass_grad else 8
    pairs = np_ * np_

    def bi(i, d):
        return (i, 0)

    def bj(i, d):
        return (jax.lax.rem(i + d, jnp.int32(nb)), 0)

    def bjt(i, d):
        return (0, jax.lax.rem(i + d, jnp.int32(nb)))

    def run(mask_offdiag):
        return pl.pallas_call(
        functools.partial(_bwd_tri_kernel, softening=float(softening),
                          tile=tile, nb=nb, masses=masses,
                          mass_grad=mass_grad, mask_offdiag=mask_offdiag),
        grid=(nb, nd),
        in_specs=[
            pl.BlockSpec((tile, k), bi, memory_space=vm),
            pl.BlockSpec((k, tile), bjt, memory_space=vm),
            pl.BlockSpec((tile, 3), bi, memory_space=vm),
            pl.BlockSpec((3, tile), bjt, memory_space=vm),
            pl.BlockSpec((2 * tile, 16), bj, memory_space=vm),
            pl.BlockSpec((2 * tile, 16), bi, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, ko), bi, memory_space=vm),
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
            flops=(30 + 64) * pairs,  # VPU scalars + 4 padded (.,8) matmuls
            bytes_accessed=np_ * 160,
            transcendentals=pairs // 2,
        ),
        interpret=interpret,
        )(p, p.T, g, g.T, q, q)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    total = rows + colsT.T
    pos_bar = _combine(total, m, g, pos)
    if mass_grad:
        return pos_bar[:n], total[:n, 8]
    return pos_bar[:n]


def vjp_pos_sym_mxu_ensemble(
    pos,
    g,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    interpret: bool = False,
    mass_grad: bool = False,
    coincident: str = "auto",
):
    """pos_bar for B INDEPENDENT systems in ONE program: pos (B, N, 3),
    g (B, N, 3) [, mass (B, N)] -> (B, N, 3) [, mass_bar (B, N)].

    The batched counterpart of vjp_pos_sym_mxu, built exactly like the
    batched ensemble FORWARD (sym_mxu_force._build_tri_ensemble): the tri
    backward kernel under a leading system grid axis (B, nb, nd), every
    index map offset by the system's block base s*nb, and a per-system
    (ko, np_) reaction block at column-block s. Each system's gradients are
    bitwise identical to a standalone ``vjp_pos_sym_mxu(pos[b], g[b],
    mass[b], tile=tile)`` call with the same tile (same operands, same
    traversal — tested). Replaces autodiff's former lax.scan of per-system
    backward launches, which paid one full kernel-launch + tiny-grid pass
    per system (the forward's 3.2x batching win, commit e987bec; measured
    backward rates: benchmarks/RESULTS.md r4).

    coincident='auto' scans WITHIN each system only (vmapped
    any_coincident — cross-system coincidences are never a hot pair since
    cross-system blocks don't exist in the block-diagonal traversal).
    """
    if mass_grad and mass is None:
        raise ValueError("mass_grad=True requires per-body masses")
    check_coincident(coincident)
    if pos.ndim != 3:
        raise ValueError(f"ensemble pos must be (B, N, 3), got {pos.shape}")
    return _vjp_ensemble_impl(pos, g, mass, softening=float(softening),
                              tile=tile, interpret=interpret,
                              mass_grad=mass_grad, coincident=coincident)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "mass_grad",
                     "coincident"),
)
def _vjp_ensemble_impl(pos, g, mass, *, softening, tile, interpret,
                       mass_grad, coincident):
    b, n = pos.shape[0], pos.shape[1]
    masses = mass is not None
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident, resolve_auto

    coincident = resolve_auto(coincident, n)
    if coincident == "auto":
        dup = jnp.any(jax.vmap(any_coincident)(pos))
    if tile is None:
        # Per-system padding costs quadratic pair work — same scoring as
        # the ensemble forward, seeded with this kernel's measured-best
        # single-system default (512).
        from mini_nbody_tpu.ops.symmetric_force import padded_auto_tile

        tile = padded_auto_tile(n, 512, interpret)
    t = min(tile, round_up(n, 8))
    if not interpret:
        t = round_up(t, 128)
    np_ = round_up(n, t)
    # Per-system FAR/zero pads: inert exactly as in the standalone backward
    # (pad-pad coincidences only occur inside always-masked diagonal blocks
    # of their own system; cross-system blocks never run).
    posf = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, np_ - n), (0, 0)),
                   constant_values=FAR).reshape(b * np_, 3)
    gf = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, np_ - n), (0, 0))).reshape(b * np_, 3)
    if masses:
        mf = jnp.pad(mass.astype(jnp.float32),
                     ((0, 0), (0, np_ - n))).reshape(b * np_)
        p = jnp.concatenate([posf, mf[:, None]], axis=1)
    else:
        mf = jnp.ones((b * np_,), jnp.float32)
        p = posf
    k = p.shape[1]
    a_g = _split8(jnp.concatenate([gf, mf[:, None]], axis=1))
    a_p = _split8(
        jnp.concatenate([posf, jnp.ones((b * np_, 1), jnp.float32)], axis=1))
    nb = np_ // t
    q = _blockdiag_q(a_g, a_p, b * nb, t)
    nd = nb // 2 + 1
    vm = pltpu.VMEM
    ko = 9 if mass_grad else 8
    pairs = b * np_ * np_

    def bi(s, i, d):
        return (s * nb + i, 0)

    def bj(s, i, d):
        return (s * nb + jax.lax.rem(i + d, jnp.int32(nb)), 0)

    def bjt(s, i, d):
        return (0, s * nb + jax.lax.rem(i + d, jnp.int32(nb)))

    def run(mask_offdiag):
        return pl.pallas_call(
            functools.partial(
                _bwd_tri_kernel, softening=float(softening), tile=t, nb=nb,
                masses=masses, mass_grad=mass_grad,
                mask_offdiag=mask_offdiag, axis_off=1),
            grid=(b, nb, nd),
            in_specs=[
                pl.BlockSpec((t, k), bi, memory_space=vm),
                pl.BlockSpec((k, t), bjt, memory_space=vm),
                pl.BlockSpec((t, 3), bi, memory_space=vm),
                pl.BlockSpec((3, t), bjt, memory_space=vm),
                pl.BlockSpec((2 * t, 16), bj, memory_space=vm),
                pl.BlockSpec((2 * t, 16), bi, memory_space=vm),
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
                flops=(30 + 64) * pairs,
                bytes_accessed=b * np_ * 160,
                transcendentals=pairs // 2,
            ),
            interpret=interpret,
        )(p, p.T, gf, gf.T, q, q)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    total = rows + colsT.T
    pos_bar = _combine(total, mf, gf, posf).reshape(b, np_, 3)[:, :n]
    if mass_grad:
        return pos_bar, total[:, 8].reshape(b, np_)[:, :n]
    return pos_bar


def vjp_rect_mxu(
    pos_k,
    g_k,
    pos_j,
    g_j,
    mass_k=None,
    mass_j=None,
    softening: float = SOFTENING,
    tile: int = 768,
    interpret: bool = False,
    coincident: str = "masked",
):
    """pos_bar rows for a RECTANGULAR slice of the square self-force VJP via
    the MXU hybrid — the bf16-class counterpart of vjp_kernel.vjp_pos_rect
    (per-shard backward of a mesh-sharded force: local receivers (pos_k,
    g_k) against the gathered/visiting sources (pos_j, g_j)).

    The ordered VJP formula factors into exactly the rows half of the
    symmetric backward: with the same per-pair scalars w and
    c = 3 u (m_j (g_k.d) - m_k (g_j.d)),

        pos_bar_k = m_k S_g[:, :3] - g_k S_g[:, 3]
                  +     S_p[:, :3] - p_k S_p[:, 3],
        [S_g | S_p] = [w | c] @ [[A_g, 0], [0, A_p]],  A_g = [g_j | m_j],
                                                       A_p = [p_j | 1]

    so the kernel is the tri kernel minus the reaction buffer, on a full
    rectangular grid. pos_k must be a subset of pos_j's system for the
    result to be a true gradient slice (the coincident-pair mask absorbs
    k's own appearance in the sources). Masses optional (both or neither).

    coincident applies to SQUARE calls only (pos_j is the same array
    object as pos_k — autodiff's rect-called-square branch beyond the
    symmetric kernels' 131072 bound): self pairs only live in
    range-intersecting blocks, so off-overlap blocks can run maskless
    behind the duplicate scan (body_force_mxu's overlap rationale).
    Rectangular calls always mask — pos_k is embedded in pos_j at a
    caller-only-known offset under the sharded exchanges.
    """
    if (mass_k is None) != (mass_j is None):
        raise ValueError("vjp_rect_mxu needs both masses or neither")
    check_coincident(coincident)
    return _vjp_rect_mxu_impl(
        pos_k, g_k, pos_j, g_j, mass_k, mass_j, softening=softening,
        tile=tile, interpret=interpret, coincident=coincident,
        square=pos_k is pos_j)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "coincident",
                     "square"),
)
def _vjp_rect_mxu_impl(
    pos_k,
    g_k,
    pos_j,
    g_j,
    mass_k,
    mass_j,
    *,
    softening,
    tile,
    interpret,
    coincident,
    square,
):
    nk, nj = pos_k.shape[0], pos_j.shape[0]
    if square:
        from mini_nbody_tpu.ops.sym_mxu_force import resolve_auto

        coincident = resolve_auto(coincident, nk)
    if coincident == "auto" and square:
        from mini_nbody_tpu.ops.sym_mxu_force import any_coincident

        dup = any_coincident(pos_k)
    masses = mass_k is not None
    pos_k = pos_k.astype(jnp.float32)
    g_k = g_k.astype(jnp.float32)
    pos_j = pos_j.astype(jnp.float32)
    g_j = g_j.astype(jnp.float32)

    tile_k = min(tile, round_up(nk, 8))
    tile_j = min(tile, round_up(nj, 8))
    if not interpret:
        # 128-align always (sym_mxu_force._resolve_tiling rationale).
        tile_k = round_up(tile_k, 128)
        tile_j = round_up(tile_j, 128)
    nk_p = round_up(nk, tile_k)
    nj_p = round_up(nj, tile_j)

    if nk_p != nk:
        pad = nk_p - nk
        pos_k = jnp.pad(pos_k, ((0, pad), (0, 0)), constant_values=FAR)
        g_k = jnp.pad(g_k, ((0, pad), (0, 0)))
        if masses:
            mass_k = jnp.pad(mass_k.astype(jnp.float32), (0, pad))
    if nj_p != nj:
        pad = nj_p - nj
        # FAR-padded sources: w and c underflow against every receiver.
        pos_j = jnp.pad(pos_j, ((0, pad), (0, 0)), constant_values=FAR)
        g_j = jnp.pad(g_j, ((0, pad), (0, 0)))
        if masses:
            mass_j = jnp.pad(mass_j.astype(jnp.float32), (0, pad))

    if masses:
        mk = mass_k.astype(jnp.float32)
        mj = mass_j.astype(jnp.float32)
        pk = jnp.concatenate([pos_k, mk[:, None]], axis=1)
        pjt = jnp.concatenate([pos_j.T, mj[None, :]], axis=0)
    else:
        mk = jnp.ones((nk_p,), jnp.float32)
        mj = jnp.ones((nj_p,), jnp.float32)
        pk = pos_k
        pjt = pos_j.T
    k = pk.shape[1]
    a_g = _split8(jnp.concatenate([g_j, mj[:, None]], axis=1))
    a_p = _split8(
        jnp.concatenate([pos_j, jnp.ones((nj_p, 1), jnp.float32)], axis=1))
    q = _blockdiag_q(a_g, a_p, nj_p // tile_j, tile_j)

    grid = (nk_p // tile_k, nj_p // tile_j)
    pairs = nk_p * nj_p
    vm = pltpu.VMEM

    def run(mask_mode):
        return pl.pallas_call(
            functools.partial(_bwd_rect_kernel, softening=float(softening),
                              masses=masses, mask_mode=mask_mode,
                              tile_k=tile_k, tile_j=tile_j),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_k, k), lambda i, j: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((k, tile_j), lambda i, j: (0, j),
                             memory_space=vm),
                pl.BlockSpec((tile_k, 3), lambda i, j: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((3, tile_j), lambda i, j: (0, j),
                             memory_space=vm),
                pl.BlockSpec((2 * tile_j, 16), lambda i, j: (j, 0),
                             memory_space=vm),
            ],
            out_specs=pl.BlockSpec((tile_k, 8), lambda i, j: (i, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((nk_p, 8), jnp.float32),
            compiler_params=_CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=(30 + 32) * pairs,
                bytes_accessed=(nk_p + nj_p) * 80,
                transcendentals=pairs,
            ),
            interpret=interpret,
        )(pk, pjt, g_k, g_j.T, q)

    if not square or coincident == "masked":
        rows = run("all")
    elif coincident == "fast":
        rows = run("overlap")
    else:
        rows = jax.lax.cond(dup, lambda: run("all"),
                            lambda: run("overlap"))

    sg = rows[:, 0:4]
    sp = rows[:, 4:8]
    pos_bar = (mk[:, None] * sg[:, 0:3] - g_k * sg[:, 3:4]
               + sp[:, 0:3] - pos_k * sp[:, 3:4])
    return pos_bar[:nk]
