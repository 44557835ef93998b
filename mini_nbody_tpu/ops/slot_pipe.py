"""Slot-list symmetric-MXU traversal: exact slot lists + folded diagonal
blocks (geometry), with the one-slot software pipeline measured and
REJECTED.

Round-4's slot decomposition (benchmarks/RESULTS.md) proved every streamed
shmoo row is `slots x flat ~4.4 us` and ALL N-dependence is traversal
geometry: the diagonal-band grid pays ~full price for its parity-idle
slots (nb*(nb//2+1) slots where nb(nb+1)/2 block pairs suffice — 40 vs 36
at nb=8) and each diagonal block burns T^2 evals for T(T-1)/2 pairs. This
module replaces the band with scalar-prefetched exact slot lists:

* Exact slot lists ((S, 3) int32 (kind, bi, bj) arrays,
  PrefetchScalarGridSpec) visit each block pair exactly once. Machinery
  cost measured ~free (benchmarks/probe_slotlist.py 'slotlist' variant:
  4.48 vs base 4.44 us/slot).
* Folded diagonals: two diagonal blocks (a,a), (b,b) pack into ONE full
  (T,T) eval — entry (r,c) computes pair (a_r, a_c) where c < r (strict
  lower triangle = every unordered pair within a once) and (b_r, b_c)
  where c > r (strict upper = every pair within b once); c == r is the
  self diagonal, always masked. The per-entry select costs ~6 extra VPU
  ops (two d-vectors + 3 selects) and doubles the matmuls, but each fold
  replaces TWO diag slots that each burned T^2 evals for T(T-1)/2 pairs.
  nb even folds all diagonals: a self-chunk costs exactly nb^2/2 full
  slots + fold overhead — the geometric ideal the round-4 decomposition
  said the band could not reach.

**Pipeline rejection (round 5, on-chip).** The round-5 idea of staging w
in a bf16 VMEM scratch so slot s's MXU matmuls overlap slot s+1's VPU
w-pipeline MEASURES SLOWER, not faster: 6.18 us/slot vs the direct
4.44/4.48 (probe_slotlist 'pipe' re-run; the 3.856 first recorded for
that variant did not reproduce and is superseded — see the probe
docstring). The scratch materialization costs a full (T,T) write + read
per slot (~4 MB of VMEM traffic) where the direct kernel streams w
tile-by-tile from registers into the MXU — Mosaic already overlaps at
that granularity, so the "serialized 0.837 us MXU phase" of the round-4
itemization is not recoverable by software pipelining. Kernels here
therefore compute w and consume it in the SAME grid step, exactly like
the band bodies.

Accumulation: ONE (8, C) fp32 whole-buffer accumulator per chunk
(constant-index output -> stays VMEM-resident; row sums enter through the
free exact (T,8)<->(8,T) swapaxes + 128-aligned dynamic-slice adds; the
chunk-pair kernel packs both chunks' accumulators side by side in one
(8, 2C) buffer). Row sums and reaction sums share the accumulation
identity F = sum(w * v)[:3] - p * sum(w * v)[3]
(sym_mxu_force._epilogue), so one buffer serves both sides.

Numerics: same bf16-operand/fp32-accumulate class as sym_mxu_force; the
unified accumulator changes fp32 accumulation ORDER vs the band path
(few-ulp diffs), but the masked/maskless route invariant is preserved
exactly: maskless w == masked w whenever no hot d2 == 0 pair exists, so
coincident='auto' stays bitwise identical to 'masked' within this path.

Reference anchors: traversal/control as in symmetric_force.py
(top_level.vhd FSM); the fold plays the role of the RTL's always-full
pipelines on the diagonal (compute_store.vhd:66 — the FPGA never idles
half a pass on self-tiles because its j-stream is element-granular).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams,
    fast_rsqrt_cube,
)
from mini_nbody_tpu.ops.sym_mxu_force import (
    _mm_cols,
    _mm_rows,
    _w_block,
    _w_parts,
)

SLOT_DIAG = 0
SLOT_CROSS = 1
SLOT_FOLD = 2


def tri_slot_list(nb: int, fold: bool = True):
    """Self-chunk slot list: (kind, bi, bj) rows, each block pair once.

    With fold, diagonal pairs (2k, 2k+1) fold into one slot (odd nb
    leaves the last diagonal unfolded). Cross slots run i-major so the
    pi operand block stays resident across each row (Pallas skips the
    refetch when consecutive grid steps map the same block index)."""
    rows = []
    for i in range(nb):
        if fold and i % 2 == 0 and i + 1 < nb:
            rows.append((SLOT_FOLD, i, i + 1))
        elif not fold or i % 2 == 0:
            # under fold, odd i's diagonal was covered by the slot at i-1
            # (odd nb leaves i = nb-1 even: plain diag)
            rows.append((SLOT_DIAG, i, i))
        rows.extend((SLOT_CROSS, i, j) for j in range(i + 1, nb))
    return rows


def cross_slot_list(nb: int):
    """Chunk-pair slot list: every (i, j), i-major."""
    return [(SLOT_CROSS, i, j) for i in range(nb) for j in range(nb)]


def pack_slot_idx(rows):
    """FLAT (3*S,) int32 [kind, bi, bj]*S.

    Flat, not (S, 3): SMEM lane-pads a 2-D prefetch operand's minor dim
    to 128, so (S, 3) costs S*512 B of the 1 MB SMEM — the nb=64
    self-chunk slot list (2048 rows) alone overflows it (compile error:
    "Ran out of memory in memory space smem ... prefetched SMEM operand
    u8[1048576]"). The flat layout is exact-sized: 12 B/slot."""
    return jnp.asarray(np.asarray(rows, dtype=np.int32).reshape(-1))


def n_slots_tri(nb: int, fold: bool = True) -> int:
    return len(tri_slot_list(nb, fold))


def _w_fold_block(pa, pbt, softening, fast, mask_offdiag, tile):
    """Folded two-diagonal w: (w_lo, w_hi) for blocks a (as (T,3)) and b
    (as its transposed (3,T) form — the operands the grid spec fetches).

    Entry (r, c): pair (a_r, a_c) if c < r else (b_r, b_c); c == r is
    masked (self pairs — their eps^-1.5 weight would swamp the matmul
    accumulators, sym_mxu_force module docstring). mask_offdiag extends
    the d2 == 0 mask to distinct coincident bodies, exactly like the
    masked cross body, so the auto/masked bitwise invariant holds.
    The two swapaxes below are native-transpose ~free and confined to
    fold slots (the cross/diag path takes both orientations straight
    from the operands)."""
    pat = jnp.swapaxes(pa, 0, 1)
    pb = jnp.swapaxes(pbt, 0, 1)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    lower = c_idx < r_idx
    dx = jnp.where(lower, pat[0:1, :] - pa[:, 0:1], pbt[0:1, :] - pb[:, 0:1])
    dy = jnp.where(lower, pat[1:2, :] - pa[:, 1:2], pbt[1:2, :] - pb[:, 1:2])
    dz = jnp.where(lower, pat[2:3, :] - pa[:, 2:3], pbt[2:3, :] - pb[:, 2:3])
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + jnp.asarray(softening, dx.dtype)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    zero = jnp.asarray(0.0, w.dtype)
    w = jnp.where(r_idx == c_idx, zero, w)
    if mask_offdiag:
        w = jnp.where(d2 == 0.0, zero, w)
    w_lo = jnp.where(lower, w, zero)
    return w_lo, w - w_lo


def _acc_add(acc_ref, col, tile, contrib):
    cs = pl.ds(col * tile, tile)
    acc_ref[:, cs] = acc_ref[:, cs] + contrib


def _tri_slot_kernel(idx_ref, pi_ref, pjt_ref, vi_ref, vj_ref, acc_ref, *,
                     softening, tile, fast, split_w, fold, mask_offdiag):
    """One slot per grid step: compute w and consume it immediately (the
    staged-scratch pipeline variant measured SLOWER — module docstring).
    pi/vi follow bi, pjt/vj follow bj."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kind = idx_ref[3 * s]
    bi = idx_ref[3 * s + 1]
    bj = idx_ref[3 * s + 2]

    @pl.when(kind == SLOT_DIAG)
    def _diag():  # rows cover both pair orders on a diagonal block
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                              mask=True), split_w)
        _acc_add(acc_ref, bi, tile,
                 jnp.swapaxes(_mm_rows(w, vj_ref[:]), 0, 1))

    @pl.when(kind == SLOT_CROSS)
    def _cross():
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                              mask=mask_offdiag), split_w)
        _acc_add(acc_ref, bi, tile,
                 jnp.swapaxes(_mm_rows(w, vj_ref[:]), 0, 1))
        _acc_add(acc_ref, bj, tile, _mm_cols(vi_ref[:], w))

    if fold:
        @pl.when(kind == SLOT_FOLD)
        def _fold():
            w_lo, w_hi = _w_fold_block(pi_ref[:], pjt_ref[:], softening,
                                       fast, mask_offdiag, tile)
            lo = _w_parts(w_lo, split_w)
            hi = _w_parts(w_hi, split_w)
            _acc_add(acc_ref, bi, tile,
                     jnp.swapaxes(_mm_rows(lo, vi_ref[:]), 0, 1)
                     + _mm_cols(vi_ref[:], lo))
            _acc_add(acc_ref, bj, tile,
                     jnp.swapaxes(_mm_rows(hi, vj_ref[:]), 0, 1)
                     + _mm_cols(vj_ref[:], hi))


def _cross_pair_kernel(idx_ref, pi_ref, pjt_ref, vi_ref, vj_ref, acc_ref,
                       *, softening, tile, fast, split_w, mask, nb):
    """Chunk-pair (a != b) slot step: rows accumulate into the first half
    of the packed (8, 2C) buffer (chunk a), reactions into the second."""
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                          mask=mask), split_w)
    _acc_add(acc_ref, idx_ref[3 * s + 1], tile,
             jnp.swapaxes(_mm_rows(w, vj_ref[:]), 0, 1))
    _acc_add(acc_ref, nb + idx_ref[3 * s + 2], tile,
             _mm_cols(vi_ref[:], w))


def _common_params(pairs, io_bytes):
    return dict(
        compiler_params=_CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=49 * pairs, bytes_accessed=io_bytes,
            transcendentals=pairs),
    )


def _grid_spec(tile, nslots, acc_cols):
    vm = pltpu.VMEM
    bmap = lambda col: (lambda s, idx: (idx[3 * s + col], 0))
    bmapT = lambda col: (lambda s, idx: (0, idx[3 * s + col]))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nslots,),
        in_specs=[
            pl.BlockSpec((tile, 3), bmap(1), memory_space=vm),    # bi pos
            pl.BlockSpec((3, tile), bmapT(2), memory_space=vm),   # bj pos^T
            pl.BlockSpec((tile, 8), bmap(1), memory_space=vm),    # bi v
            pl.BlockSpec((tile, 8), bmap(2), memory_space=vm),    # bj v
        ],
        out_specs=pl.BlockSpec((8, acc_cols), lambda s, idx: (0, 0),
                               memory_space=vm),
        scratch_shapes=(),
    )


def build_tri_slot_call(softening, tile, c, interpret, split_w=False,
                        mask_offdiag=True, fold=True):
    """Self-chunk slot call: (pos (c,3), pos^T (3,c), v (c,8)) -> acc
    (8, c) raw force sums (unified rows + reactions)."""
    nb = c // tile
    fold = fold and nb > 1
    rows = tri_slot_list(nb, fold)
    idx = pack_slot_idx(rows)
    kern = functools.partial(
        _tri_slot_kernel, softening=float(softening), tile=tile,
        fast=fast_rsqrt_cube(softening), split_w=split_w, fold=fold,
        mask_offdiag=mask_offdiag)
    pairs = nb * (nb + 1) // 2 * tile * tile
    call = pl.pallas_call(
        kern,
        grid_spec=_grid_spec(tile, len(rows), c),
        out_shape=jax.ShapeDtypeStruct((8, c), jnp.float32),
        interpret=interpret,
        **_common_params(pairs, c * 96),
    )
    return lambda pos, post, v: call(idx, pos, post, v, v)


def build_cross_slot_call(softening, tile, c, interpret, split_w=False,
                          mask=True):
    """Chunk-pair slot call: (pos_a, pos_b^T, v_a, v_b) ->
    (acc_a (8, c), acc_b (8, c)) raw sums, computed through one packed
    (8, 2c) whole-buffer accumulator."""
    nb = c // tile
    rows = cross_slot_list(nb)
    idx = pack_slot_idx(rows)
    kern = functools.partial(
        _cross_pair_kernel, softening=float(softening), tile=tile,
        fast=fast_rsqrt_cube(softening), split_w=split_w, mask=mask, nb=nb)
    call = pl.pallas_call(
        kern,
        grid_spec=_grid_spec(tile, len(rows), 2 * c),
        out_shape=jax.ShapeDtypeStruct((8, 2 * c), jnp.float32),
        interpret=interpret,
        **_common_params(nb * nb * tile * tile, c * 96),
    )

    def run(pa, pbt, va, vb):
        acc = call(idx, pa, pbt, va, vb)
        return acc[:, :c], acc[:, c:]

    return run


def _tri_slot_ensemble_kernel(idx_ref, pi_ref, pjt_ref, vi_ref, vj_ref,
                              acc_ref, *, softening, tile, fast, split_w,
                              fold, mask_offdiag, nb):
    """_tri_slot_kernel under a leading system axis: grid (B, S); system
    sy owns block columns sy*nb .. sy*nb+nb-1 of the stacked (8, B*C)
    accumulator. Slot indices are system-local; operands arrive through
    the index maps already offset, so only the accumulator columns need
    the base shift here."""
    sy = pl.program_id(0)
    s = pl.program_id(1)
    base = sy * nb

    @pl.when(jnp.logical_and(sy == 0, s == 0))
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kind = idx_ref[3 * s]
    bi = base + idx_ref[3 * s + 1]
    bj = base + idx_ref[3 * s + 2]

    @pl.when(kind == SLOT_DIAG)
    def _diag():
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                              mask=True), split_w)
        _acc_add(acc_ref, bi, tile,
                 jnp.swapaxes(_mm_rows(w, vj_ref[:]), 0, 1))

    @pl.when(kind == SLOT_CROSS)
    def _cross():
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                              mask=mask_offdiag), split_w)
        _acc_add(acc_ref, bi, tile,
                 jnp.swapaxes(_mm_rows(w, vj_ref[:]), 0, 1))
        _acc_add(acc_ref, bj, tile, _mm_cols(vi_ref[:], w))

    if fold:
        @pl.when(kind == SLOT_FOLD)
        def _fold():
            w_lo, w_hi = _w_fold_block(pi_ref[:], pjt_ref[:], softening,
                                       fast, mask_offdiag, tile)
            lo = _w_parts(w_lo, split_w)
            hi = _w_parts(w_hi, split_w)
            _acc_add(acc_ref, bi, tile,
                     jnp.swapaxes(_mm_rows(lo, vi_ref[:]), 0, 1)
                     + _mm_cols(vi_ref[:], lo))
            _acc_add(acc_ref, bj, tile,
                     jnp.swapaxes(_mm_rows(hi, vj_ref[:]), 0, 1)
                     + _mm_cols(vj_ref[:], hi))


def build_tri_slot_ensemble(softening, tile, c, b, interpret, split_w=False,
                            mask_offdiag=True, fold=True):
    """B-system slot call: (pos (B*c,3), pos^T (3,B*c), v (B*c,8)) -> acc
    (8, B*c). Each system runs the SAME slot list over its own nb blocks —
    per-system results are bitwise identical to the single-system
    build_tri_slot_call at the same (tile, c) (same slots, same order)."""
    nb = c // tile
    fold = fold and nb > 1
    rows = tri_slot_list(nb, fold)
    idx = pack_slot_idx(rows)
    nslots = len(rows)
    vm = pltpu.VMEM
    bmap = lambda col: (lambda sy, s, idx: (sy * nb + idx[3 * s + col], 0))
    bmapT = lambda col: (lambda sy, s, idx: (0, sy * nb + idx[3 * s + col]))
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nslots),
        in_specs=[
            pl.BlockSpec((tile, 3), bmap(1), memory_space=vm),
            pl.BlockSpec((3, tile), bmapT(2), memory_space=vm),
            pl.BlockSpec((tile, 8), bmap(1), memory_space=vm),
            pl.BlockSpec((tile, 8), bmap(2), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((8, b * c), lambda sy, s, idx: (0, 0),
                               memory_space=vm),
        scratch_shapes=(),
    )
    kern = functools.partial(
        _tri_slot_ensemble_kernel, softening=float(softening), tile=tile,
        fast=fast_rsqrt_cube(softening), split_w=split_w, fold=fold,
        mask_offdiag=mask_offdiag, nb=nb)
    pairs = b * nb * (nb + 1) // 2 * tile * tile
    call = pl.pallas_call(
        kern,
        grid_spec=spec,
        out_shape=jax.ShapeDtypeStruct((8, b * c), jnp.float32),
        interpret=interpret,
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=49 * pairs, bytes_accessed=b * c * 96,
            transcendentals=pairs),
    )
    return lambda pos, post, v: call(idx, pos, post, v, v)
