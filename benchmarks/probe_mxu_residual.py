"""Probe: where does the sym_mxu non-VPU residual go? (MXU matmuls vs grid)

At N=65536 the maskless sym_mxu pass sustains ~487 G interactions/s against
the 588 G/s pure-VPU w-mix ceiling (benchmarks/probe_vpu_peak.py w_mix at
full ILP) — a ~17% residual the roofline model attributes to the MXU
row/reaction matmuls, HBM j-streaming and grid slot overhead without
separating them. This ablation times the CROSS kernel body (the hot
off-diagonal path: every slot runs w + rows-matmul + cols-matmul, no
band/parity logic) in three variants on one (32768 x 32768) chunk pair at
tile=1024 (grid 32x32, 1.07e9 ordered pairs/call):

  full      w + rows matmul + cols matmul     (production body)
  rows_only w + rows matmul                   (cols matmul ablated)
  no_mm     w consumed by a jnp.sum(axis=1)   (both matmuls ablated; the
            reduction costs ~1 VPU op/pair, so no_mm slightly OVERSTATES
            the matmul-free rate's denominator — good enough to bound)

(full - rows_only) = the reaction matmul + its colsT dynamic-slice store;
(rows_only - no_mm) ~= the row matmul minus one reduction op. If the
matmuls are serialized after the VPU w-block (Mosaic does not overlap
VPU/MXU across the block boundary), the deltas land near the padded-matmul
estimate; if they vanish, the residual is grid/DMA and the matmuls ride
free. Run on-chip: python benchmarks/probe_mxu_residual.py

MEASURED (r4, v5e, R=512 — 2.3 s device work per sync): full 4.394
us/slot (477.2 G 2-per-eval inter/s — reproduces the N=1M headline),
rows_only 3.892, no_mm 4.524. Itemization vs the 3.558 us pure-VPU
floor: rows matmul +0.334, reaction matmul + dynamic-slice store
+0.503; ablating the rows matmul to a jnp.sum VPU reduction COSTS
0.632 us/slot — the MXU row-sum is cheaper than any VPU reduction.
Store-layout ablation (variants cols_static / cols_sub): full 4.397,
static-slice store 4.396, sublane-sliced (nb*8,T) accumulator 4.398 —
the dynamic lane-offset store is FREE; the whole 0.503 is the reaction
matmul itself. No store-layout or loop-order lever exists.
Full writeup: benchmarks/RESULTS.md "Slot decomposition".
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.ops.sym_mxu_force import (
    _common_params, _mm_cols, _mm_rows, _pack, _w_block,
)
from mini_nbody_tpu.utils.config import SOFTENING
from mini_nbody_tpu.utils.harness import time_fn

N = 32768
T = 1024
# Leading repeat axis: ONE dispatch runs R full (N x N) passes so the
# tunnel's ~28-33 ms fixed dispatch+sync overhead amortizes below ~1.5%
# (first run timed single passes: every variant read ~27.5 ms/call where
# compute is ~4.4 ms — the deltas were pure sync noise, rows_mm came out
# NEGATIVE; the R=24 rerun still carried ~25% sync share, inflating every
# ABSOLUTE slot time by ~1.1 us while the deltas, being differences of
# equally-inflated calls, were already correct). R*4.4 ms ~= 2.3 s of
# device work per sync at R=512 (6e11 pairs — inside the 4e12 crash bound).
R = 512


def _kernel(pi_ref, pjt_ref, vi_ref, vj_ref, rows_ref, colsT_ref, *,
            variant):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    w = _w_block(pi_ref[:], pjt_ref[:], SOFTENING, True, mask=False)
    if variant == "no_mm":
        s_r = jnp.sum(w, axis=1, keepdims=True) + jnp.zeros((1, 8), w.dtype)
    else:
        s_r = _mm_rows((w,), vj_ref[:])

    @pl.when(j == 0)
    def _init():
        rows_ref[:] = s_r

    @pl.when(j > 0)
    def _acc():
        rows_ref[:] = rows_ref[:] + s_r

    if variant == "full":
        s_c = _mm_cols(vi_ref[:], (w,))
        cj = pl.ds(j * T, T)
        colsT_ref[:, cj] = colsT_ref[:, cj] + s_c
    elif variant == "cols_static":
        # Reaction matmul kept, dynamic lane-offset store ablated: results
        # are WRONG (all j accumulate into lanes 0:T) — isolates the
        # pl.ds(j*T) store cost from the matmul cost.
        s_c = _mm_cols(vi_ref[:], (w,))
        colsT_ref[:, 0:T] = colsT_ref[:, 0:T] + s_c
    elif variant == "cols_sub":
        # Reaction accumulator laid out (nb*8, T): the per-slot dynamic
        # offset rides SUBLANES (major dim) instead of lanes. Correct
        # results up to a host-side (nb,8,T)->(8,nb*T) reshape.
        s_c = _mm_cols(vi_ref[:], (w,))
        rj = pl.ds(j * 8, 8)
        colsT_ref[rj, :] = colsT_ref[rj, :] + s_c


def build(variant):
    vm = pltpu.VMEM
    nb = N // T
    cols_shape = (nb * 8, T) if variant == "cols_sub" else (8, N)
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(R, nb, nb),
        in_specs=[
            pl.BlockSpec((T, 3), lambda r, i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, T), lambda r, i, j: (0, j), memory_space=vm),
            pl.BlockSpec((T, 8), lambda r, i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((T, 8), lambda r, i, j: (j, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((T, 8), lambda r, i, j: (i, 0), memory_space=vm),
            pl.BlockSpec(cols_shape, lambda r, i, j: (0, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
            jax.ShapeDtypeStruct(cols_shape, jnp.float32),
        ],
        **_common_params(R * N * N, R * N * 96, ndims=3),
    )


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(), "n": N, "tile": T}))
    from mini_nbody_tpu.models import init

    s = init.plummer(jax.random.key(7), 2 * N)
    pa, _, va = _pack(s.pos[:N], None, N, N)
    pb, pbt, vb = _pack(s.pos[N:], None, N, N)
    pairs = float(N) * N * R
    slots = R * (N // T) ** 2
    rows = {}
    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ("full", "rows_only", "no_mm"))
    for variant in variants:
        call = jax.jit(build(variant))
        dt = time_fn(lambda c=call: c(pa, pbt, va, vb))
        rows[variant] = dt
        print(json.dumps({
            "variant": variant, "us_call": round(dt * 1e6, 1),
            "us_slot": round(dt * 1e6 / slots, 3),
            "g_inter_s": round(2 * pairs / dt / 1e9, 1),
        }), flush=True)
    if {"full", "rows_only", "no_mm"} <= rows.keys():
        print(json.dumps({
            "cols_mm_us_slot": round(
                (rows["full"] - rows["rows_only"]) * 1e6 / slots, 3),
            "rows_mm_us_slot": round(
                (rows["rows_only"] - rows["no_mm"]) * 1e6 / slots, 3),
        }))
