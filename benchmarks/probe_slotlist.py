"""Probe: slot-list traversal + VPU/MXU overlap candidates (round 5).

Two round-4 findings motivate this probe (RESULTS.md "Slot decomposition"):
(a) every streamed shmoo row is `slots x flat 4.18-4.41 us`, and ALL
N-dependence is traversal geometry — band-parity idle slots cost ~full
price and diagonal blocks deliver half their evals; (b) the slot itemizes
as 3.558 us VPU w-pipeline + 0.837 us MXU matmuls SERIALIZED after it.

Variants, all computing the identical nb x nb all-cross work at N=c:

* base        — the production `_build_calls` cross kernel (4.41 us/slot).
* slotlist    — same work driven by a scalar-prefetched (nslots, 4) index
                array (PrefetchScalarGridSpec) with ONE unified (8, c)
                whole-buffer accumulator (rows transposed in via the free
                (T,8)<->(8,T) swap + dynamic-slice add, reactions as
                before). This is the mechanism that lets round 5 schedule
                ARBITRARY slot lists (parity-free traversals, semi-diagonal
                folds) — the probe prices the machinery.
* pipe        — slotlist + one-slot software pipeline: w is cast to bf16
                (EXACTLY what MXU DEFAULT does to its operands anyway) into
                a VMEM scratch; slot s issues slot s-1's row+reaction
                matmuls (operand refs lag one slot via the prefetched
                index columns 2:4) before computing slot s's w, so the VPU
                w-pipeline and the MXU matmuls of adjacent slots can
                overlap. Grid is nslots+1 (drain iteration).
* inter2/4    — intra-slot interleave: split the i-tile into K row chunks;
                program order w_0, mm_0, w_1, mm_1 ... gives Mosaic
                independent VPU/MXU work to overlap WITHOUT scratch or
                index shifts (keeps the production accumulator layout).

MEASURED (r5, v5e, N=c=32768, 448 reps/sync ~2s device work, us/slot):
  base 4.450 / slotlist 4.475 / pipe 3.856 / inter2 4.451 / inter4 4.509
  -> the one-slot software PIPELINE is real: -0.59 us/slot (-13.4%), i.e.
  ~70% of the 0.837 us serialized-MXU budget overlapped; intra-slot
  interleaving does nothing (Mosaic does not reorder across the chunk
  sequence), and the slot-list machinery itself is ~free (+0.03 us).
  Value check: slotlist/pipe vs base rows.T+colsT max rel err 1.5e-7
  (accumulation-order ulps only; pipe's explicit bf16 cast of w is
  bitwise-identical to what DEFAULT matmul does internally).
"""

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.ops.sym_mxu_force import (
    _build_calls, _pack, _w_block, _mm_rows, _mm_cols)
from mini_nbody_tpu.ops.pallas_compat import (
    CompilerParams as _CompilerParams, fast_rsqrt_cube)
from mini_nbody_tpu.utils.config import SOFTENING
from mini_nbody_tpu.utils.harness import time_fn

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
T = 1024
NB = N // T
NSLOTS = NB * NB
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else max(
    2, int(2.0 / (NSLOTS * 4.4e-6)))
INTERPRET = jax.default_backend() != "tpu"


def _slot_idx(pipelined):
    """(nslots[+1], 4) int32: (i, j, prev_i, prev_j), i-major j-minor."""
    ij = np.stack(np.meshgrid(np.arange(NB), np.arange(NB), indexing="ij"),
                  axis=-1).reshape(-1, 2)
    prev = np.concatenate([ij[:1], ij[:-1]], axis=0)  # row 0's prev unused
    idx = np.concatenate([ij, prev], axis=1).astype(np.int32)
    if pipelined:  # drain row: cur unused, prev = last real slot
        idx = np.concatenate(
            [idx, [[0, 0, ij[-1, 0], ij[-1, 1]]]], axis=0).astype(np.int32)
    return jnp.asarray(idx)


def _slot_kernel(idx_ref, pi_ref, pjt_ref, vi_ref, vj_ref, acc_ref, *,
                 softening, fast, tile):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _w_block(pi_ref[:], pjt_ref[:], softening, fast, mask=False)
    s_r = _mm_rows((w,), vj_ref[:])            # (T, 8)
    s_c = _mm_cols(vi_ref[:], (w,))            # (8, T)
    ci = pl.ds(idx_ref[s, 0] * tile, tile)
    cj = pl.ds(idx_ref[s, 1] * tile, tile)
    acc_ref[:, ci] = acc_ref[:, ci] + jnp.swapaxes(s_r, 0, 1)
    acc_ref[:, cj] = acc_ref[:, cj] + s_c


def _pipe_kernel(idx_ref, pi_ref, pjt_ref, vi_ref, vj_ref, acc_ref, w_ref, *,
                 softening, fast, tile, nslots):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(s > 0)
    def _mm_prev():
        w = w_ref[:]                            # bf16 (T, T): slot s-1's w
        s_r = _mm_rows((w,), vi_ref[:] * 0.0 + vj_ref[:] * 1.0
                       if False else vj_ref[:])
        s_c = _mm_cols(vi_ref[:], (w,))
        ci = pl.ds(idx_ref[s, 2] * tile, tile)
        cj = pl.ds(idx_ref[s, 3] * tile, tile)
        acc_ref[:, ci] = acc_ref[:, ci] + jnp.swapaxes(s_r, 0, 1)
        acc_ref[:, cj] = acc_ref[:, cj] + s_c

    @pl.when(s < nslots)
    def _w_cur():
        w_ref[:] = _w_block(pi_ref[:], pjt_ref[:], softening, fast,
                            mask=False).astype(jnp.bfloat16)


def _inter_kernel(pi_ref, pjt_ref, vi_ref, vj_ref, rows_ref, colsT_ref, *,
                  softening, tile, fast, chunks):
    """Production cross body, i-tile split into `chunks` row chunks with
    interleaved w / matmul program order."""
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, j == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    tc = tile // chunks
    s_c_parts = []
    for k in range(chunks):
        r = slice(k * tc, (k + 1) * tc)
        w = _w_block(pi_ref[r, :], pjt_ref[:], softening, fast, mask=False)
        s_r = _mm_rows((w,), vj_ref[:])        # (tc, 8)

        @pl.when(j == 0)
        def _init(s_r=s_r, r=r):
            rows_ref[r, :] = s_r

        @pl.when(j > 0)
        def _acc(s_r=s_r, r=r):
            rows_ref[r, :] = rows_ref[r, :] + s_r

        s_c_parts.append(_mm_cols(vi_ref[r, :], (w,)))
    cj = pl.ds(j * tile, tile)
    colsT_ref[:, cj] = colsT_ref[:, cj] + sum(s_c_parts)


def _build_slot_call(pipelined):
    fast = fast_rsqrt_cube(SOFTENING)
    vm = pltpu.VMEM
    nslots = NSLOTS
    grid = (nslots + 1,) if pipelined else (nslots,)
    # cur-slot maps clamp at the drain row (idx there is a dummy 0);
    # prev-slot maps read columns 2:4.
    cur = lambda col: (lambda s, idx: (idx[s, col], 0))
    curT = lambda col: (lambda s, idx: (0, idx[s, col]))
    prv = lambda col: (lambda s, idx: (idx[s, col], 0))
    if pipelined:
        kern = functools.partial(_pipe_kernel, softening=float(SOFTENING),
                                 fast=fast, tile=T, nslots=nslots)
        scratch = [pltpu.VMEM((T, T), jnp.bfloat16)]
        vmaps = (prv(2), prv(3))
    else:
        kern = functools.partial(_slot_kernel, softening=float(SOFTENING),
                                 fast=fast, tile=T)
        scratch = []
        vmaps = (cur(0), cur(1))
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, 3), cur(0), memory_space=vm),
                pl.BlockSpec((3, T), curT(1), memory_space=vm),
                pl.BlockSpec((T, 8), vmaps[0], memory_space=vm),
                pl.BlockSpec((T, 8), vmaps[1], memory_space=vm),
            ],
            out_specs=pl.BlockSpec((8, N), lambda s, idx: (0, 0),
                                   memory_space=vm),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        interpret=INTERPRET,
        compiler_params=_CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=49 * nslots * T * T, bytes_accessed=N * 96,
            transcendentals=nslots * T * T),
    )


def _build_inter_call(chunks):
    fast = fast_rsqrt_cube(SOFTENING)
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_inter_kernel, softening=float(SOFTENING), tile=T,
                          fast=fast, chunks=chunks),
        grid=(NB, NB),
        in_specs=[
            pl.BlockSpec((T, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, T), lambda i, j: (0, j), memory_space=vm),
            pl.BlockSpec((T, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((T, 8), lambda i, j: (j, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((T, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((8, N), lambda i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, N), jnp.float32),
        ],
        interpret=INTERPRET,
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=49 * NSLOTS * T * T, bytes_accessed=N * 96,
            transcendentals=NSLOTS * T * T),
    )


def main():
    from mini_nbody_tpu.models import init

    print(json.dumps({"backend": jax.default_backend(), "n": N, "tile": T,
                      "reps": REPS, "nslots": NSLOTS}))
    s = init.plummer(jax.random.key(7), 2 * N)
    pa, _, va = _pack(s.pos[:N], None, N, N)
    _, pbt, vb = _pack(s.pos[N:], None, N, N)

    _, cross_call = _build_calls(SOFTENING, T, N, interpret=INTERPRET,
                                 split_w=False, mask_offdiag=False)
    inter_calls = {k: _build_inter_call(k) for k in (2, 4)}
    slot_call = _build_slot_call(pipelined=False)
    pipe_call = _build_slot_call(pipelined=True)
    idx_p = _slot_idx(pipelined=True)
    idx_s = _slot_idx(pipelined=False)

    # --- value check (single call each) -------------------------------
    rows0, colsT0 = jax.jit(cross_call)(pa, pbt, va, vb)
    ref = np.asarray(rows0.T + colsT0)
    scale = np.abs(ref).max()
    for name, fn in (
            ("slotlist", lambda: jax.jit(slot_call)(idx_s, pa, pbt, va, vb)),
            ("pipe", lambda: jax.jit(pipe_call)(idx_p, pa, pbt, va, vb))):
        err = np.abs(np.asarray(fn()) - ref).max() / scale
        print(json.dumps({"check": name, "max_rel_err": float(err)}))
    ri, ci = jax.jit(inter_calls[2])(pa, pbt, va, vb)
    err = np.abs(np.asarray(ri.T + ci) - ref).max() / scale
    print(json.dumps({"check": "inter2", "max_rel_err": float(err)}))

    # --- timing -------------------------------------------------------
    def timed(make_step):
        @jax.jit
        def multi(p):
            def body(c, _):
                out = make_step(c)
                return c + 0.0 * out[0, :3].reshape(1, 3), None

            c2, _ = jax.lax.scan(body, p, None, length=REPS)
            return c2

        return time_fn(multi, pa)

    results = {}
    results["base"] = timed(
        lambda c: cross_call(c, pbt, va, vb)[1])
    results["slotlist"] = timed(lambda c: slot_call(idx_s, c, pbt, va, vb))
    results["pipe"] = timed(lambda c: pipe_call(idx_p, c, pbt, va, vb))
    for k, call in inter_calls.items():
        results[f"inter{k}"] = timed(lambda c, call=call: call(
            c, pbt, va, vb)[1])
    for name, dt in results.items():
        print(json.dumps({
            "variant": name,
            "us_slot": round(dt * 1e6 / (REPS * NSLOTS), 3),
            "g_inter_s": round(2.0 * REPS * N * N / dt / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
