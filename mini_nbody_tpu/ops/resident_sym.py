"""Multi-step fused symmetric resident kernel: the whole trajectory runs in
ONE Pallas launch with the full body state resident in VMEM — in BOTH
precision classes (fp32-exact VPU and bf16-accumulate MXU hybrid) and for
BOTH integrators (leapfrog rides the same kernel, see below).

Why a second resident kernel (vs ops/resident.py):

* **Sublane-major block state.** The original stores state as wide (N, 8)
  rows: VMEM lane-pads the minor dim to 128, costing 512 B/body and capping
  the resident regime at N<=8192. Here state lives as (8*nb, tile) — block
  b's 8 state rows [x y z vx vy vz m pad] at sublanes 8b..8b+7, bodies
  along lanes — 32 B/body exactly, and every per-block access is a dynamic
  SUBLANE slice (the cheap direction; dynamic lane offsets cost lane
  rotations). The cap rises to 131,072: 4x the reference FPGA's whole
  envelope (N<=32,767 via its RAM depth, ``src/top_level.vhd:45-46``),
  whose pitch was precisely low fixed overhead per pass (SURVEY §6).
* **Symmetric traversal.** The original computes every ordered pair (~23
  VPU ops each); this kernel walks the diagonal-band schedule of
  ops/symmetric_force.py (each unordered pair ONCE, rows + reactions),
  halving VPU work — and in mxu mode moves all products/reductions onto
  the matrix unit exactly like ops/sym_mxu_force.py (w once per pair on
  the VPU, row sums and reaction sums as (8,T)x(T,T) matmuls with the
  compensated bf16 [hi|lo] operand split).
* **Single-buffer state, no parity.** Integration runs in dedicated grid
  slots AFTER every force band of the step (grid is lexicographic under
  "arbitrary" semantics), so in-place integrate writes can never be read
  by the same step's force blocks — no double buffer, no duplicated
  even/odd kernel body, and the initial state enters by input/output
  aliasing (no copy). The in-VMEM analog of the reference keeping state
  in shared RAM across passes (``src/top_level.vhd:180-186``), with the
  host's per-pass polling round-trip gone entirely.
* **Transposed accumulators, native transposes.** Row sums and reaction
  sums land in (8*nb, tile) whole-buffer VMEM scratch (constant-index
  accumulation — the only revisit-safe pattern besides consecutive
  same-block writes; CLAUDE.md), so every integrate-phase op is row-wise.
  The only transposes anywhere — the i-tile column operands (one per
  i-tile per step) and the VPU row-sum pack (one per block) — use
  ``jnp.swapaxes``, which Mosaic lowers natively, exactly and ~free. (An
  MXU-identity transpose at Precision.HIGHEST costs ~17 us a call —
  measured — and an early draft spent most of its small-N step time
  there.)

Grid: ``(steps, nb + n_int, nd)`` with nd = nb//2 + 1 diagonal bands. For
i < nb the slot computes force block (i, (i+d) mod nb); the trailing n_int
i-slots integrate the nb state blocks (Euler, fused in-kernel).

Measured regime (v5e, round-3b bias-free harness — us/step, resident vs
streamed): mxu mode N=512: 2.11 vs 2.82 (+34%); 1024: 5.14 vs 5.81;
2048: 15.60 vs 16.44; 4096: 51.31 vs 51.08 (tie); 8192: 183.8 vs 180.8
— streamed wins from 8192 up. fp32 mode N=512: 3.03 vs 3.21; 1024: 8.74
vs 7.07 — streamed from 1024. (All round-2/3a small-N comparisons
carried ~8 us/step of harness sync bias on both sides —
utils/harness.auto_inner.) The round-3b slot-ablation probe
(benchmarks/probe_resident_floor.py) overturned the round-2 "per-band
iteration floor" story: grid slots cost only ~0.03-0.08 us each (144
ablated slots at N=8192 ran in 5.5-12.8 us/step); what actually bounds
mid-N resident throughput is the force BODY's per-pair efficiency, which
rises steeply with tile ((T,T) vector-op amortization: mxu 512 -> 1024
measured 330 -> 405 G/s at N=65536). The old "~0.55-2.2 us/slot floor"
was the since-removed identity-transpose scratch work, not Mosaic
overhead. With the (tile, 8) pw scratch, tile=1024 mxu is VMEM-
admissible to N=114688 (407.9 G/s measured; nb=128 exceeds VMEM) — the
resident mxu path now runs 327.0 / 365.1 / 387.8 / 403.4 / 380.7 G/s at
N=4k / 8k / 16k / 65k / 131k, within 4% of streamed from 8k (vs ~60%
of streamed at the old tile=512 cap). The fp32 body originally kept 4
(T,T) temporaries live (w + three weighted displacements), capping its
tile at 768 (245.6 G/s at N=65536); the round-4 displacement-recompute
diet (recompute dz from the state blocks instead of keeping it live)
cut that to 3, admitting tile=1024 to N=57344 (321.7 G/s), 896 to
N=100352 (319.1) and 768 to the full N cap (285.9 at N=130560) —
still streamed from N=1024 up in auto routing. Both the round-2
resident kernel's "3.9x at N=4096" headline and the ">=500 us streamed
launch overhead" it was measured against were artifacts of the old
un-amortized harness (utils/harness.auto_inner). sim.simulate
auto-routes N <= 512 (fp32) / 4096 (mxu).

Leapfrog needs NO second kernel: KDK with the two half-kicks merged is the
Euler update on staggered velocities — v_{k+1/2} = v_{k-1/2} + dt*a(x_k),
x_{k+1} = x_k + dt*v_{k+1/2}. ``simulate_resident_sym_leapfrog`` offsets
v by +dt/2*a0 and pre-drifts x with one streamed force pass, runs this
kernel for steps-1, and closes with the matching +dt/2 half-kick (one more
streamed pass): steps+1 force evaluations total, identical to the streamed
leapfrog loop, equal up to fp32 reassociation of the merged kicks.
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
    fast_rsqrt_cube,
)

#: VMEM bound: one (8, N)-equivalent state buffer + two accumulators at
#: 32 B/body each, plus tile temporaries (module docstring).
RESIDENT_SYM_MAX_N = 131072


#: VMEM admission: max padded block count nb = round_up(n, T)/T per tile,
#: per mode (benchmarks/probe_resident_tiles.py, v5e). The binding budget
#: is the sublane-major state/accumulator buffers (~84 B/body empirical)
#: plus the (T,T) pair temporaries — ~1.5 live for mxu (w + matmul
#: staging), 3 for the VPU path after the round-4 displacement-recompute
#: diet (w + two live weighted displacements; the third is recomputed).
#: Entries marked (v) are compile-verified on chip; the rest interpolate
#: the linear VMEM model and stay conservative.
_MAX_NB = {
    True: {1024: 112, 896: 136, 768: 171, 640: 205, 512: 256,
           384: 342, 256: 512, 128: 1024},
    # (v): 1024 ok at nb=112 / fails nb=128; 896 ok at nb=134
    #      (395.3 G/s at n=120000); 768 ok at nb=171 (the N cap);
    #      512 ok at nb=256 (the N cap); r5 probe_admission_r5: 640/205,
    #      384/342, 256/512, 128/1024 ALL compile-verified, both mass
    #      modes — every auto_tile-selectable entry is now (v)
    False: {1024: 56, 896: 112, 768: 170, 640: 205, 512: 256,
            384: 342, 256: 512, 128: 1024},
    # Post-diet round-4 probe, all (v): 1024 ok at nb=56 (321.7 G/s at
    # n=57344) / fails nb=64 — pre-diet it failed at ANY nb; 896 ok at
    # nb=112 (319.1 at n=100352) / fails nb=120; 768 ok at nb=170
    # (285.9 at n=130560; was 245.6 capped at nb=86 pre-diet) but pads
    # one block over at the exact 131072 N cap; 640 ok at nb=205
    # (240.9 at n=131072 vs 218.5 for 512 — the N-cap tile); 512 nb=256
    # carried over from the pre-diet probe (the diet only loosens).
}

#: fp32 MASS mode schedules ~1 more live (T,T) than the unit-mass body
#: (Mosaic keeps t AND t*mj live across the two reductions — 17.3 MB
#: scoped at T=1024, ANY nb: inadmissible; found by an on-chip verify
#: drive after the unit-mass-only probe unlocked 1024), so it gets its
#: own probed table. mxu mass admission matches unit-mass (masses fold
#: into the matmul operand pack — verified at the 1024/nb=112 cap,
#: 406.5 G/s with mass). (v): 896 ok nb=48 (252.6 G/s at n=43008) /
#: fails 56; 768 ok nb=128 (222.6 at n=98304) / fails 144; 640 ok
#: nb=205 (214.3 at n=131072, the N cap); 512 carried from unit-mass.
_MAX_NB_FP32_MASS = {
    896: 48, 768: 128, 640: 205, 512: 256,
    384: 342, 256: 512, 128: 1024,
    # r5 probe_admission_r5: 384/342, 256/512, 128/1024 compile-verified
    # in fp32 mass mode (the mode that broke the interpolation in r4) —
    # all reachable entries (v)
}

#: Measured large-N GInteractions/s per (mode, tile) on v5e (same probe);
#: small tiles extrapolated. Only relative magnitudes matter: auto_tile
#: scores candidates by padded-pair-work / rate.
_TILE_RATE = {
    True: {1024: 405.0, 896: 392.0, 768: 381.0, 640: 355.0, 512: 330.0,
           384: 280.0, 256: 210.0, 128: 110.0},
    False: {1024: 322.0, 896: 319.0, 768: 286.0, 640: 241.0, 512: 196.0,
            384: 165.0, 256: 130.0, 128: 70.0},
    # fp32 1024/896/768/640 re-measured post-diet (round-4 probe, large
    # N); smaller tiles keep the pre-diet figures (ordering-only use).
}


def _admission(mxu: bool, masses: bool) -> dict:
    """The probed VMEM admission table for a (precision, mass) class."""
    if not mxu and masses:
        return _MAX_NB_FP32_MASS
    return _MAX_NB[mxu]


def auto_tile(n: int, mxu: bool, masses: bool = False) -> int:
    """Estimated-fastest VMEM-admissible tile.

    Body per-pair efficiency RISES with tile (the (T,T) vector ops
    amortize better: mxu 512 -> 1024 measured 330 -> 405 G/s at N=65536;
    grid-slot overhead itself is negligible — ~0.03-0.08 us/slot, probed
    with ablated bodies, benchmarks/probe_resident_floor.py), so bigger
    tiles win unless tail padding inflates the pair work (768 at n=1024
    would pad to 1536 — 2.25x the pairs of tile 512) or the (T,T)
    temporaries exceed VMEM (_MAX_NB / _MAX_NB_FP32_MASS — fp32 mass mode
    has its own tighter table). Score = padded-pairs / measured rate;
    smallest score wins, larger tile on ties."""
    best = None
    for t, max_nb in _admission(mxu, masses).items():
        np_ = round_up(n, t)
        if np_ // t > max_nb:
            continue
        score = float(np_) * np_ / _TILE_RATE[mxu][t]
        key = (score, -t)
        if best is None or key < best[0]:
            best = (key, t)
    return best[1]



#: Folded-diagonal auto policy, pinned by the round-5 on-chip probe
#: (benchmarks/probe_resident_fold.py, v5e, us/step fold vs nofold):
#: mxu t=1024: 2048 12.54/15.31 (+22%), 4096 45.52/49.3 (+8%), 8192
#: 165.47/182.72 (+10%); mxu t=512: neutral (1024: 4.90/4.93 — at small
#: tiles the doubled 8xTxT matmuls + select overhead offset the halved
#: evals); fp32 t=512: 1024 6.77/8.04 (+19%); t=256: noise. nb*tile <=
#: 8192 keeps forced big-N resident runs on the probed admission tables
#: (fold holds ~3 live (T,T) temporaries, probed only to nb=8 at 1024).
def _fold_auto(nb: int, tile: int, mxu: bool) -> bool:
    if nb < 2 or nb * tile > 8192:
        return False
    return tile >= (1024 if mxu else 512)


def _blk(ref, b):
    """(8, T) state/accumulator block b (dynamic sublane slice)."""
    return ref[pl.ds(b * 8, 8), :]


def _mxu_operand(blk):
    """(8,T) state block -> (8,T) [vhi | vlo] MXU operand: rows 0-3 the
    bf16-rounded [m*p | m], rows 4-7 the fp32 residual (the compensated
    operand split of ops/sym_mxu_force; in-kernel the astype round-trip is
    NOT folded by Mosaic — verified on chip, sym_mxu_force._w_parts)."""
    v4 = jnp.concatenate([blk[0:3, :] * blk[6:7, :], blk[6:7, :]], axis=0)
    hi = v4.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, v4 - hi], axis=0)


def _mm(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _pad8(rows3):
    """(3,T) -> (8,T) with zero rows 3:8 (full-sublane accumulator adds)."""
    return jnp.concatenate(
        [rows3, jnp.zeros((5, rows3.shape[1]), jnp.float32)], axis=0)


def _force_block(st_ref, rows_ref, cols_ref, pw_ref, i, d,
                 *, nb, softening, masses, mxu, fast, mask=True, base=0):
    """base: first block of this system in the stacked state buffer (0 for
    the single-system kernel; s*nb under the batched-ensemble grid —
    i/d/jg are system-local, all buffer rows shift by base)."""
    jg = jax.lax.rem(i + d, jnp.int32(nb))
    bj = _blk(st_ref, base + jg)  # (8, T)

    pi = pw_ref[:]  # (T, 8) columns of the i-tile (built in _kernel at d==0)
    dx = bj[0:1, :] - pi[:, 0:1]
    dy = bj[1:2, :] - pi[:, 1:2]
    dz = bj[2:3, :] - pi[:, 2:3]
    # Accumulation-shaped so dx/dy/dz can die after this line in the fp32
    # path (its body recomputes each component — see below); the mxu path
    # keeps none of them either (w is the only (T,T) operand it feeds on).
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + jnp.asarray(softening, jnp.float32)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if mask:
        # Self/coincident pairs (and FAR-vs-FAR pad pairs): mask on the
        # pre-softening distance, exactly like ops/sym_mxu_force._w_block.
        # mask=False is used only for OFF-diagonal bands under
        # coincident='fast' (simulate_resident_sym): pads are still safe
        # there (pads live in the final tile only, so pad-vs-pad pairs hit
        # the always-masked diagonal band; real-vs-pad pairs at |d| ~ FAR
        # give w = 0 exactly via r2^3 overflow (fast) or underflow).
        w = jnp.where(d2 == 0.0, jnp.asarray(0.0, w.dtype), w)

    ri = pl.ds((base + i) * 8, 8)
    rj = pl.ds((base + jg) * 8, 8)
    if mxu:
        # Row sums transposed, (8,T_i) = vjT . W^T, straight into the
        # block-major accumulator. (The standard-orientation alternative —
        # wide (T,8) scratch accumulated over d, transposed out once per
        # i — MEASURED SLOWER on chip: 231 vs 248 G/s at N=65536; the
        # per-band iteration floor dominates, not matmul orientation.)
        srt = _mm(_mxu_operand(bj), w, ((1,), (1,)))
        rows_ref[ri, :] = rows_ref[ri, :] + srt

        @pl.when(d > 0)  # diagonal block: rows already cover both orders
        def _reactions():
            sct = _mm(_mxu_operand(_blk(st_ref, base + i)), w, ((1,), (0,)))
            cols_ref[rj, :] = cols_ref[rj, :] + sct
    else:
        # VMEM-liveness-shaped exactly like symmetric_force._pair_block's
        # mass branch: recompute each displacement component (one subtract)
        # and derive BOTH reductions from the single product t = d*w, so
        # only w persists across the axis loop (+ one t + one scaled temp =
        # 3 live (T,T) buffers). The r3 form held dx/dy/dz AND the three
        # weighted products live (~4-5 buffers), which is what capped the
        # fp32 class at tile=768 (_MAX_NB; round-3 VERDICT weak #5). Costs
        # +3 subs (+1 mul in mass mode) per unordered pair. Rounding note:
        # rows are now sum((d*w)*m_j) instead of sum((w*m_j)*d) — a
        # different (exact-per-op) product order, so fp32 resident
        # trajectories shift by ulps vs r3; all cross-kernel tests compare
        # with tolerances, and resident-vs-resident bitwise contracts
        # (phase split, ensemble-vs-standalone) use this same body.
        mj = bj[6:7, :] if masses else None   # (1, T)
        mi = pi[:, 6:7] if masses else None   # (T, 1)
        rs, cs = [], []
        for c in range(3):
            t = (bj[c:c + 1, :] - pi[:, c:c + 1]) * w
            if masses:
                rs.append(jnp.sum(t * mj, axis=1, keepdims=True))
                cs.append(jnp.sum(t * mi, axis=0, keepdims=True))
            else:
                rs.append(jnp.sum(t, axis=1, keepdims=True))
                cs.append(jnp.sum(t, axis=0, keepdims=True))
        pack = jnp.concatenate(rs, axis=1)  # (T, 3)
        rows_ref[ri, :] = rows_ref[ri, :] + _pad8(
            jnp.swapaxes(pack, 0, 1))

        @pl.when(d > 0)
        def _reactions_vpu():
            react = _pad8(jnp.concatenate(cs, axis=0))
            # reaction on j is -sum_i w m_i (p_j - p_i): accumulate negated
            cols_ref[rj, :] = cols_ref[rj, :] - react


def _force_fold_block(st_ref, rows_ref, cols_ref, pw_ref, i, *,
                      nb, softening, masses, mxu, fast, mask_offdiag,
                      tile, base=0):
    """Folded diagonal pair: blocks a = base+i and b = a+1 in ONE (T,T)
    eval — entry (r,c) is pair (a_r, a_c) for c < r (strict lower = every
    unordered within-a pair once) and (b_r, b_c) for c > r (strict upper =
    every within-b pair once); r == c is the self diagonal, always masked.
    Halves the diagonal slots' eval count at ~6 extra VPU ops/entry (the
    streamed twin: ops/slot_pipe._w_fold_block; measured +5.4% whole-step
    at streamed N=8192). The partner block's column operand is one native
    swapaxes (~free); the i-tile's comes from pw_ref as usual."""
    a = base + i
    blk_a = _blk(st_ref, a)
    blk_b = _blk(st_ref, a + 1)
    pwa = pw_ref[:]                        # (T, 8) columns of block a
    pwb = jnp.swapaxes(blk_b, 0, 1)        # (T, 8) columns of block b
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    lower = c_idx < r_idx

    def d_sel(c):
        return jnp.where(lower,
                         blk_a[c:c + 1, :] - pwa[:, c:c + 1],
                         blk_b[c:c + 1, :] - pwb[:, c:c + 1])

    dx, dy, dz = d_sel(0), d_sel(1), d_sel(2)
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + jnp.asarray(softening, jnp.float32)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    zero = jnp.asarray(0.0, w.dtype)
    w = jnp.where(r_idx == c_idx, zero, w)  # self pairs (both modes)
    if mask_offdiag:
        w = jnp.where(d2 == 0.0, zero, w)   # coincident distinct bodies
    w_lo = jnp.where(lower, w, zero)
    w_hi = w - w_lo

    ra = pl.ds(a * 8, 8)
    rb = pl.ds((a + 1) * 8, 8)
    if mxu:
        opa = _mxu_operand(blk_a)
        opb = _mxu_operand(blk_b)
        rows_ref[ra, :] = rows_ref[ra, :] + _mm(opa, w_lo, ((1,), (1,)))
        cols_ref[ra, :] = cols_ref[ra, :] + _mm(opa, w_lo, ((1,), (0,)))
        rows_ref[rb, :] = rows_ref[rb, :] + _mm(opb, w_hi, ((1,), (1,)))
        cols_ref[rb, :] = cols_ref[rb, :] + _mm(opb, w_hi, ((1,), (0,)))
        return
    # fp32: same displacement-recompute liveness shape as _force_block —
    # per coordinate only t/t_lo (t_hi derived) join w and the mask.
    mja = blk_a[6:7, :] if masses else None
    mjb = blk_b[6:7, :] if masses else None
    mia = pwa[:, 6:7] if masses else None
    mib = pwb[:, 6:7] if masses else None
    rs_a, cs_a, rs_b, cs_b = [], [], [], []
    for c in range(3):
        t = d_sel(c) * w
        t_lo = jnp.where(lower, t, zero)
        t_hi = t - t_lo
        if masses:
            rs_a.append(jnp.sum(t_lo * mja, axis=1, keepdims=True))
            cs_a.append(jnp.sum(t_lo * mia, axis=0, keepdims=True))
            rs_b.append(jnp.sum(t_hi * mjb, axis=1, keepdims=True))
            cs_b.append(jnp.sum(t_hi * mib, axis=0, keepdims=True))
        else:
            rs_a.append(jnp.sum(t_lo, axis=1, keepdims=True))
            cs_a.append(jnp.sum(t_lo, axis=0, keepdims=True))
            rs_b.append(jnp.sum(t_hi, axis=1, keepdims=True))
            cs_b.append(jnp.sum(t_hi, axis=0, keepdims=True))
    rows_ref[ra, :] = rows_ref[ra, :] + _pad8(
        jnp.swapaxes(jnp.concatenate(rs_a, axis=1), 0, 1))
    cols_ref[ra, :] = cols_ref[ra, :] - _pad8(jnp.concatenate(cs_a, axis=0))
    rows_ref[rb, :] = rows_ref[rb, :] + _pad8(
        jnp.swapaxes(jnp.concatenate(rs_b, axis=1), 0, 1))
    cols_ref[rb, :] = cols_ref[rb, :] - _pad8(jnp.concatenate(cs_b, axis=0))


def _integrate_block(st_ref, rows_ref, cols_ref, b, *, dt, mxu,
                     y4=None, step=None):
    """Euler update (kick dt, drift dt) — or, with y4 set, one yoshida4
    composition substep: y4 is a static 3-cycle of (kick_a, kick_b, drift)
    coefficients (already scaled by dt; simulate_resident_sym_yoshida4
    derivation) selected by the substep index `step` mod 3. The two
    half-kicks stay UNMERGED — v + ka*f then + kb*f, two adds against the
    same force — so the arithmetic matches the streamed yoshida4
    composition (integrators.yoshida4_step) op for op: the end kick of
    substep k and the opening kick of substep k+1 both round separately,
    exactly as in the streamed leapfrog_step chain. Costs 3 extra O(N)
    VPU ops per substep over a merged kick — invisible next to the O(N*T)
    force bands."""
    rb = pl.ds(b * 8, 8)
    blk = st_ref[rb, :]
    if mxu:
        s = rows_ref[rb, :] + cols_ref[rb, :]
        s4 = s[0:4, :] + s[4:8, :]  # fold the [hi | lo] split columns
        f = s4[0:3, :] - blk[0:3, :] * s4[3:4, :]
    else:
        s = rows_ref[rb, :] + cols_ref[rb, :]
        f = s[0:3, :]
    if y4 is None:
        vnew = blk[3:6, :] + dt * f
        xnew = blk[0:3, :] + dt * vnew
    else:
        (a0, b0, h0), (a1, b1, h1), (a2, b2, h2) = y4
        r = jax.lax.rem(step, jnp.int32(3))

        def pick(c0, c1, c2):
            return jnp.where(r == 0, jnp.float32(c0),
                             jnp.where(r == 1, jnp.float32(c1),
                                       jnp.float32(c2)))

        vh = blk[3:6, :] + pick(a0, a1, a2) * f  # close previous substep
        vnew = vh + pick(b0, b1, b2) * f         # open this substep
        xnew = blk[0:3, :] + pick(h0, h1, h2) * vnew
    st_ref[rb, :] = jnp.concatenate([xnew, vnew, blk[6:8, :]], axis=0)


def _kernel(in_ref, st_ref, rows_ref, cols_ref, pw_ref, *,
            tile, nb, nd, dt, softening, masses, mxu, fast,
            mask_offdiag=True, batched=False, y4=None, y4_phase=0,
            fold=False):
    del in_ref  # aliased to st_ref: the initial state IS the buffer
    if batched:
        # Ensemble grid (steps, B, nb + n_int, nd): system sy owns blocks
        # sy*nb .. sy*nb + nb - 1 of the stacked state/accumulator buffers;
        # i/d are system-local. Accumulators zero ONCE per step (the
        # systems' block rows are disjoint).
        sy = pl.program_id(1)
        i = pl.program_id(2)
        d = pl.program_id(3)
        base = sy * nb
        zero_now = jnp.logical_and(sy == 0,
                                   jnp.logical_and(i == 0, d == 0))
    else:
        i = pl.program_id(1)
        d = pl.program_id(2)
        base = 0
        zero_now = jnp.logical_and(i == 0, d == 0)

    @pl.when(zero_now)
    def _zero_accumulators():
        rows_ref[:] = jnp.zeros_like(rows_ref)
        cols_ref[:] = jnp.zeros_like(cols_ref)

    is_force = i < nb

    @pl.when(jnp.logical_and(is_force, d == 0))
    def _transpose_i_tile():
        # (T, 8) column operands of the i-tile for the pair-distance
        # broadcast: one native sublane<->lane transpose per (step, i).
        # (An MXU-identity transpose at Precision.HIGHEST costs ~17 us a
        # call — measured — and was most of the per-step overhead at small
        # N; jnp.swapaxes lowers to the native transpose and is exact.)
        pw_ref[:] = jnp.swapaxes(_blk(st_ref, base + i), 0, 1)

    # Band-active mask: on even nb the antipodal band d = nb/2 pairs each
    # block couple twice; keep the lower-index visit
    # (ops/sym_mxu_force._tri_kernel).
    force_on = jnp.logical_and(
        is_force, jnp.logical_or(d * 2 != nb, i * 2 < nb))

    if fold:
        # Folded diagonals: even-i d == 0 slots fold blocks (i, i+1); odd-i
        # d == 0 slots idle (resident idle slots are ~free — probed
        # 0.03-0.08 us, benchmarks/probe_resident_floor.py — because
        # nothing is fetched); odd nb leaves the last diagonal plain.
        even_i = jax.lax.rem(i, jnp.int32(2)) == 0
        fold_on = jnp.logical_and(
            jnp.logical_and(is_force, d == 0),
            jnp.logical_and(even_i, i + 1 < nb))

        @pl.when(fold_on)
        def _force_fold():
            _force_fold_block(st_ref, rows_ref, cols_ref, pw_ref, i,
                              nb=nb, softening=softening, masses=masses,
                              mxu=mxu, fast=fast,
                              mask_offdiag=mask_offdiag, tile=tile,
                              base=base)

        if nb % 2:
            @pl.when(jnp.logical_and(is_force,
                                     jnp.logical_and(d == 0, i == nb - 1)))
            def _force_last_diag():
                _force_block(st_ref, rows_ref, cols_ref, pw_ref,
                             i, d, nb=nb, softening=softening,
                             masses=masses, mxu=mxu, fast=fast, base=base)

        @pl.when(jnp.logical_and(force_on, d > 0))
        def _force_off_fold():
            _force_block(st_ref, rows_ref, cols_ref, pw_ref,
                         i, d, nb=nb, softening=softening,
                         masses=masses, mxu=mxu, fast=fast,
                         mask=mask_offdiag, base=base)
    elif mask_offdiag:
        @pl.when(force_on)
        def _force():
            _force_block(st_ref, rows_ref, cols_ref, pw_ref,
                         i, d, nb=nb, softening=softening,
                         masses=masses, mxu=mxu, fast=fast, base=base)
    else:
        # coincident='fast': the d == 0 band (self pairs) keeps the mask,
        # off-diagonal bands run the ~2-op-cheaper maskless body
        # (_force_block's pad rationale; caller guarantees no two distinct
        # bodies ever coincide during the trajectory).
        @pl.when(jnp.logical_and(is_force, d == 0))
        def _force_diag():
            _force_block(st_ref, rows_ref, cols_ref, pw_ref,
                         i, d, nb=nb, softening=softening,
                         masses=masses, mxu=mxu, fast=fast, base=base)

        @pl.when(jnp.logical_and(force_on, d > 0))
        def _force_off():
            _force_block(st_ref, rows_ref, cols_ref, pw_ref,
                         i, d, nb=nb, softening=softening,
                         masses=masses, mxu=mxu, fast=fast, mask=False,
                         base=base)

    blk = (i - nb) * nd + d
    # y4 substep index: global phase (watchdog segments restart program_id
    # 0 at 0; sim threads the running phase through y4_phase).
    step = (pl.program_id(0) + jnp.int32(y4_phase)) if y4 is not None else None

    @pl.when(jnp.logical_and(i >= nb, blk < nb))
    def _integrate():
        _integrate_block(st_ref, rows_ref, cols_ref, base + blk, dt=dt,
                         mxu=mxu, y4=y4, step=step)


@functools.partial(
    jax.jit,
    static_argnames=("steps", "dt", "softening", "mxu", "tile", "interpret",
                     "coincident", "y4", "y4_phase", "fold"),
)
def simulate_resident_sym(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
    y4: tuple | None = None,
    y4_phase: int = 0,
    fold: bool | None = None,
):
    """Run `steps` Euler steps entirely inside one kernel launch (module
    docstring); returns (pos, vel) after the final step.

    y4 (static, internal — use simulate_resident_sym_yoshida4): a 3-cycle
    of (kick_a, kick_b, drift) coefficient triples that turns each grid
    step into one yoshida4 composition substep (the r = step mod 3 select
    in _integrate_block); y4_phase offsets the cycle so watchdog-segmented
    dispatches (which restart program_id 0) continue mid-cycle.

    mxu=False: fp32-exact symmetric math on the VPU (the precision class of
    backend 'sym'). mxu=True: bf16-accumulate MXU hybrid with the
    compensated operand split (the class of 'sym_mxu'). mass=None runs unit
    masses; in mxu mode masses are free (folded into the matmul operand).
    N is bounded by RESIDENT_SYM_MAX_N (VMEM).

    coincident: unlike the single-pass kernels, the fused trajectory can
    form an exact duplicate at ANY step, which no t=0 scan can rule out —
    so "auto" here means the always-masked kernels ("masked" ditto), and
    only "fast" (caller guarantees no two distinct bodies ever coincide
    during the whole run) drops the off-diagonal d2 == 0 mask (self pairs
    and pads stay exact — _force_block)."""
    check_coincident(coincident)
    n = pos.shape[0]
    if n > RESIDENT_SYM_MAX_N:
        raise ValueError(
            f"simulate_resident_sym holds the whole state in VMEM: N={n} > "
            f"{RESIDENT_SYM_MAX_N}; use sim.simulate (streamed kernels)")
    if steps < 1:
        raise ValueError("simulate_resident_sym needs steps >= 1")
    masses = mass is not None
    if tile is None:
        tile = auto_tile(n, mxu, masses=masses)
    tile = min(tile, round_up(n, 8))
    if not interpret:
        tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    nb = np_ // tile
    nd = nb // 2 + 1
    n_int = -(-nb // nd)
    if fold is None:
        fold = _fold_auto(nb, tile, mxu)
    fold = bool(fold) and nb >= 2

    pad = np_ - n
    pos = pos.astype(jnp.float32)
    vel = vel.astype(jnp.float32)
    if pad:
        # FAR tails are inert: w underflows against real bodies, FAR-vs-FAR
        # pairs hit the d2 == 0 mask; zero masses double-guard mass mode.
        pos = jnp.pad(pos, ((0, pad), (0, 0)), constant_values=FAR)
        vel = jnp.pad(vel, ((0, pad), (0, 0)))
    m = (jnp.pad(mass.astype(jnp.float32), (0, pad)) if masses
         else jnp.ones((np_,), jnp.float32))
    # (8, Np) component rows -> sublane-major blocks (8*nb, tile).
    wide = jnp.concatenate(
        [pos.T, vel.T, m[None, :], jnp.zeros((1, np_), jnp.float32)], axis=0)
    wide = (wide.reshape(8, nb, tile).transpose(1, 0, 2)
            .reshape(8 * nb, tile))

    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, nb=nb, nd=nd, dt=float(dt),
                          softening=float(softening), masses=masses,
                          mxu=mxu, fast=fast,
                          mask_offdiag=coincident != "fast",
                          y4=y4, y4_phase=y4_phase, fold=fold),
        grid=(steps, nb + n_int, nd),
        in_specs=[pl.BlockSpec((8 * nb, tile), lambda s, i, d: (0, 0),
                               memory_space=vm)],
        out_specs=pl.BlockSpec((8 * nb, tile), lambda s, i, d: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((8 * nb, tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8 * nb, tile), jnp.float32),  # block-major row sums
            pltpu.VMEM((8 * nb, tile), jnp.float32),  # block-major reactions
            pltpu.VMEM((tile, 8), jnp.float32),       # i-tile columns
        ],
        input_output_aliases={0: 0},
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(19 * steps * np_ * np_) // 2,
            bytes_accessed=np_ * 64,
            transcendentals=(steps * np_ * np_) // 2,
        ),
        interpret=interpret,
    )(wide)

    final = out.reshape(nb, 8, tile).transpose(1, 0, 2).reshape(8, np_)
    return final[0:3, :n].T, final[3:6, :n].T


def auto_tile_ensemble(b: int, n: int, mxu: bool,
                       masses: bool = False) -> int:
    """auto_tile for B batched systems: per-system padded pair work scores
    the candidates (identical for every B), but VMEM admission bounds the
    TOTAL stacked block count b * round_up(n, t)/t (the state/accumulator
    buffers hold all B systems)."""
    best = None
    for t, max_nb in _admission(mxu, masses).items():
        np_ = round_up(n, t)
        if b * (np_ // t) > max_nb:
            continue
        score = float(np_) * np_ / _TILE_RATE[mxu][t]
        key = (score, -t)
        if best is None or key < best[0]:
            best = (key, t)
    if best is None:
        raise ValueError(
            f"no VMEM-admissible resident tile for B={b}, N={n} "
            f"(mxu={mxu}); use the streamed ensemble (sim.simulate_ensemble "
            "routes there automatically)")
    return best[1]


@functools.partial(
    jax.jit,
    static_argnames=("steps", "dt", "softening", "mxu", "tile", "interpret",
                     "coincident", "y4", "y4_phase", "fold"),
)
def simulate_resident_sym_ensemble(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
    y4: tuple | None = None,
    y4_phase: int = 0,
    fold: bool | None = None,
):
    """B independent systems x `steps` Euler steps in ONE kernel launch.

    pos/vel are (B, N, 3), mass (B, N) or None; returns (pos, vel) after
    the final step, each (B, N, 3). The batched twin of
    simulate_resident_sym: the grid gains a leading system axis
    (steps, B, nb + n_int, nd), every system owns nb consecutive blocks of
    the stacked (8*B*nb, tile) state/accumulator buffers, and the SAME
    kernel body runs with all buffer rows offset by the system's block
    base — so each system's trajectory is bitwise equal to its standalone
    simulate_resident_sym run at the same tile (tested). The streamed
    ensemble (sim.simulate_ensemble) pays per-step epilogue + integrator
    HBM traffic over the whole (B, N, 3) state; here state stays in VMEM
    for the entire trajectory.

    VMEM bounds the TOTAL stacked size: B * round_up(N, tile) blocks must
    satisfy _MAX_NB (auto_tile_ensemble raises otherwise).

    coincident: same trajectory-wide rule as simulate_resident_sym —
    'auto' == 'masked' (duplicates can form at any step), only 'fast'
    unlocks maskless off-diagonal bands.
    """
    check_coincident(coincident)
    b, n = pos.shape[0], pos.shape[1]
    if tile is None:
        tile = auto_tile_ensemble(b, n, mxu, masses=mass is not None)
    tile = min(tile, round_up(n, 8))
    if not interpret:
        tile = round_up(tile, 128)
    np_ = round_up(n, tile)
    nb = np_ // tile
    if b * np_ > RESIDENT_SYM_MAX_N:
        raise ValueError(
            f"resident ensemble holds all B systems in VMEM: B*Np = "
            f"{b * np_} > {RESIDENT_SYM_MAX_N}; use sim.simulate_ensemble's "
            "streamed path")
    nd = nb // 2 + 1
    n_int = -(-nb // nd)
    masses = mass is not None
    if fold is None:
        fold = _fold_auto(nb, tile, mxu)
    fold = bool(fold) and nb >= 2

    pad = np_ - n
    pos = pos.astype(jnp.float32)
    vel = vel.astype(jnp.float32)
    if pad:
        # Per-system FAR tails, inert exactly as in simulate_resident_sym.
        pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)), constant_values=FAR)
        vel = jnp.pad(vel, ((0, 0), (0, pad), (0, 0)))
    m = (jnp.pad(mass.astype(jnp.float32), ((0, 0), (0, pad))) if masses
         else jnp.ones((b, np_), jnp.float32))
    # (B, 8, Np) component rows -> stacked sublane-major blocks
    # (8*B*nb, tile): system s's blocks at rows 8*(s*nb) .. 8*(s*nb+nb)-1.
    wide = jnp.concatenate(
        [jnp.swapaxes(pos, 1, 2), jnp.swapaxes(vel, 1, 2), m[:, None, :],
         jnp.zeros((b, 1, np_), jnp.float32)], axis=1)
    wide = (wide.reshape(b, 8, nb, tile).transpose(0, 2, 1, 3)
            .reshape(8 * b * nb, tile))

    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, nb=nb, nd=nd, dt=float(dt),
                          softening=float(softening), masses=masses,
                          mxu=mxu, fast=fast,
                          mask_offdiag=coincident != "fast", batched=True,
                          y4=y4, y4_phase=y4_phase, fold=fold),
        grid=(steps, b, nb + n_int, nd),
        in_specs=[pl.BlockSpec((8 * b * nb, tile),
                               lambda s, sy, i, d: (0, 0),
                               memory_space=vm)],
        out_specs=pl.BlockSpec((8 * b * nb, tile),
                               lambda s, sy, i, d: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((8 * b * nb, tile), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8 * b * nb, tile), jnp.float32),  # row sums
            pltpu.VMEM((8 * b * nb, tile), jnp.float32),  # reactions
            pltpu.VMEM((tile, 8), jnp.float32),           # i-tile columns
        ],
        input_output_aliases={0: 0},
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary",) * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(19 * steps * b * np_ * np_) // 2,
            bytes_accessed=b * np_ * 64,
            transcendentals=(steps * b * np_ * np_) // 2,
        ),
        interpret=interpret,
    )(wide)

    final = (out.reshape(b, nb, 8, tile).transpose(0, 2, 1, 3)
             .reshape(b, 8, np_))
    return (jnp.swapaxes(final[:, 0:3, :n], 1, 2),
            jnp.swapaxes(final[:, 3:6, :n], 1, 2))


def simulate_resident_sym_ensemble_leapfrog(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
):
    """KDK leapfrog on the batched-resident kernel: merged half-kicks make
    leapfrog the Euler update on staggered velocities (module docstring);
    the end kicks run one streamed ENSEMBLE force pass each — bitwise the
    per-system force, so each system still matches its standalone
    simulate_resident_sym_leapfrog run."""
    if steps < 1:
        raise ValueError(
            "simulate_resident_sym_ensemble_leapfrog needs steps >= 1")
    half = 0.5 * dt
    force = _class_force_ensemble(mxu, softening, interpret, coincident)
    a0 = force(pos, mass)
    vh = vel + half * a0
    pos = pos + dt * vh
    if steps > 1:
        pos, vh = simulate_resident_sym_ensemble(
            pos, vh, mass, steps=steps - 1, dt=dt, softening=softening,
            mxu=mxu, tile=tile, interpret=interpret, coincident=coincident)
    a_end = force(pos, mass)
    return pos, vh + half * a_end


def _class_force_ensemble(mxu: bool, softening: float, interpret: bool,
                          coincident: str = "auto"):
    """Streamed ensemble force of the same precision class for the
    leapfrog end kicks. NOTE the end kicks pad each system to the
    STREAMED kernels' chunk geometry — per-system results stay bitwise
    equal to standalone leapfrog runs whose end kicks use chunk =
    round_up(n, tile) (the ensemble drivers' layout)."""
    if mxu:
        from mini_nbody_tpu.ops.sym_mxu_force import (
            body_force_sym_mxu_ensemble)

        def force(pos, mass):
            return body_force_sym_mxu_ensemble(
                pos, mass, softening=softening, interpret=interpret,
                coincident=coincident)
    else:
        from mini_nbody_tpu.ops.symmetric_force import (
            body_force_symmetric_ensemble)

        def force(pos, mass):
            return body_force_symmetric_ensemble(
                pos, mass, softening=softening, interpret=interpret)
    return force


def simulate_resident_sym_leapfrog(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
):
    """`steps` KDK leapfrog steps on the resident kernel (module docstring:
    merged half-kicks make leapfrog the Euler update on staggered
    velocities). One streamed force pass opens (half-kick + first drift on
    the host), steps-1 passes run fused in-kernel, one streamed pass closes
    — steps+1 force evaluations, the same as the streamed loop."""
    if steps < 1:
        raise ValueError("simulate_resident_sym_leapfrog needs steps >= 1")
    half = 0.5 * dt
    force = _class_force(mxu, softening, interpret, coincident)
    a0 = force(pos, mass)
    vh = vel + half * a0
    pos = pos + dt * vh
    if steps > 1:
        pos, vh = simulate_resident_sym(
            pos, vh, mass, steps=steps - 1, dt=dt, softening=softening,
            mxu=mxu, tile=tile, interpret=interpret, coincident=coincident)
    a_end = force(pos, mass)
    return pos, vh + half * a_end


def y4_cycle(dt: float):
    """Static (kick_a, kick_b, drift) coefficient 3-cycle for the fused
    yoshida4 substep chain, plus the opening/closing half-step h1.

    The streamed yoshida4 (integrators.yoshida4_step) is three KDK leapfrog
    substeps scaled by (w1, w0, w1). Rearranged into (force, update) blocks
    around each force evaluation k = 1..3S-1 (the opening K(h1/2) D(h1)
    and the closing K(h1/2) run on the host with streamed force passes),
    substep k closes the previous leapfrog with kick h_prev/2, opens the
    next with kick h_next/2 — UNMERGED, matching the streamed rounding —
    then drifts h_next, with (h_prev, h_next) cycling by r = (k-1) mod 3:

        r = 0: (h1, h0)    r = 1: (h0, h1)    r = 2: (h1, h1)

    All coefficients are Python floats computed exactly as the streamed
    path computes them (0.5 * (w * dt)), so each scalar rounds to the same
    fp32 constant."""
    from mini_nbody_tpu.ops.integrators import _Y4_W0, _Y4_W1

    h1 = _Y4_W1 * dt
    h0 = _Y4_W0 * dt
    cycle = (
        (0.5 * h1, 0.5 * h0, h0),
        (0.5 * h0, 0.5 * h1, h1),
        (0.5 * h1, 0.5 * h1, h1),
    )
    return cycle, h1


def simulate_resident_sym_yoshida4(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
):
    """`steps` yoshida4 steps with all 3*steps-1 interior composition
    substeps fused in ONE kernel launch (y4_cycle derivation): one streamed
    force pass opens (half-kick h1/2 + drift h1), one closes (final
    half-kick h1/2) — 3*steps+1 force evaluations, the same count as the
    streamed loop (initial_acc + 3/step), and op-for-op the same update
    arithmetic (unmerged double half-kicks), so the trajectory matches the
    streamed yoshida4 run up to any force-kernel-level difference only."""
    if steps < 1:
        raise ValueError("simulate_resident_sym_yoshida4 needs steps >= 1")
    cycle, h1 = y4_cycle(float(dt))
    force = _class_force(mxu, softening, interpret, coincident)
    a0 = force(pos, mass)
    vh = vel + (0.5 * h1) * a0
    pos = pos + h1 * vh
    pos, vh = simulate_resident_sym(
        pos, vh, mass, steps=3 * steps - 1, dt=dt, softening=softening,
        mxu=mxu, tile=tile, interpret=interpret, coincident=coincident,
        y4=cycle)
    a_end = force(pos, mass)
    return pos, vh + (0.5 * h1) * a_end


def simulate_resident_sym_ensemble_yoshida4(
    pos,
    vel,
    mass=None,
    *,
    steps: int,
    dt: float,
    softening: float = SOFTENING,
    mxu: bool = False,
    tile: int | None = None,
    interpret: bool = False,
    coincident: str = "auto",
):
    """Batched-resident yoshida4: B systems x steps, interior substeps in
    one launch (simulate_resident_sym_yoshida4 semantics; end passes use
    the streamed ENSEMBLE force of the same class)."""
    if steps < 1:
        raise ValueError(
            "simulate_resident_sym_ensemble_yoshida4 needs steps >= 1")
    cycle, h1 = y4_cycle(float(dt))
    force = _class_force_ensemble(mxu, softening, interpret, coincident)
    a0 = force(pos, mass)
    vh = vel + (0.5 * h1) * a0
    pos = pos + h1 * vh
    pos, vh = simulate_resident_sym_ensemble(
        pos, vh, mass, steps=3 * steps - 1, dt=dt, softening=softening,
        mxu=mxu, tile=tile, interpret=interpret, coincident=coincident,
        y4=cycle)
    a_end = force(pos, mass)
    return pos, vh + (0.5 * h1) * a_end


def _class_force(mxu: bool, softening: float, interpret: bool,
                 coincident: str = "auto"):
    """Streamed force of the SAME precision class for the leapfrog end
    kicks (sym_mxu for mxu mode, fp32 symmetric otherwise). The end kicks
    are single passes, so coincident='auto' keeps its per-pass duplicate
    scan here even though the fused kernel treats 'auto' as 'masked'."""
    if mxu:
        from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu

        def force(pos, mass):
            return body_force_sym_mxu(pos, mass, softening=softening,
                                      interpret=interpret,
                                      coincident=coincident)
    else:
        from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric

        def force(pos, mass):
            return body_force_symmetric(pos, mass, softening=softening,
                                        interpret=interpret)
    return force
