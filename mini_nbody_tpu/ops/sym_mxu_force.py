"""Symmetric x MXU hybrid force kernel: each unordered pair's weight w
computed ONCE on the VPU, then BOTH the row sums and the reaction sums ride
the MXU as matmuls.

The fp32 symmetric kernel (symmetric_force.py) is VPU-saturated at ~23 VPU
ops per unordered pair (346 GInter/s = 0.98 of the measured roofline), so
the only headroom left is the matrix unit. The accumulation identities

    row  side: S_r = W @ [v_j | 1]    F_i += S_r[:, :3] - p_i * S_r[:, 3]
    react side: S_c = [v_i | 1]^T @ W  F_j -= S_c[:3, :] - p_j * S_c[3, :]

(with v = m*p and the last column m in mass mode — masses fold into the
matmul operands OUTSIDE the kernel, so mass mode costs nothing per pair)
move all d*w products and reductions onto the MXU; the VPU keeps only the
distance + rsqrt pipeline (~17-19 op-equivalents per unordered pair vs ~23,
and vs ~32 for mass-mode symmetric).

Precision: the matmuls run at MXU DEFAULT = single-pass bf16 operands with
fp32 accumulation (Mosaic supports only DEFAULT and HIGHEST; HIGHEST's fp32
contract passes are slower than the pure-VPU kernel — measured 117 GInter/s
in mxu_force.py). bf16 rounding splits into two very different error terms:

  * rounding of w: a plain ~4e-3 RELATIVE error on each pair force (the
    epilogue multiplies dw by the true displacement) — the 2.7e-3 median.
  * rounding of the [m*p | m] operand: dp enters as w*dp, while the true
    pair force is w*|d| — AMPLIFIED by |p|/|d| on close pairs (the p99-0.14
    tails measured in round 2).

The second term is eliminated for free by an error-compensated operand
split: v = vhi + vlo with vhi = bf16(v), packed as one (T, 8) operand
[vhi | vlo]. VMEM lane-pads the minor dim to 128 and the MXU pads the
matmul to its native width, so the wider operand costs no extra VMEM and
no extra VPU work; hi and lo halves accumulate in the same fp32 buffers
and are summed in the epilogue. Residual operand error ~1e-5*|p| (16
effective mantissa bits), below the w term even at |p|/|d| ~ 300. The
remaining ~3e-3 relative error class is uniform (no cancellation tails);
the fp32-exact headline stays with symmetric_force.py. Self/coincident
pairs must NOT reach the accumulators (their eps^-1.5 weight would swamp
them — same hazard as mxu_force.py/autodiff.py), but the per-pair
|d|^2 == 0 mask costs a measured 12.8% of the whole pass (2 of ~19 VPU
ops/pair; benchmarks/probe_w_variants.py). Round 3 therefore masks only
where a hot d2 == 0 pair can exist: diagonal blocks always (self pairs),
off-diagonal blocks only when an O(N log N) exact duplicate scan finds
distinct coincident bodies (coincident='auto' — a lax.cond picks the
masked kernels then, so results stay bitwise identical to full masking
for every input; see any_coincident and body_force_sym_mxu).

Structure: same diagonal-band traversal and accumulator layout as
symmetric_force.py (rows = blocked (T,8) output with consecutive-revisit
accumulation; reactions = whole-chunk constant-index (8,C) output — both
free of extra VMEM vs 4-wide: f32 sublane padding is 8), same
chunk decomposition for large N; see that module's docstring for why Pallas
forces this shape. Reference anchors as in symmetric_force.py.
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


def _w_block(pi, pjt, softening, fast, mask=True):
    """(T,3) x (3,T) -> pair weights w (T,T), d2==0 masked iff ``mask``.

    The mask costs ~2 VPU ops of the body's ~19 per unordered pair —
    measured 12.8% of the whole N=1M force pass (benchmarks/
    probe_w_variants.py: 467.0 vs 414.0 GInter/s). It is only NEEDED
    where a d2 == 0 pair can carry a non-zero operand: self pairs (the
    diagonal blocks) and exactly-coincident distinct bodies (detected
    once per pass by any_coincident; see body_force_sym_mxu). FAR-pad
    pairs also hit d2 == 0 unmasked, but their eps^-1.5 * FAR products
    stay finite (< 5e36 at chunk<=131072) and land only in pad rows/
    cols, which are sliced off — real rows see pads at |d|~FAR, where
    r2^3 overflows to inf and rsqrt(inf) = 0 exactly."""
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt[0:1, :] - xi
    dy = pjt[1:2, :] - yi
    dz = pjt[2:3, :] - zi
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + jnp.asarray(softening, dx.dtype)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if not mask:
        return w
    # Coincident/self pairs: the matmul accumulation separates sum(w*p) and
    # sum(w), so the analytic zero no longer cancels — mask exactly like
    # mxu_force.py.
    return jnp.where(d2 == 0.0, jnp.asarray(0.0, w.dtype), w)


def any_coincident(pos):
    """True iff pos (N,3) could contain a hot d2 == 0 pair between
    DISTINCT bodies. Drives coincident='auto' — the maskless kernels are
    bitwise-identical to the masked ones whenever this is False, because
    the d2 == 0 mask then only ever fires on diagonal-block self pairs
    (always masked) and pad pairs (outputs discarded; see _w_block).

    Three conservative O(N)/O(N log N) conditions (any flags -> the
    always-correct masked kernels run, so false positives only cost the
    12.8% mask):

    * exact duplicate rows — lexsort the (canonicalized, so -0.0 == +0.0
      sorts together) coordinates, compare neighbors;
    * any coordinate with 0 < |c| < 2^-48 — d2 == 0 between NON-equal
      rows needs a per-coordinate diff below 2^-74.5 (its square
      underflows to exactly 0), which two distinct fp32 values of
      magnitude >= 2^-48 cannot produce (their spacing is >= 2^-72, and
      (2^-72)^2 = 2^-144 is a nonzero subnormal), so one of the pair
      must itself be tiny. The flagged band (0, 3.6e-15) costs only the
      12.8% mask for the rare step where a body crosses that close to a
      coordinate plane;
    * any |c| >= FAR — a real body at the exact FAR pad sentinel would
      coincide with the pad tail, whose operand rows are NOT zero in
      unit-mass mode (_pack pads v = [FAR..FAR | 1])."""
    from mini_nbody_tpu.utils.config import FAR

    p = pos.astype(jnp.float32) + 0.0  # -0.0 -> +0.0
    # ONE lexicographic multi-key value sort (lax.sort num_keys=3), not a
    # 3-pass lexsort + index gather: same exact-duplicate answer, ~3x
    # cheaper — the scan is a per-force-call fixed cost that sets where
    # 'auto' can afford to leave 'masked' (COINCIDENT_AUTO_MIN_N).
    sx, sy, sz = jax.lax.sort((p[:, 0], p[:, 1], p[:, 2]), num_keys=3)
    dup = jnp.any((sx[1:] == sx[:-1]) & (sy[1:] == sy[:-1])
                  & (sz[1:] == sz[:-1]))
    a = jnp.abs(p)
    tiny = jnp.any(jnp.logical_and(a > 0.0, a < 2.0 ** -48))
    far = jnp.any(a >= FAR)
    return dup | tiny | far


#: Module-level jit so host-resolved 'auto' (the segmented driver) hits one
#: cached compile per shape — jax.jit caches by wrapper identity, so a
#: per-call jax.jit(any_coincident) re-compiled through the (slow) remote
#: helper on every segmented force call.
_any_coincident_jit = jax.jit(any_coincident)

def resolve_traversal(traversal: str, nc: int) -> str:
    """Static resolution of traversal='auto': the slot-list traversal
    (ops/slot_pipe.py) measured >= the band grid at EVERY probed size
    (probe_slot_prod.py + the 1M A/B, v5e, coincident='fast' G/s —
    slots-fold vs band: 8k 454.0/431.3, 16k 471.8/461.6, 65k 493.2/493.3,
    262k 490.9/473.9, 1M 498.5/475.2), so 'auto' is simply 'slots'; the
    band kernels stay reachable for A/B probes and drive the batched
    ensemble (its leading-system-axis kernel is the band tri)."""
    del nc
    if traversal == "auto":
        return "slots"
    return traversal


#: Below this many bodies (per system) 'auto' routes STRAIGHT to the
#: always-correct masked kernels without the duplicate scan: the scan +
#: lax.cond run once per force call, so in a stepped loop their fixed cost
#: is paid every step, and at small N it outweighs the maskless body's
#: ~12.8% saving. Pinned by the r4 on-chip crossover probe
#: (benchmarks/probe_auto_cond.py stage 1, gate patched to 0 so the true
#: scan+cond+maskless cost is visible at every N — G/s, scan-auto vs
#: masked): 4096 284.3/348.3, 8192 385.5/390.0, 16384 433.3/411.8,
#: 32768 468.7/426.7, 65536 486.7/434.5 — scan-auto overtakes masked
#: between 8192 and 16384 under the BAND traversal. Round 5 re-probed
#: under the slot traversal (benchmarks/_t_gate8k.py-style step timing):
#: 8192 scan-auto 406.9 vs masked 403.6 vs fast 457.6 — the bigger
#: maskless gain moves the crossover down one octave, so the gate is now
#: 8192 (below that simulate auto-routes the resident kernel anyway).
#: Bitwise-neutral by construction: 'auto' is defined as producing the
#: masked result for every input.
COINCIDENT_AUTO_MIN_N = 8192


def resolve_auto(coincident: str, n: int) -> str:
    """N-aware 'auto' (static: n and the mode are trace-time constants):
    below COINCIDENT_AUTO_MIN_N the duplicate scan cannot pay for itself,
    so 'auto' degrades to 'masked' — same outputs (bitwise), strictly
    less per-call overhead. Callers pass the PER-SYSTEM body count (the
    scan and the pair work scale with the same n)."""
    if coincident == "auto" and n < COINCIDENT_AUTO_MIN_N:
        return "masked"
    return coincident


def _mm(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _w_parts(w, split_w):
    """(whi, wlo) on the bf16 grid for the compensated w split, or (w,)
    plain. With split_w each matmul runs twice (hi + lo pass) for a ~256x
    smaller w rounding error at +2 VPU ops/pair. Mosaic does not lower
    reduce_precision, but unlike XLA (see _pack) it also does not fold the
    bf16 astype round-trip into identity (verified on-chip: split_w error
    drops to the compensated class, which would be impossible if wlo == 0)."""
    if not split_w:
        return (w,)
    whi = w.astype(jnp.bfloat16).astype(jnp.float32)
    return (whi, w - whi)


def _mm_rows(w_parts, vj):
    """sum_parts (T,T) @ (T,8) row sums."""
    return sum(_mm(wp, vj, ((1,), (0,))) for wp in w_parts)


def _mm_cols(vi, w_parts):
    """sum_parts (T,8)^T-contracted (8,T) reaction sums."""
    return sum(_mm(vi, wp, ((0,), (0,))) for wp in w_parts)


def _tri_kernel(pi_ref, pjt_ref, vi_ref, vj_ref, rows_ref, colsT_ref, *,
                softening, tile, fast, nb, split_w, mask_offdiag=True,
                axis_off=0):
    """Self-chunk diagonal-band step: block (i, (i+d) mod nb) at grid (i, d).

    Diagonal blocks (d == 0) always mask d2 == 0 (self pairs); off-
    diagonal blocks mask only when mask_offdiag — the maskless body is
    ~13% faster and exact unless distinct coincident bodies exist
    (any_coincident gates that outside).

    axis_off=1 runs the SAME body under the batched-ensemble grid
    (system, i, d) — i/d just shift one grid axis right, and the
    (i == 0, d == 0) colsT zero-init refires at the start of every
    system because program ids reset per leading-axis step."""
    i = pl.program_id(axis_off)
    d = pl.program_id(axis_off + 1)
    jg = jax.lax.rem(i + d, jnp.int32(nb))  # vi/vj refs are (T, 8) [vhi|vlo]

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    active = jnp.logical_or(d * 2 != nb, i * 2 < nb)

    @pl.when(d == 0)  # always active; self pairs: always masked
    def _diag():
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast),
                     split_w)
        rows_ref[:] = _mm_rows(w, vj_ref[:])  # (T, 8)

    @pl.when(jnp.logical_and(active, d > 0))
    def _off():
        w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast,
                              mask=mask_offdiag), split_w)
        rows_ref[:] = rows_ref[:] + _mm_rows(w, vj_ref[:])
        # diagonal blocks: row sums already cover both orders
        s_c = _mm_cols(vi_ref[:], w)  # (8, T)
        cj = pl.ds(jg * tile, tile)
        colsT_ref[:, cj] = colsT_ref[:, cj] + s_c


def _cross_kernel(pi_ref, pjt_ref, vi_ref, vj_ref, rows_ref, colsT_ref, *,
                  softening, tile, fast, split_w, mask=True):
    """Cross-chunk step (i in chunk a, j in chunk b, a != b): no self
    pairs, so the d2 == 0 mask is needed only for distinct coincident
    bodies (mask=False when any_coincident ruled those out)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    w = _w_parts(_w_block(pi_ref[:], pjt_ref[:], softening, fast, mask=mask),
                 split_w)
    s_r = _mm_rows(w, vj_ref[:])

    @pl.when(j == 0)
    def _rows_init():
        rows_ref[:] = s_r

    @pl.when(j > 0)
    def _rows_acc():
        rows_ref[:] = rows_ref[:] + s_r

    s_c = _mm_cols(vi_ref[:], w)
    cj = pl.ds(j * tile, tile)
    colsT_ref[:, cj] = colsT_ref[:, cj] + s_c


def _common_params(pairs, io_bytes, ndims=2):
    return dict(
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary",) * ndims,
        ),
        cost_estimate=pl.CostEstimate(
            flops=17 * pairs + 32 * pairs,  # VPU w + 2 padded (.,8) matmuls
            bytes_accessed=io_bytes,
            transcendentals=pairs,
        ),
    )


def _build_calls(softening, tile, c, interpret, split_w=False,
                 mask_offdiag=True):
    """The two Mosaic kernels for chunk size c (shared by the one-program
    and host-segmented drivers)."""
    nb = c // tile
    nd = nb // 2 + 1
    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    tri_call = pl.pallas_call(
        functools.partial(_tri_kernel, softening=float(softening), tile=tile,
                          fast=fast, nb=nb, split_w=split_w,
                          mask_offdiag=mask_offdiag),
        grid=(nb, nd),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((3, tile),
                         lambda i, d: (0, jax.lax.rem(i + d, jnp.int32(nb))),
                         memory_space=vm),
            pl.BlockSpec((tile, 8), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((tile, 8),
                         lambda i, d: (jax.lax.rem(i + d, jnp.int32(nb)), 0),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 8), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((8, c), lambda i, d: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(nb * nd * tile * tile, c * 96),
    )
    cross_call = pl.pallas_call(
        functools.partial(_cross_kernel, softening=float(softening),
                          tile=tile, fast=fast, split_w=split_w,
                          mask=mask_offdiag),
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, tile), lambda i, j: (0, j), memory_space=vm),
            pl.BlockSpec((tile, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((tile, 8), lambda i, j: (j, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((8, c), lambda i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(c * c, c * 96),
    )
    return tri_call, cross_call


def _build_tri_ensemble(softening, tile, c, b, interpret, split_w,
                        mask_offdiag):
    """ONE pallas_call for B independent systems: the tri kernel under a
    leading system axis, grid (b, nb, nd), every index map offset by the
    system's block base s*nb (colsT gets a per-system (8, c) block at
    column-block s).

    This replaces the original lax.scan of per-system tri calls, which
    dynamic-slice-accumulated the FULL (B*c, 8)/(8, B*c) carries every
    iteration — ~8 MB of HBM read+write per system per force pass, 540
    MB/step at B=64, c=1024, measured 687 us/step (benchmarks/
    probe_ensemble_perf.py) where the slots' compute is ~160 us."""
    nb = c // tile
    nd = nb // 2 + 1
    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_tri_kernel, softening=float(softening), tile=tile,
                          fast=fast, nb=nb, split_w=split_w,
                          mask_offdiag=mask_offdiag, axis_off=1),
        grid=(b, nb, nd),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda s, i, d: (s * nb + i, 0),
                         memory_space=vm),
            pl.BlockSpec(
                (3, tile),
                lambda s, i, d: (
                    0, s * nb + jax.lax.rem(i + d, jnp.int32(nb))),
                memory_space=vm),
            pl.BlockSpec((tile, 8), lambda s, i, d: (s * nb + i, 0),
                         memory_space=vm),
            pl.BlockSpec(
                (tile, 8),
                lambda s, i, d: (
                    s * nb + jax.lax.rem(i + d, jnp.int32(nb)), 0),
                memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 8), lambda s, i, d: (s * nb + i, 0),
                         memory_space=vm),
            pl.BlockSpec((8, c), lambda s, i, d: (0, s), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * c, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, b * c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(b * nb * nd * tile * tile, b * c * 96, ndims=3),
    )


def _epilogue(pos, s_r, s_cT):
    """Force from raw sums.

    Rows:      F_i += S_r[i,:3] - p_i S_r[i,3]   (sum_j w (p_j - p_i))
    Reactions: F_j += S_c[:3,j] - p_j S_c[3,j]   (sum_i w (p_i - p_j))
    Both share the shape (sum of w-weighted positions) - p * (sum of w),
    so one fused epilogue over s = S_r + S_c^T covers them. Columns 4:8
    carry the lo half of the compensated operand split (module docstring)
    and fold in here, after all fp32 accumulation."""
    return _combine(pos, s_r + s_cT)


def _resolve_tiling(n, tile, chunk, interpret):
    tile = min(tile, round_up(n, 8))
    if not interpret:
        # Mosaic requires lane offsets provably 128-aligned: the dynamic
        # colsT slice at jg*tile only proves when 128 | tile — even for a
        # single block (n < 128 lane-pads up; FAR tails stay inert).
        tile = round_up(tile, 128)
    nc = max(1, -(-n // chunk))
    c = round_up(-(-n // nc), tile)
    return tile, c, nc, nc * c


def _pack(pos, mass, n, np_):
    """Pad (FAR positions / zero masses) and build the matmul operand
    v = [m*p | m] (ones-mass when mass is None), split into the (N, 8)
    [vhi | vlo] compensated form (module docstring): vhi = bf16(v) rounds
    exactly inside the MXU, vlo = v - vhi restores ~16 mantissa bits.

    The rounding MUST be lax.reduce_precision, not an astype round-trip:
    XLA's excess-precision simplifier folds convert(convert(v, bf16), f32)
    to v on TPU (measured: lo == 0 exactly), silently turning the split
    into a no-op. reduce_precision is the op XLA guarantees to preserve."""
    pos = pos.astype(jnp.float32)
    if np_ != n:
        pos = jnp.pad(pos, ((0, np_ - n), (0, 0)), constant_values=FAR)
    if mass is None:
        v = jnp.concatenate([pos, jnp.ones((np_, 1), jnp.float32)], axis=1)
    else:
        m = mass.astype(jnp.float32)
        if np_ != n:
            m = jnp.pad(m, (0, np_ - n))  # zero-mass tails: inert in v too
        v = jnp.concatenate([pos * m[:, None], m[:, None]], axis=1)
    vhi = jax.lax.reduce_precision(v, 8, 7)  # bf16 grid, kept in f32
    return pos, pos.T, jnp.concatenate([vhi, v - vhi], axis=1)


def _make_scan_bodies(tri_call, cross_call, c):
    """Scan bodies accumulating (rows (Np,8), colsT (8,Np)); the packed
    arrays (pos, pjt, v) thread through the carry so the same bodies serve
    the one-program scans and the host-segmented runners."""

    def add_rows(buf, off, r):
        zero = jnp.zeros((), off.dtype)
        cur = jax.lax.dynamic_slice(buf, (off, zero), (c, 8))
        return jax.lax.dynamic_update_slice(buf, cur + r, (off, zero))

    def add_cols(buf, off, ct):
        zero = jnp.zeros((), off.dtype)
        cur = jax.lax.dynamic_slice(buf, (zero, off), (8, c))
        return jax.lax.dynamic_update_slice(buf, cur + ct, (zero, off))

    def slice_chunk(pos_, pjt_, v_, off):
        zero = jnp.zeros((), off.dtype)
        pa = jax.lax.dynamic_slice(pos_, (off, zero), (c, 3))
        pat = jax.lax.dynamic_slice(pjt_, (zero, off), (3, c))
        va = jax.lax.dynamic_slice(v_, (off, zero), (c, 8))
        return pa, pat, va

    def tri_body(carry, off):
        rows, cols, pos_, pjt_, v_ = carry
        pa, pat, va = slice_chunk(pos_, pjt_, v_, off)
        r, ct = tri_call(pa, pat, va, va)
        return (add_rows(rows, off, r), add_cols(cols, off, ct),
                pos_, pjt_, v_), None

    def cross_body(carry, ab):
        rows, cols, pos_, pjt_, v_ = carry
        pa, _, va = slice_chunk(pos_, pjt_, v_, ab[0])
        _, pbt, vb = slice_chunk(pos_, pjt_, v_, ab[1])
        r, ct = cross_call(pa, pbt, va, vb)
        return (add_rows(rows, ab[0], r), add_cols(cols, ab[1], ct),
                pos_, pjt_, v_), None

    return tri_body, cross_body


def _make_slot_scan_bodies(tri_call, cross_call, c):
    """Scan bodies for the slot-pipelined traversal (ops/slot_pipe.py):
    ONE unified (8, Np) accumulator carried, chunk results added at their
    column offsets."""

    def add(buf, off, a):
        zero = jnp.zeros((), off.dtype)
        cur = jax.lax.dynamic_slice(buf, (zero, off), (8, c))
        return jax.lax.dynamic_update_slice(buf, cur + a, (zero, off))

    def slice_chunk(pos_, pjt_, v_, off):
        zero = jnp.zeros((), off.dtype)
        pa = jax.lax.dynamic_slice(pos_, (off, zero), (c, 3))
        pat = jax.lax.dynamic_slice(pjt_, (zero, off), (3, c))
        va = jax.lax.dynamic_slice(v_, (off, zero), (c, 8))
        return pa, pat, va

    def tri_body(carry, off):
        acc, pos_, pjt_, v_ = carry
        pa, pat, va = slice_chunk(pos_, pjt_, v_, off)
        return (add(acc, off, tri_call(pa, pat, va)), pos_, pjt_, v_), None

    def cross_body(carry, ab):
        acc, pos_, pjt_, v_ = carry
        pa, _, va = slice_chunk(pos_, pjt_, v_, ab[0])
        _, pbt, vb = slice_chunk(pos_, pjt_, v_, ab[1])
        aa, abuf = cross_call(pa, pbt, va, vb)
        acc = add(add(acc, ab[0], aa), ab[1], abuf)
        return (acc, pos_, pjt_, v_), None

    return tri_body, cross_body


def _slot_accumulate(pos, pjt, v, softening, tile, c, nc, np_, interpret,
                     split_w, mask_offdiag, fold=True):
    """Unified (8, Np) accumulator via the slot-pipelined traversal."""
    from mini_nbody_tpu.ops import slot_pipe

    tri_call = slot_pipe.build_tri_slot_call(
        softening, tile, c, interpret, split_w, mask_offdiag, fold)
    if nc == 1:
        return tri_call(pos, pjt, v)
    cross_call = slot_pipe.build_cross_slot_call(
        softening, tile, c, interpret, split_w, mask_offdiag)
    tri_body, cross_body = _make_slot_scan_bodies(tri_call, cross_call, c)
    carry = (jnp.zeros((8, np_), jnp.float32), pos, pjt, v)
    offs = jnp.arange(nc, dtype=jnp.int32) * c
    carry, _ = jax.lax.scan(tri_body, carry, offs)
    from mini_nbody_tpu.ops.hostseg import cross_pair_offsets

    pair_offs = jnp.asarray(cross_pair_offsets(nc, c), dtype=jnp.int32)
    carry, _ = jax.lax.scan(cross_body, carry, pair_offs)
    return carry[0]


def _accumulate(pos, pjt, v, softening, tile, c, nc, np_, interpret,
                split_w, mask_offdiag):
    """Raw (rows (Np,8), colsT (8,Np)) sums for one mask choice."""
    tri_call, cross_call = _build_calls(softening, tile, c, interpret,
                                        split_w, mask_offdiag)
    if nc == 1:
        return tri_call(pos, pjt, v, v)

    tri_body, cross_body = _make_scan_bodies(tri_call, cross_call, c)
    carry = (jnp.zeros((np_, 8), jnp.float32),
             jnp.zeros((8, np_), jnp.float32), pos, pjt, v)

    offs = jnp.arange(nc, dtype=jnp.int32) * c
    carry, _ = jax.lax.scan(tri_body, carry, offs)
    from mini_nbody_tpu.ops.hostseg import cross_pair_offsets

    pair_offs = jnp.asarray(cross_pair_offsets(nc, c), dtype=jnp.int32)
    carry, _ = jax.lax.scan(cross_body, carry, pair_offs)
    return carry[0], carry[1]


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "chunk", "interpret", "split_w",
                     "coincident", "traversal"),
)
def body_force_sym_mxu(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    chunk: int = 131072,
    interpret: bool = False,
    split_w: bool = False,
    coincident: str = "auto",
    traversal: str = "auto",
):
    """All-pairs forces via the symmetric MXU hybrid (module docstring).

    Mass mode costs the same as unit-mass: masses fold into the [m*p | m]
    matmul operands computed once outside the kernel. bf16-accumulate error
    class with the compensated operand split (~1e-4 median / ~1e-3 p99);
    split_w adds a compensating lo-pass for w too (~1e-5 class, measured
    rate in benchmarks/RESULTS.md); use backend='sym' for fp32-exact.

    coincident: how exactly-coincident DISTINCT bodies are kept at their
    exact zero mutual force (self pairs are always handled — the diagonal
    blocks mask unconditionally):
      * "auto" (default): an O(N log N) exact duplicate scan
        (any_coincident, ~0.3% of the pass at N=1M) picks between the
        masked and maskless kernels via lax.cond — output is bitwise
        identical to "masked" for EVERY input, at the maskless rate
        (+12.8% measured at N=1M) whenever no duplicates exist.
      * "masked": the per-pair d2 == 0 mask in every block (round-2
        behavior; no detector pass, one kernel pair compiled).
      * "fast": maskless kernels unconditionally — callers that
        guarantee distinct positions; duplicate inputs get garbage
        (accumulator swamping, module docstring).
    Under vmap the "auto" cond degrades to running both branches.
    """
    check_coincident(coincident)
    n = pos.shape[0]
    coincident = resolve_auto(coincident, n)
    if tile is None:
        # Single-chunk N: padding-aware scored tile (c = round_up(N, tile)
        # pads pair work quadratically — symmetric_force.padded_auto_tile);
        # multi-chunk N keeps the measured large-N default.
        if n <= chunk:
            from mini_nbody_tpu.ops.symmetric_force import padded_auto_tile

            tile = padded_auto_tile(n, 1024, interpret)
        else:
            tile = 1024
    if traversal not in ("auto", "slots", "band"):
        raise ValueError(f"unknown traversal {traversal!r}")
    tile, c, nc, np_ = _resolve_tiling(n, tile, chunk, interpret)
    traversal = resolve_traversal(traversal, nc)
    dup = any_coincident(pos) if coincident == "auto" else None
    pos, pjt, v = _pack(pos, mass, n, np_)

    if traversal == "slots":
        def run(mask_offdiag):
            return _slot_accumulate(pos, pjt, v, softening, tile, c, nc,
                                    np_, interpret, split_w, mask_offdiag)

        if coincident == "auto":
            acc = jax.lax.cond(dup, lambda: run(True), lambda: run(False))
        else:
            acc = run(coincident == "masked")
        return _combine(pos, acc.T)[:n]

    def run(mask_offdiag):
        return _accumulate(pos, pjt, v, softening, tile, c, nc, np_,
                           interpret, split_w, mask_offdiag)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    return _epilogue(pos, rows, colsT.T)[:n]


def _combine(pos, s):
    """Rectangular epilogue half: fold the [hi | lo] split columns and form
    F = sum(w*v)[:, :3] - p * sum(w*v)[:, 3]."""
    s = s[:, 0:4] + s[:, 4:8]
    return s[:, 0:3] - pos * s[:, 3:4]


def body_force_pair_mxu(
    pos_a,
    pos_b,
    mass_a=None,
    mass_b=None,
    softening: float = SOFTENING,
    tile: int = 1024,
    interpret: bool = False,
    split_w: bool = False,
    coincident: str = "masked",
):
    """Forces between two DISJOINT body sets via the MXU hybrid, each cross
    pair computed once: returns (F_on_a, F_on_b) with F_on_b the reactions.
    The MXU counterpart of symmetric_force.body_force_pair and the building
    block of the sym_mxu half-ring exchange (parallel/sharded.py): w is
    computed once per cross pair on the VPU, the row sums (forces on a) and
    reaction sums (forces on b) both ride the MXU with the compensated
    [vhi | vlo] operand split (module docstring). Masses optional (both or
    neither), folded into the matmul operands — mass mode costs nothing.

    Like the VPU pair kernel, the (8, Nb) reaction buffer lives whole in
    VMEM, which bounds a single launch to ring-shard-sized blocks (~512k
    bodies per side at 16 MB VMEM) — exactly the half-ring's use.

    coincident: "masked" (default — a body can legitimately appear in
    both sets at the same position under exotic shardings, and ring-hop
    shards are small enough that the mask cost stays modest), "fast"
    (maskless, for callers that guarantee no cross-set duplicates), or
    "auto" (lax.cond on an exact duplicate scan of the CONCATENATED
    sets — conservative: within-set duplicates also route to masked).
    """
    if (mass_a is None) != (mass_b is None):
        raise ValueError("body_force_pair_mxu needs both masses or neither")
    check_coincident(coincident)
    na, nb_n = pos_a.shape[0], pos_b.shape[0]
    coincident = resolve_auto(coincident, na + nb_n)
    t = min(tile, round_up(na, 8), round_up(nb_n, 8))
    if not interpret:
        # 128-align always (_resolve_tiling rationale).
        t = round_up(t, 128)
    na_p = round_up(na, t)
    nb_p = round_up(nb_n, t)
    dup = (any_coincident(jnp.concatenate([pos_a, pos_b]))
           if coincident == "auto" else None)
    pa, _, va = _pack(pos_a, mass_a, na, na_p)
    pb, pbt, vb = _pack(pos_b, mass_b, nb_n, nb_p)
    vm = pltpu.VMEM

    def run(mask):
        return _pair_call(softening, t, na_p, nb_p, interpret, split_w,
                          mask, vm)(pa, pbt, va, vb)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")

    return _combine(pa, rows)[:na], _combine(pb, colsT.T)[:nb_n]


def _pair_call(softening, t, na_p, nb_p, interpret, split_w, mask, vm):
    return pl.pallas_call(
        functools.partial(_cross_kernel, softening=float(softening),
                          tile=t, fast=fast_rsqrt_cube(softening),
                          split_w=split_w, mask=mask),
        grid=(na_p // t, nb_p // t),
        in_specs=[
            pl.BlockSpec((t, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, t), lambda i, j: (0, j), memory_space=vm),
            pl.BlockSpec((t, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((t, 8), lambda i, j: (j, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((t, 8), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((8, nb_p), lambda i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_p, 8), jnp.float32),
            jax.ShapeDtypeStruct((8, nb_p), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(na_p * nb_p, (na_p + nb_p) * 48),
    )


@functools.lru_cache(maxsize=16)
def _segmented_runners(softening, tile, c, interpret, split_w=False,
                       mask_offdiag=True):
    """Cached (per static config) jitted group runners — see
    symmetric_force._segmented_runners."""
    from mini_nbody_tpu.ops import hostseg

    tri_call, cross_call = _build_calls(softening, tile, c, interpret,
                                        split_w, mask_offdiag)
    tri_body, cross_body = _make_scan_bodies(tri_call, cross_call, c)
    return hostseg.make_runners(tri_body, cross_body)


@functools.lru_cache(maxsize=16)
def _segmented_runners_slots(softening, tile, c, interpret, split_w=False,
                             mask_offdiag=True):
    """Slot-pipelined counterpart of _segmented_runners (unified acc)."""
    from mini_nbody_tpu.ops import hostseg, slot_pipe

    tri_call = slot_pipe.build_tri_slot_call(
        softening, tile, c, interpret, split_w, mask_offdiag)
    cross_call = slot_pipe.build_cross_slot_call(
        softening, tile, c, interpret, split_w, mask_offdiag)
    tri_body, cross_body = _make_slot_scan_bodies(tri_call, cross_call, c)
    return hostseg.make_runners1(tri_body, cross_body)


def body_force_sym_mxu_ensemble(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    interpret: bool = False,
    split_w: bool = False,
    coincident: str = "auto",
    traversal: str = "auto",
):
    """Forces for B INDEPENDENT systems in one program: pos (B, N, 3)
    [, mass (B, N)] -> (B, N, 3), no cross-system interactions.

    Zero new kernels: each system occupies exactly ONE chunk of the
    symmetric traversal (c = round_up(N, tile), per-system FAR pads), and
    running only the self-chunk (tri) diagonal-band scan while SKIPPING
    every cross-chunk pass IS the block-diagonal ensemble force. Each
    system's result is bitwise identical to a standalone
    ``body_force_sym_mxu(pos[b], mass[b], tile=tile, chunk=c)`` call
    (same packing, same kernel, same traversal — tested).

    coincident='auto' scans WITHIN each system only (vmapped
    any_coincident): two different systems may legitimately hold bodies
    at identical positions (e.g. perturbation ensembles) without ever
    producing a hot d2 == 0 pair, since cross-system pairs are never
    computed.

    The TPU-native ensemble story (parameter sweeps, initial-condition
    batches): B systems of N bodies run at the big-N streamed rate
    because the device sees one (B*c)-body program, not B launches.
    """
    check_coincident(coincident)
    if pos.ndim != 3:
        raise ValueError(f"ensemble pos must be (B, N, 3), got {pos.shape}")
    if traversal not in ("auto", "slots", "band"):
        raise ValueError(f"unknown traversal {traversal!r}")
    return _ensemble_impl(pos, mass, softening=float(softening), tile=tile,
                          interpret=interpret, split_w=split_w,
                          coincident=coincident, traversal=traversal)


def ensemble_tiling(n, tile, interpret):
    """(tile, c) the ensemble driver resolves: one chunk per system —
    _resolve_tiling with chunk = n, the single source of the alignment
    rules (also consumed by sim.simulate_ensemble's watchdog pacing).
    Default tile minimizes padded active-slot work instead of the
    streamed kernels' flat 1024 (per-system padding is quadratic here —
    rationale and measurements: symmetric_force.padded_auto_tile)."""
    if tile is None:
        from mini_nbody_tpu.ops.symmetric_force import padded_auto_tile

        tile = padded_auto_tile(n, 1024, interpret)
    t, c, _, _ = _resolve_tiling(n, tile, n, interpret)
    return t, c


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret", "split_w",
                     "coincident", "traversal"),
)
def _ensemble_impl(pos, mass, *, softening, tile, interpret, split_w,
                   coincident, traversal="auto"):
    b, n = pos.shape[0], pos.shape[1]
    t, c = ensemble_tiling(n, tile, interpret)
    traversal = resolve_traversal(traversal, 1)
    coincident = resolve_auto(coincident, n)
    if coincident == "auto":
        dup = jnp.any(jax.vmap(any_coincident)(pos))
    # Per-system FAR pads: inert exactly as in the single-system kernel
    # (pad-pad pairs live in the always-masked diagonal blocks of their
    # own chunk; cross-chunk passes never run here).
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, c - n), (0, 0)),
                    constant_values=FAR).reshape(b * c, 3)
    m_p = None
    if mass is not None:
        m_p = jnp.pad(mass.astype(jnp.float32),
                      ((0, 0), (0, c - n))).reshape(b * c)
    flat, pjt, v = _pack(pos_p, m_p, b * c, b * c)

    if traversal == "slots":
        from mini_nbody_tpu.ops import slot_pipe

        def run_s(mask_offdiag):
            call = slot_pipe.build_tri_slot_ensemble(
                softening, t, c, b, interpret, split_w, mask_offdiag)
            return call(flat, pjt, v)

        if coincident == "auto":
            acc = jax.lax.cond(
                dup, lambda: run_s(True), lambda: run_s(False))
        else:
            acc = run_s(coincident == "masked")
        return _combine(flat, acc.T).reshape(b, c, 3)[:, :n]

    def run(mask_offdiag):
        call = _build_tri_ensemble(softening, t, c, b, interpret, split_w,
                                   mask_offdiag)
        return call(flat, pjt, v, v)

    if coincident == "auto":
        rows, colsT = jax.lax.cond(
            dup, lambda: run(True), lambda: run(False))
    else:
        rows, colsT = run(coincident == "masked")
    return _epilogue(flat, rows, colsT.T).reshape(b, c, 3)[:, :n]


def body_force_sym_mxu_segmented(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int = 1024,
    chunk: int = 131072,
    interpret: bool = False,
    pairs_per_dispatch: float = 4e12,
    progress=None,
    split_w: bool = False,
    coincident: str = "auto",
    traversal: str = "auto",
):
    """body_force_sym_mxu driven as multiple host dispatches for N where one
    force pass exceeds the execution watchdog (shared driver + crash-bound
    rationale: ops/hostseg.py). Same kernels and unit order as the
    one-program path (few-ulp diffs from XLA dot reassociation only).
    coincident as in body_force_sym_mxu, except 'auto' resolves the
    duplicate scan on the HOST (this driver is host-stepped anyway), so
    only one kernel pair is compiled."""
    from mini_nbody_tpu.ops import hostseg

    check_coincident(coincident)
    if traversal not in ("auto", "slots", "band"):
        raise ValueError(f"unknown traversal {traversal!r}")
    coincident = resolve_auto(coincident, pos.shape[0])
    if coincident == "auto":
        import numpy as _np

        mask_offdiag = bool(_np.asarray(_any_coincident_jit(pos)))
    else:
        mask_offdiag = coincident == "masked"
    n = pos.shape[0]
    tile, c, nc, np_ = _resolve_tiling(n, tile, chunk, interpret)
    traversal = resolve_traversal(traversal, nc)
    pos, pjt, v = _pack(pos, mass, n, np_)
    if traversal == "slots":
        run_tri, run_cross = _segmented_runners_slots(
            float(softening), tile, c, interpret, split_w, mask_offdiag)
        (acc,) = hostseg.drive(
            run_tri, run_cross, (jnp.zeros((8, np_), jnp.float32),),
            (pos, pjt, v), nc, c,
            pairs_per_dispatch=pairs_per_dispatch, progress=progress)
        return _combine(pos, acc.T)[:n]
    run_tri, run_cross = _segmented_runners(
        float(softening), tile, c, interpret, split_w, mask_offdiag)

    accs = (jnp.zeros((np_, 8), jnp.float32),
            jnp.zeros((8, np_), jnp.float32))
    rows_total, cols_total = hostseg.drive(
        run_tri, run_cross, accs, (pos, pjt, v), nc, c,
        pairs_per_dispatch=pairs_per_dispatch, progress=progress)
    return _epilogue(pos, rows_total, cols_total.T)[:n]
