"""Symmetric (Newton's-third-law) force kernel: each pair computed once.

The direct kernel computes every ordered pair (~23 VPU-op equivalents per
interaction, measured). Forces are antisymmetric (F_ij = -F_ji), so each
unordered pair can be computed once and scattered to both bodies — the row
body via lane-axis sums, the reaction on the column body via sublane-axis
sums of the same d*w products.

The obstacle on TPU is accumulation layout: Pallas only supports output
accumulation over *consecutive* grid revisits, and no triangle traversal
keeps both the row-side and column-side outputs consecutive (measured:
non-consecutive revisits see stale data). Solution: make BOTH accumulators
whole-array VMEM outputs with *constant* index maps (trivially consecutive),
which bounds the body count per kernel launch to what VMEM holds
(2 x 12*C bytes + pair temporaries). Larger N is decomposed into chunks of
``chunk`` bodies at the XLA level:

  * self-chunk kernel: diagonal-band traversal of the chunk's block triangle
    — grid (i, d) computes block (i, (i+d) mod nb), covering each unordered
    block pair exactly once with NO skipped steps (only the wrap band at
    d = nb/2 is half-masked when nb is even); i outer keeps the rows output
    on the consecutive-revisit accumulation path;
  * cross-chunk kernel (a < b): plain rectangular grid, rows accumulate to
    chunk a (standard blocked output, consecutive along the inner axis),
    reactions accumulate to chunk b's constant-index buffer.

  force = sum of per-chunk row pieces + transposed column pieces (cheap XLA).

Mass mode: per-body masses need m_j on the row side and m_i on the column
side — d*w computed once per dimension, then scaled both ways (~9 extra VPU
ops per unordered pair incl. a displacement recompute that keeps the live
VMEM set at 3 (T,T) buffers), far cheaper than the ~14-op distance+rsqrt
recomputation the symmetry saves. Measured on v5e at N=1M: 236.9 GInter/s
fp32-exact (tile=896) vs 173 for the direct kernel with masses and 242 for
mxu-bf16 (which carries ~3e-3 force error) — the fastest exact-fp32 mass
path. The mass column rides in the position block (packed (T,4) / (4,T)),
generalizing the reference's accumulate ``src/fxyz.vhd:120-127`` which has
no mass factor. Position tails use far-padding (w underflows to exactly 0)
with zero-mass padding in mass mode. Physics otherwise identical to
pallas_force.py (self pairs computed-not-skipped, contributing exactly 0 —
SURVEY.md §0).
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


def _pair_block(pi, pjt, softening, fast, masses):
    """Row sums f (T,3) and column sums g (3,T) of the pair products.

    Unit-mass: pi (T,3) x pjt (3,T), sums of d*w. Mass mode: pi (T,4) /
    pjt (4,T) with the mass packed as the 4th component; rows are weighted
    by m_j, columns by m_i (d*w computed once, scaled twice)."""
    xi, yi, zi = pi[:, 0:1], pi[:, 1:2], pi[:, 2:3]
    dx = pjt[0:1, :] - xi  # (T, T)
    dy = pjt[1:2, :] - yi
    dz = pjt[2:3, :] - zi
    r2 = dx * dx + dy * dy + (dz * dz + jnp.asarray(softening, dx.dtype))
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    if masses:
        # VMEM-liveness-shaped: recompute each displacement component (one
        # subtract) instead of holding dx/dy/dz across both reductions, so
        # only w stays persistent (+ one d/t buffer + one product temp =
        # 3 live (T,T) buffers vs 5 for the straightforward form, which
        # blows the 16 MB budget at tile=1024). ~+9 VPU ops per unordered
        # pair vs unit-mass — still far below the ~14-op recomputation the
        # pair symmetry saves.
        mj = pjt[3:4, :]  # (1, T)
        mi = pi[:, 3:4]   # (T, 1)
        fs, gs = [], []
        for c, pc in ((0, xi), (1, yi), (2, zi)):
            t = (pjt[c:c + 1, :] - pc) * w
            fs.append(jnp.sum(t * mj, axis=1, keepdims=True))
            gs.append(jnp.sum(t * mi, axis=0, keepdims=True))
        return jnp.concatenate(fs, axis=1), jnp.concatenate(gs, axis=0)
    dxw = dx * w
    dyw = dy * w
    dzw = dz * w
    f = jnp.concatenate(
        [jnp.sum(dxw, axis=1, keepdims=True),
         jnp.sum(dyw, axis=1, keepdims=True),
         jnp.sum(dzw, axis=1, keepdims=True)], axis=1)
    g = jnp.concatenate(
        [jnp.sum(dxw, axis=0, keepdims=True),
         jnp.sum(dyw, axis=0, keepdims=True),
         jnp.sum(dzw, axis=0, keepdims=True)], axis=0)
    return f, g


def _tri_kernel(pi_ref, pjt_ref, rows_ref, colsT_ref, *, softening, tile,
                fast, nb, masses, axis_off=0):
    """Self-chunk diagonal-band step: block (i, (i+d) mod nb) at grid (i, d).

    i is the OUTER grid dim so the (tile,3) rows block accumulates over
    consecutive d steps (the supported Pallas revisit pattern); the reaction
    buffer is the whole-chunk (3,C) constant-index output — kept (3,C) and
    not (C,3) because VMEM lane-pads the minor dim to 128 (a (C,3) buffer
    would materialize as C x 128 lanes = 64 MB at C=131072; (3,C) tiles to
    4 sublanes = 2 MB).

    axis_off=1 runs the same body under the batched-ensemble grid
    (system, i, d) — see sym_mxu_force._tri_kernel.
    """
    i = pl.program_id(axis_off)
    d = pl.program_id(axis_off + 1)
    jg = jax.lax.rem(i + d, jnp.int32(nb))

    @pl.when(jnp.logical_and(d == 0, i == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    # nb even: the d == nb/2 band pairs each block with its antipode twice;
    # keep only the first half.
    active = jnp.logical_or(d * 2 != nb, i * 2 < nb)

    @pl.when(active)
    def _work():
        f, g = _pair_block(pi_ref[:], pjt_ref[:], softening, fast, masses)

        @pl.when(d == 0)
        def _rows_init():
            rows_ref[:] = f

        @pl.when(d > 0)
        def _rows_acc():
            rows_ref[:] = rows_ref[:] + f

        @pl.when(d > 0)  # diagonal blocks: row sums already cover both orders
        def _cols():
            cj = pl.ds(jg * tile, tile)
            colsT_ref[:, cj] = colsT_ref[:, cj] - g

    # Inactive steps in the masked half-band still own a rows block visit;
    # rows content is preserved (no write), which is correct: those i rows
    # were fully accumulated by earlier d steps of the same row sweep.


def _cross_kernel(pi_ref, pjt_ref, rows_ref, colsT_ref, *, softening, tile,
                  fast, masses):
    """Cross-chunk step (i in chunk a, j in chunk b, a != b): all blocks active."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _zero_cols():
        colsT_ref[:] = jnp.zeros_like(colsT_ref)

    f, g = _pair_block(pi_ref[:], pjt_ref[:], softening, fast, masses)

    @pl.when(j == 0)
    def _rows_init():
        rows_ref[:] = f

    @pl.when(j > 0)
    def _rows_acc():
        rows_ref[:] = rows_ref[:] + f

    cj = pl.ds(j * tile, tile)
    colsT_ref[:, cj] = colsT_ref[:, cj] - g


def _common_params(pairs, rows_bytes, cols_bytes, ndims=2):
    return dict(
        compiler_params=_CompilerParams(
            dimension_semantics=("arbitrary",) * ndims,
        ),
        cost_estimate=pl.CostEstimate(
            flops=22 * pairs,
            bytes_accessed=rows_bytes + cols_bytes,
            transcendentals=pairs,
        ),
    )


def _resolve_tiling(n, tile, chunk, masses, interpret):
    """(tile, c, nc, np_) for the chunked symmetric decomposition."""
    if masses:
        # Mass mode keeps one more (T,T) temporary live (w + d/t + product);
        # tile=1024 exceeds the 16 MB VMEM budget, 896 is the largest fit
        # (measured 236.9 GInter/s at N=1M on v5e vs 222.8 at 768).
        tile = min(tile, 896)
    tile = min(tile, round_up(n, 8))
    # Mosaic requires the (k, tile) block's lane dim to be a multiple of 128
    # unless the block covers the whole array; interpret mode is laxer.
    if not interpret and tile < round_up(n, 8):
        tile = round_up(tile, 128)
    # Equal tile-aligned chunks (scan needs uniform shapes); padding waste is
    # at most nc*tile bodies.
    nc = max(1, -(-n // chunk))
    c = round_up(-(-n // nc), tile)
    return tile, c, nc, nc * c


def _pack(pos, mass, n, np_):
    """Pad to np_ (FAR positions, zero masses) and pack the mass column."""
    pos = pos.astype(jnp.float32)
    if np_ != n:
        pos = jnp.pad(pos, ((0, np_ - n), (0, 0)), constant_values=FAR)
    if mass is not None:
        m = mass.astype(jnp.float32)
        if np_ != n:
            m = jnp.pad(m, (0, np_ - n))  # zero-mass tails: doubly inert
        pos = jnp.concatenate([pos, m[:, None]], axis=1)  # (Np, 4)
    return pos


def _build_calls(softening, tile, c, k, interpret):
    """The two Mosaic kernels for chunk size c (shapes fixed by (tile, c))."""
    nb = c // tile
    nd = nb // 2 + 1
    fast = fast_rsqrt_cube(softening)
    masses = k == 4
    vm = pltpu.VMEM
    tri_call = pl.pallas_call(
        functools.partial(_tri_kernel, softening=float(softening), tile=tile,
                          fast=fast, nb=nb, masses=masses),
        grid=(nb, nd),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((k, tile),
                         lambda i, d: (0, jax.lax.rem(i + d, jnp.int32(nb))),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 3), lambda i, d: (i, 0), memory_space=vm),
            pl.BlockSpec((3, c), lambda i, d: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(nb * nd * tile * tile, c * 24, c * 24),
    )
    cross_call = pl.pallas_call(
        functools.partial(_cross_kernel, softening=float(softening),
                          tile=tile, fast=fast, masses=masses),
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((k, tile), lambda i, j: (0, j), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 3), lambda i, j: (i, 0), memory_space=vm),
            pl.BlockSpec((3, c), lambda i, j: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(c * c, c * 24, c * 24),
    )
    return tri_call, cross_call


def _make_scan_bodies(tri_call, cross_call, c, k):
    """Scan bodies accumulating (rows_total (Np,3), cols_total (3,Np))."""

    def add_rows(buf, off, r):
        zero = jnp.zeros((), off.dtype)
        cur = jax.lax.dynamic_slice(buf, (off, zero), (c, 3))
        return jax.lax.dynamic_update_slice(buf, cur + r, (off, zero))

    def add_cols(buf, off, ct):
        zero = jnp.zeros((), off.dtype)
        cur = jax.lax.dynamic_slice(buf, (zero, off), (3, c))
        return jax.lax.dynamic_update_slice(buf, cur + ct, (zero, off))

    def tri_body(carry, off):
        rows, cols, pos, pjt = carry
        zero = jnp.zeros((), off.dtype)
        pa = jax.lax.dynamic_slice(pos, (off, zero), (c, k))
        pat = jax.lax.dynamic_slice(pjt, (zero, off), (k, c))
        r, ct = tri_call(pa, pat)
        return (add_rows(rows, off, r), add_cols(cols, off, ct), pos, pjt), None

    def cross_body(carry, ab):
        rows, cols, pos, pjt = carry
        zero = jnp.zeros((), ab.dtype)
        pa = jax.lax.dynamic_slice(pos, (ab[0], zero), (c, k))
        pbt = jax.lax.dynamic_slice(pjt, (zero, ab[1]), (k, c))
        r, ct = cross_call(pa, pbt)
        return (add_rows(rows, ab[0], r), add_cols(cols, ab[1], ct), pos, pjt), None

    return tri_body, cross_body


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "chunk", "interpret"),
)
def body_force_symmetric(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    chunk: int = 131072,
    interpret: bool = False,
):
    """All-pairs forces on pos (N,3), each pair computed once. mass=None is
    the unit-mass fast path; (N,) masses ride as a packed 4th component
    (rows weighted by m_j, reactions by m_i — module docstring).

    tile=None resolves the measured large-N default (1024; mass mode caps
    at 896) when N spans multiple chunks, and the padding-aware score
    (padded_auto_tile) for single-chunk N — where c = round_up(N, tile)
    pads the pair work QUADRATICALLY (mass mode at N=1024 padded
    896 -> 1792, 3.06x; measured 2.7x force-pass speedup from the scored
    tile, benchmarks/probe_resident_ensemble.py).

    N beyond one chunk is decomposed into nc equal tile-aligned chunks and
    driven by two lax.scan loops (one over self chunks, one over cross chunk
    pairs), so compile cost is constant in N — two Mosaic kernels total.
    One XLA program; for N large enough that a single force pass would trip
    the execution watchdog (N >~ 4M on the axon tunnel), use
    body_force_symmetric_segmented.
    """
    n = pos.shape[0]
    masses = mass is not None
    if tile is None:
        tile = (padded_auto_tile(
                    n, 896 if masses else 1024, interpret,
                    eff=_EFF_FP32_MASS if masses else _EFF_FP32_UNIT)
                if n <= chunk else 1024)
    tile, c, nc, np_ = _resolve_tiling(n, tile, chunk, masses, interpret)
    pos = _pack(pos, mass, n, np_)
    k = pos.shape[1]  # 3 unit-mass, 4 packed mass
    pjt = pos.T  # (k, Np)
    tri_call, cross_call = _build_calls(softening, tile, c, k, interpret)

    if nc == 1:
        rows, colsT = tri_call(pos, pjt)
        return (rows + colsT.T)[:n]

    tri_body, cross_body = _make_scan_bodies(tri_call, cross_call, c, k)
    carry = (jnp.zeros((np_, 3), jnp.float32),
             jnp.zeros((3, np_), jnp.float32), pos, pjt)

    offs = jnp.arange(nc, dtype=jnp.int32) * c
    carry, _ = jax.lax.scan(tri_body, carry, offs)
    from mini_nbody_tpu.ops.hostseg import cross_pair_offsets

    pair_offs = jnp.asarray(cross_pair_offsets(nc, c), dtype=jnp.int32)
    carry, _ = jax.lax.scan(cross_body, carry, pair_offs)

    rows_total, cols_total = carry[0], carry[1]
    out = rows_total + cols_total.T
    return out[:n]


def body_force_symmetric_ensemble(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int | None = None,
    interpret: bool = False,
):
    """fp32-exact forces for B INDEPENDENT systems: pos (B, N, 3)
    [, mass (B, N)] -> (B, N, 3), no cross-system interactions.

    The fp32 counterpart of sym_mxu_force.body_force_sym_mxu_ensemble:
    each system is one chunk of the symmetric traversal (per-system FAR
    pads) and only the self-chunk scan runs — zero new kernels, each
    system bitwise equal to a standalone ``body_force_symmetric(pos[b],
    mass[b], tile=tile, chunk=c)`` call. No coincident flag: this kernel
    computes w*(p_j - p_i) directly, so coincident pairs are exactly zero
    with no mask to skip."""
    if pos.ndim != 3:
        raise ValueError(f"ensemble pos must be (B, N, 3), got {pos.shape}")
    return _ensemble_impl(pos, mass, softening=float(softening), tile=tile,
                          interpret=interpret)


#: Relative per-slot body efficiency per tile for the padded-tile score —
#: only relative magnitudes matter; calibrated per kernel class from
#: on-chip rates (benchmarks/probe_resident_ensemble.py + the resident
#: tile shmoo). The mxu hybrid's few-op body amortizes small (T,T) vector
#: ops worst-of-the-middle; the fp32 UNIT body falls off steepest
#: (measured streamed 1024 -> 512: 346 -> ~196 G/s); the fp32 MASS body
#: (~31 ops/slot) is nearly flat (measured eff(512) ~= 0.9 x eff(896) at
#: B=16/N=4096).
_EFF_MXU = {1024: 1.0, 896: 0.95, 768: 0.92, 640: 0.86, 512: 0.78,
            384: 0.65, 256: 0.50, 128: 0.27}
_EFF_FP32_UNIT = {1024: 1.0, 896: 0.93, 768: 0.71, 640: 0.64, 512: 0.57,
                  384: 0.45, 256: 0.33, 128: 0.17}
_EFF_FP32_MASS = {896: 1.0, 768: 0.98, 640: 0.95, 512: 0.92,
                  384: 0.80, 256: 0.65, 128: 0.40}


def padded_auto_tile(n, cap, interpret, eff=None):
    """Default ensemble tile: minimize active-slot work / body efficiency.

    A fixed big tile pads each system's chunk c = round_up(n, t)
    QUADRATICALLY (the streamed drivers only ever pad by <= one tile per
    131k chunk, so the flat 1024 default was fine there): fp32 mass mode
    at n=1024 resolved t=896 -> c=1792, 3.06x the pair work, measured
    21.6 vs the fixed kernel's 49.2 G pairs/s at B=64
    (benchmarks/probe_resident_ensemble.py). Score per candidate =
    active_slots(nb) * t^2 / eff[t], where active_slots counts the
    diagonal-band grid's non-gated (T,T) blocks (even-nb half-bands are
    pl.when-gated and ~free; an nb=1 system pays its full t^2 ordered
    block). A whole-array candidate t = round_up(n, 8) (capped) keeps
    small systems on EXACTLY the standalone single-tile geometry —
    bitwise-stable vs standalone calls.

    eff: per-tile relative body efficiency table (_EFF_MXU default;
    symmetric fp32 passes _EFF_FP32_UNIT/_EFF_FP32_MASS — the curves
    differ enough to flip choices: fp32-unit N=1024 keeps 1024, fp32-mass
    N=1024 drops to 512)."""
    table = eff if eff is not None else _EFF_MXU

    def score(t):
        c = round_up(n, t)
        nb = c // t
        nd = nb // 2 + 1
        active = nb * nd - (nb // 2 if nb % 2 == 0 else 0)
        # interpolate efficiency for off-table whole-array tiles
        e = table.get(t)
        if e is None:
            ts = sorted(table)
            lo = max((x for x in ts if x <= t), default=ts[0])
            hi = min((x for x in ts if x >= t), default=ts[-1])
            e = (table[lo] if lo == hi else
                 table[lo] + (table[hi] - table[lo]) * (t - lo) / (hi - lo))
        return float(active) * t * t / e

    whole = min(cap, round_up(n, 8))
    if not interpret and whole < round_up(n, 8):
        whole = round_up(whole, 128)
    cands = {whole}
    cands.update(t for t in table if t <= min(cap, round_up(n, 8)))
    return min(cands, key=lambda t: (score(t), -t))


def ensemble_tiling(n, tile, masses, interpret):
    """(tile, c) the fp32 ensemble driver resolves: one chunk per system —
    _resolve_tiling with chunk = n (keeps the mass-mode 896 VMEM cap and
    alignment rules in ONE place; also consumed by sim.simulate_ensemble's
    watchdog pacing). Default tile is the padding-aware score
    (padded_auto_tile), not the streamed kernels' flat 1024."""
    if tile is None:
        tile = padded_auto_tile(
            n, 896 if masses else 1024, interpret,
            eff=_EFF_FP32_MASS if masses else _EFF_FP32_UNIT)
    t, c, _, _ = _resolve_tiling(n, tile, n, masses, interpret)
    return t, c


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret"),
)
def _ensemble_impl(pos, mass, *, softening, tile, interpret):
    b, n = pos.shape[0], pos.shape[1]
    masses = mass is not None
    t, c = ensemble_tiling(n, tile, masses, interpret)
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, 0), (0, c - n), (0, 0)),
                    constant_values=FAR).reshape(b * c, 3)
    m_p = None
    if masses:
        m_p = jnp.pad(mass.astype(jnp.float32),
                      ((0, 0), (0, c - n))).reshape(b * c)
    flat = _pack(pos_p, m_p, b * c, b * c)
    k = flat.shape[1]
    rows, colsT = _build_tri_ensemble(softening, t, c, k, b,
                                      interpret)(flat, flat.T)
    return (rows + colsT.T).reshape(b, c, 3)[:, :n]


def _build_tri_ensemble(softening, tile, c, k, b, interpret):
    """ONE pallas_call for B independent systems: the tri kernel under a
    leading system axis (rationale + HBM-traffic numbers:
    sym_mxu_force._build_tri_ensemble, the bf16-class twin)."""
    nb = c // tile
    nd = nb // 2 + 1
    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    return pl.pallas_call(
        functools.partial(_tri_kernel, softening=float(softening), tile=tile,
                          fast=fast, nb=nb, masses=k == 4, axis_off=1),
        grid=(b, nb, nd),
        in_specs=[
            pl.BlockSpec((tile, k), lambda s, i, d: (s * nb + i, 0),
                         memory_space=vm),
            pl.BlockSpec(
                (k, tile),
                lambda s, i, d: (
                    0, s * nb + jax.lax.rem(i + d, jnp.int32(nb))),
                memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((tile, 3), lambda s, i, d: (s * nb + i, 0),
                         memory_space=vm),
            pl.BlockSpec((3, c), lambda s, i, d: (0, s), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * c, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, b * c), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(b * nb * nd * tile * tile, b * c * 24, b * c * 24,
                         ndims=3),
    )


def body_force_symmetric_segmented(
    pos,
    mass=None,
    softening: float = SOFTENING,
    tile: int = 1024,
    chunk: int = 131072,
    interpret: bool = False,
    pairs_per_dispatch: float = 4e12,
    progress=None,
):
    """body_force_symmetric driven as multiple host dispatches, for N where
    one force pass exceeds the execution watchdog (config 5's N=16M point:
    ~2.8e14 pairs ~ 13 min of device time in one XLA program).

    Chunk-pair work units are grouped so each dispatch stays under
    `pairs_per_dispatch` (see ops/hostseg.py for the shared driver and the
    measured worker-crash bound that sets the 4e12 default); the (rows,
    cols) accumulators are donated between dispatches while the packed
    positions — which may alias the caller's arrays — are not. The group
    runners are lru-cached per static config so repeated calls (e.g. every
    step of a host-stepped huge-N trajectory) reuse the compiled programs.
    `progress(done_units, total_units)` is called after every dispatch.
    """
    from mini_nbody_tpu.ops import hostseg

    n = pos.shape[0]
    masses = mass is not None
    tile, c, nc, np_ = _resolve_tiling(n, tile, chunk, masses, interpret)
    pos = _pack(pos, mass, n, np_)
    k = pos.shape[1]
    pjt = pos.T
    run_tri, run_cross = _segmented_runners(
        float(softening), tile, c, k, interpret)

    accs = (jnp.zeros((np_, 3), jnp.float32),
            jnp.zeros((3, np_), jnp.float32))
    rows_total, cols_total = hostseg.drive(
        run_tri, run_cross, accs, (pos, pjt), nc, c,
        pairs_per_dispatch=pairs_per_dispatch, progress=progress)
    return (rows_total + cols_total.T)[:n]


@functools.lru_cache(maxsize=16)
def _segmented_runners(softening, tile, c, k, interpret):
    """Cached (per static config) jitted group runners — jit caches by
    function identity, so these must not be rebuilt per force call."""
    from mini_nbody_tpu.ops import hostseg

    tri_call, cross_call = _build_calls(softening, tile, c, k, interpret)
    tri_body, cross_body = _make_scan_bodies(tri_call, cross_call, c, k)
    return hostseg.make_runners(tri_body, cross_body)


@functools.partial(
    jax.jit,
    static_argnames=("softening", "tile", "interpret"),
)
def body_force_pair(
    pos_a,
    pos_b,
    mass_a=None,
    mass_b=None,
    softening: float = SOFTENING,
    tile: int = 1024,
    interpret: bool = False,
):
    """Forces between two DISJOINT body sets, each cross pair computed once:
    returns (F_on_a, F_on_b) with F_on_b the reactions. Masses optional
    (both or neither): F_on_a weighted by m_b, F_on_b by m_a.

    The building block of the symmetric half-ring exchange
    (parallel/sharded.py): a traveling position packet accumulates its
    reaction forces here while the resident shard accumulates its rows.
    Intra-set pairs are NOT computed (use body_force_symmetric for those).
    """
    if (mass_a is None) != (mass_b is None):
        raise ValueError("body_force_pair needs both masses or neither")
    masses = mass_a is not None
    na, nb_n = pos_a.shape[0], pos_b.shape[0]
    pos_a = pos_a.astype(jnp.float32)
    pos_b = pos_b.astype(jnp.float32)

    if masses:
        tile = min(tile, 896)  # VMEM budget — see body_force_symmetric
    tile_a = min(tile, round_up(na, 8))
    tile_b = min(tile, round_up(nb_n, 8))
    if not interpret:
        if tile_a < round_up(na, 8):
            tile_a = round_up(tile_a, 128)
        if tile_b < round_up(nb_n, 8):
            tile_b = round_up(tile_b, 128)
    tile_ab = min(tile_a, tile_b)
    na_p = round_up(na, tile_ab)
    nb_p = round_up(nb_n, tile_ab)
    if na_p != na:
        pos_a = jnp.pad(pos_a, ((0, na_p - na), (0, 0)), constant_values=FAR)
    if nb_p != nb_n:
        pos_b = jnp.pad(pos_b, ((0, nb_p - nb_n), (0, 0)), constant_values=FAR)
    if masses:
        ma = mass_a.astype(jnp.float32)
        mb = mass_b.astype(jnp.float32)
        if na_p != na:
            ma = jnp.pad(ma, (0, na_p - na))
        if nb_p != nb_n:
            mb = jnp.pad(mb, (0, nb_p - nb_n))
        pos_a = jnp.concatenate([pos_a, ma[:, None]], axis=1)
        pos_b = jnp.concatenate([pos_b, mb[:, None]], axis=1)
    k = pos_a.shape[1]
    pbt = pos_b.T

    fast = fast_rsqrt_cube(softening)
    rows, colsT = pl.pallas_call(
        functools.partial(_cross_kernel, softening=float(softening),
                          tile=tile_ab, fast=fast, masses=masses),
        grid=(na_p // tile_ab, nb_p // tile_ab),
        in_specs=[
            pl.BlockSpec((tile_ab, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_ab), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_ab, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, nb_p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((na_p, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, nb_p), jnp.float32),
        ],
        interpret=interpret,
        **_common_params(na_p * nb_p, na_p * 24, nb_p * 24),
    )(pos_a, pbt)
    return rows[:na], colsT.T[:nb_n]
