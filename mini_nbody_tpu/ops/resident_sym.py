"""Multi-step fused symmetric resident kernel: the whole trajectory runs in
ONE Pallas launch with the full body state resident in VMEM — in BOTH
precision classes (fp32-exact VPU and bf16-accumulate MXU hybrid) and for
BOTH integrators (leapfrog rides the same kernel, see below).

Why a second resident kernel (vs ops/resident.py):

* **Transposed state.** The original stores state as wide (N, 8) rows: VMEM
  lane-pads the minor dim to 128, costing 512 B/body and capping the
  resident regime at N<=8192. Stored transposed as (8, N) — 8 sublanes
  exactly, bodies along lanes — state is 32 B/body, lifting the cap to
  65,536: double the reference FPGA's own whole envelope (N<=32,767 via its
  RAM depth, ``src/top_level.vhd:45-46``), where its pitch was precisely
  low fixed overhead per pass (~145 cycles, SURVEY §6).
* **Symmetric traversal.** The original computes every ordered pair (~23
  VPU ops each); this kernel walks the diagonal-band schedule of
  ops/symmetric_force.py (each unordered pair ONCE, rows + reactions),
  halving VPU work — and in mxu mode moves all products/reductions onto
  the matrix unit exactly like ops/sym_mxu_force.py (w once per pair on
  the VPU, row sums and reaction sums as (8,T)x(T,T) matmuls with the
  compensated bf16 [hi|lo] operand split).
* **Both accumulators transposed too.** Row sums and reaction sums land in
  (8, N) whole-buffer VMEM scratch (constant-index accumulation — the only
  revisit-safe pattern besides consecutive same-block writes; CLAUDE.md).
  The transposed orientation makes every integrate-phase op row-wise, and
  the only transposes anywhere are one (T,T)x(8,T) MXU identity matmul per
  i-tile per step (column operands for the pair-distance broadcast) and,
  in VPU mode, one per block for the row-sum pack.

Grid: ``(steps, nb + n_int, nd)`` with nd = nb//2 + 1 diagonal bands. For
i < nb the slot computes force block (i, (i+d) mod nb); the trailing n_int
i-slots integrate the nb state blocks (Euler, fused in-kernel) once every
band of the step has accumulated — the in-VMEM analog of the reference
keeping state in shared RAM across passes (``src/top_level.vhd:180-186``),
with the host's per-pass polling round-trip gone entirely. State is
double-buffered (read step s from parity buffer, write the other) so later
force blocks never see half-integrated positions; the initial state enters
by input/output aliasing (no copy, no third buffer).

Leapfrog needs NO second kernel: KDK with the two half-kicks merged is the
Euler update on staggered velocities — v_{k+1/2} = v_{k-1/2} + dt*a(x_k),
x_{k+1} = x_k + dt*v_{k+1/2}. ``simulate_resident_sym_leapfrog`` offsets
v by -dt/2*a0 with one streamed force pass, runs this kernel, and closes
with the matching +dt/2 half-kick (one more streamed pass): steps+1 force
evaluations total, identical to the streamed leapfrog loop, equal up to
fp32 reassociation of the merged kicks.

VMEM at the N=65,536 cap (tile=512, mxu): state 2x2 MB + accumulators
2x2 MB + identity 1 MB + (T,T) weight temporaries ~2-3 MB + (T,8) i-tile
~0.25 MB ~= 12-13 MB of the ~16 MB budget (compile-verified on chip).
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

#: VMEM bound: two (8, N) state buffers + two (8, N) accumulators at
#: 32 B/body each, plus tile temporaries (module docstring).
RESIDENT_SYM_MAX_N = 65536


def _weights(src, pw_ref, ci, cj, softening, fast):
    """Masked pair-weight block w (T_i, T_j) from the transposed j-block and
    the pre-transposed i-tile (pw_ref, built once per (step, i))."""
    pi = pw_ref[:]  # (T, 8) columns of the i-tile
    bj = src[:, cj]  # (8, T) rows of the j-block
    dx = bj[0:1, :] - pi[:, 0:1]
    dy = bj[1:2, :] - pi[:, 1:2]
    dz = bj[2:3, :] - pi[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    r2 = d2 + jnp.asarray(softening, jnp.float32)
    if fast:
        w = jax.lax.rsqrt((r2 * r2) * r2)
    else:
        inv = jax.lax.rsqrt(r2)
        w = (inv * inv) * inv
    # Self/coincident pairs (and FAR-vs-FAR pad pairs): mask on the
    # pre-softening distance, exactly like ops/sym_mxu_force._w_block.
    w = jnp.where(d2 == 0.0, jnp.asarray(0.0, w.dtype), w)
    return w, dx, dy, dz


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


def _force_block(src, rows_ref, cols_ref, pw_ref, id_ref, i, d, *, tile,
                 nb, softening, masses, mxu, fast):
    ci = pl.ds(i * tile, tile)
    jg = jax.lax.rem(i + d, jnp.int32(nb))
    cj = pl.ds(jg * tile, tile)

    @pl.when(d == 0)
    def _transpose_i_tile():
        # (T, 8) = I(T,T) x (8,T)^T : the standard MXU-identity transpose
        # (exact under HIGHEST), done once per i-tile per step.
        pw_ref[:] = jax.lax.dot_general(
            id_ref[:], src[:, ci], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    w, dx, dy, dz = _weights(src, pw_ref, ci, cj, softening, fast)

    if mxu:
        # Row sums transposed: (8,T_i) = vjT (8,T_j) . W^T — lands directly
        # in the transposed accumulator, no reshuffle.
        srt = _mm(_mxu_operand(src[:, cj]), w, ((1,), (1,)))
        rows_ref[:, ci] = rows_ref[:, ci] + srt

        @pl.when(d > 0)  # diagonal block: rows already cover both orders
        def _reactions():
            sct = _mm(_mxu_operand(src[:, ci]), w, ((1,), (0,)))
            cols_ref[:, cj] = cols_ref[:, cj] + sct
    else:
        bj = src[:, cj]
        pi = pw_ref[:]
        wr = w * bj[6:7, :] if masses else w  # m_j scales force on i
        tx, ty, tz = wr * dx, wr * dy, wr * dz
        pack = jnp.concatenate(
            [jnp.sum(tx, axis=1, keepdims=True),
             jnp.sum(ty, axis=1, keepdims=True),
             jnp.sum(tz, axis=1, keepdims=True),
             jnp.zeros((tile, 5), jnp.float32)], axis=1)
        # (8, T_i) = pack^T via the identity (exact), into the transposed
        # row accumulator.
        rows_ref[:, ci] = rows_ref[:, ci] + jax.lax.dot_general(
            pack, id_ref[:], (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

        @pl.when(d > 0)
        def _reactions_vpu():
            if masses:
                wc = w * pi[:, 6:7]  # m_i scales reaction on j
                cx, cy, cz = wc * dx, wc * dy, wc * dz
            else:
                cx, cy, cz = tx, ty, tz
            react = _pad8(jnp.concatenate(
                [jnp.sum(cx, axis=0, keepdims=True),
                 jnp.sum(cy, axis=0, keepdims=True),
                 jnp.sum(cz, axis=0, keepdims=True)], axis=0))
            # reaction on j is -sum_i w m_i (p_j - p_i): accumulate negated
            cols_ref[:, cj] = cols_ref[:, cj] - react


def _integrate_block(src, dst, rows_ref, cols_ref, b, *, tile, dt, mxu):
    cb = pl.ds(b * tile, tile)
    blk = src[:, cb]
    if mxu:
        s = rows_ref[:, cb] + cols_ref[:, cb]
        s4 = s[0:4, :] + s[4:8, :]  # fold the [hi | lo] split columns
        f = s4[0:3, :] - blk[0:3, :] * s4[3:4, :]
    else:
        f = rows_ref[0:3, cb] + cols_ref[0:3, cb]
    vnew = blk[3:6, :] + dt * f
    xnew = blk[0:3, :] + dt * vnew
    dst[:, cb] = jnp.concatenate([xnew, vnew, blk[6:8, :]], axis=0)


def _kernel(in_ref, a_ref, b_ref, rows_ref, cols_ref, pw_ref, id_ref, *,
            tile, nb, nd, dt, softening, masses, mxu, fast):
    del in_ref  # aliased to a_ref: the initial state IS buffer A
    s = pl.program_id(0)
    i = pl.program_id(1)
    d = pl.program_id(2)

    @pl.when(jnp.logical_and(s == 0, jnp.logical_and(i == 0, d == 0)))
    def _build_identity():
        id_ref[:] = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        ).astype(jnp.float32)

    @pl.when(jnp.logical_and(i == 0, d == 0))
    def _zero_accumulators():
        rows_ref[:] = jnp.zeros_like(rows_ref)
        cols_ref[:] = jnp.zeros_like(cols_ref)

    def body(src, dst):
        # Band-active mask: on even nb the antipodal band d = nb/2 pairs
        # each block couple twice; keep the lower-index visit
        # (ops/sym_mxu_force._tri_kernel).
        force_on = jnp.logical_and(
            i < nb, jnp.logical_or(d * 2 != nb, i * 2 < nb))

        @pl.when(force_on)
        def _force():
            _force_block(src, rows_ref, cols_ref, pw_ref, id_ref, i, d,
                         tile=tile, nb=nb, softening=softening,
                         masses=masses, mxu=mxu, fast=fast)

        blk = (i - nb) * nd + d

        @pl.when(jnp.logical_and(i >= nb, blk < nb))
        def _integrate():
            _integrate_block(src, dst, rows_ref, cols_ref, blk,
                             tile=tile, dt=dt, mxu=mxu)

    @pl.when(s % 2 == 0)
    def _even():
        body(a_ref, b_ref)

    @pl.when(s % 2 == 1)
    def _odd():
        body(b_ref, a_ref)


@functools.partial(
    jax.jit,
    static_argnames=("steps", "dt", "softening", "mxu", "tile", "interpret"),
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
):
    """Run `steps` Euler steps entirely inside one kernel launch (module
    docstring); returns (pos, vel) after the final step.

    mxu=False: fp32-exact symmetric math on the VPU (the precision class of
    backend 'sym'). mxu=True: bf16-accumulate MXU hybrid with the
    compensated operand split (the class of 'sym_mxu'). mass=None runs unit
    masses; in mxu mode masses are free (folded into the matmul operand).
    N is bounded by RESIDENT_SYM_MAX_N (VMEM).
    """
    n = pos.shape[0]
    if n > RESIDENT_SYM_MAX_N:
        raise ValueError(
            f"simulate_resident_sym holds the whole state in VMEM: N={n} > "
            f"{RESIDENT_SYM_MAX_N}; use sim.simulate (streamed kernels)")
    if steps < 1:
        raise ValueError("simulate_resident_sym needs steps >= 1")
    masses = mass is not None
    if tile is None:
        tile = 512
    tile = min(tile, round_up(n, 8))
    if not interpret:
        tile = round_up(tile, 128)  # 128-aligned lane offsets (Mosaic)
    np_ = round_up(n, tile)
    nb = np_ // tile
    nd = nb // 2 + 1
    n_int = -(-nb // nd)

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
    wide0 = jnp.concatenate(
        [pos.T, vel.T, m[None, :], jnp.zeros((1, np_), jnp.float32)], axis=0)

    fast = fast_rsqrt_cube(softening)
    vm = pltpu.VMEM
    out_a, out_b = pl.pallas_call(
        functools.partial(_kernel, tile=tile, nb=nb, nd=nd, dt=float(dt),
                          softening=float(softening), masses=masses,
                          mxu=mxu, fast=fast),
        grid=(steps, nb + n_int, nd),
        in_specs=[pl.BlockSpec((8, np_), lambda s, i, d: (0, 0),
                               memory_space=vm)],
        out_specs=[
            pl.BlockSpec((8, np_), lambda s, i, d: (0, 0), memory_space=vm),
            pl.BlockSpec((8, np_), lambda s, i, d: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
            jax.ShapeDtypeStruct((8, np_), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, np_), jnp.float32),   # transposed row sums
            pltpu.VMEM((8, np_), jnp.float32),   # transposed reaction sums
            pltpu.VMEM((tile, 8), jnp.float32),  # i-tile column operands
            pltpu.VMEM((tile, tile), jnp.float32),  # transpose identity
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
    )(wide0)

    # Step s reads the parity buffer and writes the other: the final step
    # steps-1 wrote B when even, A when odd.
    final = out_b if (steps - 1) % 2 == 0 else out_a
    return final[0:3, :n].T, final[3:6, :n].T


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
):
    """`steps` KDK leapfrog steps on the resident kernel (module docstring:
    merged half-kicks make leapfrog the Euler update on staggered
    velocities). One streamed force pass opens (half-kick + first drift on
    the host), steps-1 passes run fused in-kernel, one streamed pass closes
    — steps+1 force evaluations, the same as the streamed loop."""
    if steps < 1:
        raise ValueError("simulate_resident_sym_leapfrog needs steps >= 1")
    half = 0.5 * dt
    force = _class_force(mxu, softening, interpret)
    a0 = force(pos, mass)
    vh = vel + half * a0
    pos = pos + dt * vh
    if steps > 1:
        pos, vh = simulate_resident_sym(
            pos, vh, mass, steps=steps - 1, dt=dt, softening=softening,
            mxu=mxu, tile=tile, interpret=interpret)
    a_end = force(pos, mass)
    return pos, vh + half * a_end


def _class_force(mxu: bool, softening: float, interpret: bool):
    """Streamed force of the SAME precision class for the leapfrog end
    kicks (sym_mxu for mxu mode, fp32 symmetric otherwise)."""
    if mxu:
        from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu

        def force(pos, mass):
            return body_force_sym_mxu(pos, mass, softening=softening,
                                      interpret=interpret)
    else:
        from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric

        def force(pos, mass):
            return body_force_symmetric(pos, mass, softening=softening,
                                        interpret=interpret)
    return force
