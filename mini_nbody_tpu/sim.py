"""The step loop: jit + lax.scan over integration steps.

TPU-native replacement for the reference's control plane (SURVEY.md §1 L5-L7):
the 4-state FSM scheduler (``waiting -> block_setup -> compute -> complete``,
``src/top_level.vhd:50-51,176-272``) and the host's poll-the-control-word
protocol (``src/top_level.vhd:184-186,255-262``) collapse into a single XLA
program — ``simulate`` traces the whole multi-step trajectory once, so there
is no per-step host round-trip at all (the reference pays a PS<->PL handshake
per force pass).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.ops.force import make_force_fn
from mini_nbody_tpu.ops.integrators import INTEGRATORS, initial_acc
from mini_nbody_tpu.utils.config import SimConfig


def make_step_fn(cfg: SimConfig, differentiable: bool = False):
    """Build ``step((state, acc)) -> (state, acc)`` for one dt of config cfg.

    Single-chip version; for mesh-sharded steps see parallel.sharded.
    differentiable=True attaches the analytic force VJP (ops/autodiff), so
    jax.grad flows through whole trajectories regardless of backend.
    """
    if differentiable:
        if cfg.fused_integrate:
            # The fused-epilogue kernel has no VJP; refusing beats silently
            # handing back the unfused path the user opted out of.
            raise ValueError(
                "fused_integrate has no differentiable path: use "
                "cfg.replace(fused_integrate=False) with differentiable=True")
        from mini_nbody_tpu.ops.autodiff import make_differentiable_force

        diff = make_differentiable_force(cfg)

        def force(pos_i, pos_j, mass_j=None):
            return diff(pos_i, mass_j)
    elif cfg.fused_integrate:
        # Kernel-epilogue integrate (SURVEY §7 step 2): F never round-trips
        # HBM. The acc carry is returned as zeros — euler ignores it on
        # input, and the force stays inside the kernel.
        from mini_nbody_tpu.ops.pallas_force import euler_step_fused

        interpret = cfg.resolve_interpret()

        def fused_step(carry):
            state, acc = carry
            pos, vel = euler_step_fused(
                state.pos, state.vel,
                state.mass if cfg.use_masses else None,
                dt=float(cfg.dt), softening=float(cfg.softening),
                tile_i=cfg.tile_i, tile_j=cfg.tile_j, interpret=interpret,
            )
            return BodyState(pos=pos, vel=vel, mass=state.mass), acc

        return fused_step
    else:
        force = make_force_fn(cfg)
    integ = INTEGRATORS[cfg.integrator]

    def step(carry):
        state, acc = carry
        return integ(state, acc, force, cfg.dt)

    return step


def init_carry(cfg: SimConfig, state: BodyState):
    """(state, acc) carry; evaluates the initial acceleration for leapfrog."""
    force = make_force_fn(cfg)
    return state, initial_acc(state, force, cfg.integrator)


@partial(jax.jit, static_argnames=("cfg", "steps"))
def _simulate_scan(cfg: SimConfig, carry, steps: int):
    step = make_step_fn(cfg)

    def body(c, _):
        return step(c), None

    carry, _ = jax.lax.scan(body, carry, None, length=steps)
    return carry


#: Single XLA executions longer than ~5 min of device time trip the axon
#: tunnel's watchdog (UNAVAILABLE "TPU device error" — CLAUDE.md); cap each
#: dispatch well below that, assuming a conservative per-chip rate so even
#: the slowest kernel config stays safe.
MAX_DEVICE_SECONDS_PER_DISPATCH = 120.0
_CONSERVATIVE_GINTER_S = 100.0


def _pacing_rate(cfg: Optional[SimConfig]) -> float:
    """Per-chip GInteractions/s for watchdog segment sizing: the autotune
    cache's measured rate (halved for safety margin) when one exists for
    this config's key, else the flat conservative floor — so a tuned
    sym_mxu run at N=16M sizes ~2x fewer dispatch syncs than the 4x-
    conservative default would."""
    if cfg is not None:
        try:
            from mini_nbody_tpu.utils.autotune import cached_rate

            rate = cached_rate(cfg)
        except Exception:
            rate = None
        if rate:
            return max(_CONSERVATIVE_GINTER_S, 0.5 * rate)
    return _CONSERVATIVE_GINTER_S


def max_steps_per_dispatch(n: int, n_devices: int = 1,
                           cfg: Optional[SimConfig] = None) -> int:
    """Steps per XLA dispatch that keep estimated device time under the
    watchdog cap (O(N^2/P) pairs/step at the pacing rate — conservative
    flat default, or the autotune cache's measured rate when available).
    Multi-eval integrators (rk4 = 4 force passes/step, yoshida4 = 3)
    scale the estimate via FORCE_EVALS — sized at 1 eval/step a yoshida4
    dispatch would run 3x the device-time budget."""
    from mini_nbody_tpu.ops.integrators import FORCE_EVALS

    evals = FORCE_EVALS.get(cfg.integrator, 1) if cfg is not None else 1
    per_step = (evals * float(n) * n / n_devices
                / (_pacing_rate(cfg) * 1e9))
    return max(1, int(MAX_DEVICE_SECONDS_PER_DISPATCH / max(per_step, 1e-12)))


def _sync(tree):
    """Force a device->host transfer of one element: block_until_ready can
    return before remote execution completes through the axon tunnel, and
    queueing many dispatches behind one final read crashes the TPU worker
    (ops/hostseg.py). Every host segmentation loop must sync per dispatch."""
    import numpy as np

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def simulate(
    cfg: SimConfig,
    state: BodyState,
    steps: Optional[int] = None,
) -> BodyState:
    """Run `steps` (default cfg.steps) integration steps.

    Short runs trace as ONE XLA program (no per-step host round-trip — the
    reference pays a PS<->PL handshake per force pass). Runs whose estimated
    device time would trip the execution watchdog are segmented from the
    host into equal-length scan dispatches (same compiled program reused;
    one extra compile for a ragged final segment), the carry staying on
    device throughout.
    """
    steps = cfg.steps if steps is None else steps
    if _route_resident(cfg, steps):
        return _simulate_resident(cfg, state, steps)
    per_step = float(cfg.n) ** 2 / (_pacing_rate(cfg) * 1e9)
    if per_step > MAX_DEVICE_SECONDS_PER_DISPATCH:
        # One force pass alone exceeds the watchdog (N >~ 3.5M at the
        # conservative rate): step from the host with the chunk-group-
        # segmented symmetric force (bit-identical to backend 'sym').
        return _simulate_hostseg(cfg, state, steps)
    carry = init_carry(cfg, state)
    seg = max_steps_per_dispatch(cfg.n, cfg=cfg)
    if steps <= seg:
        state, _ = _simulate_scan(cfg, carry, steps)
        return state
    full, rem = divmod(steps, seg)
    for _ in range(full):
        carry = _simulate_scan(cfg, carry, seg)
        _sync(carry)
    if rem:
        carry = _simulate_scan(cfg, carry, rem)
    return carry[0]


#: Auto-routing crossovers for the resident kernel (ops/resident_sym.py)
#: vs the streamed per-step path, per precision class, measured on v5e
#: with the round-3b bias-free harness (auto_inner cap 65536 — the old
#: cap=4096 left ~8 us/step of sync overhead on BOTH paths at N<=8192
#: and exaggerated every small-N resident win). us/step, resident vs
#: streamed: mxu — N=512: 2.11 vs 2.82 (+34%); 1024: 5.14 vs 5.81;
#: 2048: 15.60 vs 16.44; 4096: 51.31 vs 51.08 (tie — routed resident for
#: fewer host dispatches); 8192: 183.8 vs 180.8 — streamed wins from
#: 8192 up (0.93+ of roofline from N=16384). fp32, round-4 re-probe
#: after the VMEM diet admitted tile=1024 at small nb (resident vs
#: streamed us/step): N=512: 2.97 vs 3.14 (+5%); 1024: 6.80 vs 6.99
#: (+3%); 2048: 20.35 vs 20.03 (-1.6%, inside run variance); 4096:
#: 66.0 vs 63.2 — streamed from 2048 up (pre-diet the crossover was
#: 1024, with tile capped at 768). Mass mode (tighter admission —
#: resident_sym._MAX_NB_FP32_MASS — so tile=512 at N<=1024): 512: 2.86
#: vs 3.11 (+8%); 1024: 8.72 vs 8.65 (parity; routed resident for
#: fewer dispatches, the mxu-tie precedent); 2048: 32.99 vs 25.89 —
#: same 1024 crossover as unit-mass. cfg.resident=True forces the
#: resident path at any N up to its VMEM cap; False pins the streamed
#: path.
RESIDENT_AUTO_MAX_N = {"sym": 1024, "sym_mxu": 4096}

#: Auto-routing per-system N cap for the BATCHED resident ensemble vs the
#: streamed ensemble drivers, measured on v5e with amortized single-
#: dispatch timing (benchmarks/probe_resident_ensemble.py; the padding-
#: aware default tile fix first — the pre-fix streamed fp32 numbers were
#: dominated by quadratic per-system tile padding). Resident/streamed
#: us-per-step speedup at (B, N): mxu — (256, 256): 1.00, (64, 1024):
#: 1.10, (32, 2048): 1.00, (16, 4096): 0.97, (8, 8192): 0.95; fp32 —
#: 0.84-0.97 everywhere (the VPU body reads state via dynamic sublane
#: slices each band, which the streamed kernel's prebuilt operands
#: avoid). So: mxu auto-routes N <= 1024 (win or parity; parity still
#: saves the per-segment dispatch), fp32 never auto-routes;
#: cfg.resident=True forces the fused kernel up to its VMEM admission
#: (useful for dispatch-latency-bound many-step small ensembles).
RESIDENT_ENSEMBLE_AUTO_MAX_N = {"sym_mxu": 1024}


def _route_resident(cfg: SimConfig, steps: int) -> bool:
    """Whether simulate() runs the whole trajectory in the resident kernel.
    Routing preserves the precision class: 'sym' (and 'auto') take the
    fp32-exact VPU mode, 'sym_mxu' the bf16-accumulate MXU mode."""
    if cfg.mesh_shape or cfg.fused_integrate or steps < 1:
        return False
    if cfg.integrator not in ("euler", "leapfrog", "yoshida4"):
        return False  # the resident kernel fuses these three
    if cfg.resident is not None:
        return cfg.resident
    if cfg.split_w:
        return False  # resident mxu mode has no w-split: keep the class
    import jax

    eff = cfg.effective_backend()
    return (jax.default_backend() == "tpu" and steps >= 2
            and eff in RESIDENT_AUTO_MAX_N
            and cfg.n <= RESIDENT_AUTO_MAX_N[eff])


def _simulate_resident(cfg: SimConfig, state: BodyState, steps: int):
    """Whole-trajectory resident run (ops/resident_sym.py), watchdog-
    segmented; leapfrog is the same Euler kernel on half-kick-staggered
    velocities with one streamed force pass at each end (module docstring
    of ops/resident_sym.py)."""
    from mini_nbody_tpu.ops.resident_sym import (
        _class_force, auto_tile, simulate_resident_sym, y4_cycle)

    interp = cfg.resolve_interpret()
    mxu = cfg.effective_backend() == "sym_mxu"
    mass = state.mass if cfg.use_masses else None
    dt = float(cfg.dt)
    tile = cfg.resident_tile or auto_tile(cfg.n, mxu,
                                          masses=cfg.use_masses)
    # Watchdog pacing: conservative pair rate plus ~2 us/slot of small-N
    # per-step overhead (matches the measured 5-12 us/step at N<=1024,
    # where the pair term alone would undercount by ~20x; the slot grid
    # itself is nearly free — benchmarks/probe_resident_floor.py — but
    # small-N steps are overhead-bound, not pair-bound, and 2 us/slot is
    # a safe envelope for segment sizing).
    nb = -(-cfg.n // tile)
    slots = (nb + 1) * (nb // 2 + 1) + nb
    per_step = (float(cfg.n) ** 2 / (_pacing_rate(cfg) * 1e9)
                + 2e-6 * slots)
    seg = max(1, int(MAX_DEVICE_SECONDS_PER_DISPATCH / per_step))

    pos, vh = state.pos, state.vel
    y4 = None
    end_half = 0.5 * dt
    if cfg.integrator == "yoshida4":
        # opening streamed pass (half-kick h1/2 + drift h1), then all
        # 3*steps-1 interior composition substeps fused (ops/resident_sym
        # y4_cycle derivation); watchdog segments thread the running
        # substep phase so the coefficient 3-cycle stays aligned.
        y4, h1 = y4_cycle(dt)
        end_half = 0.5 * h1
        force = _class_force(mxu, float(cfg.softening), interp,
                             cfg.coincident)
        a0 = force(pos, mass)
        vh = vh + end_half * a0
        pos = pos + h1 * vh
        ksteps = 3 * steps - 1
    elif cfg.integrator == "leapfrog":
        force = _class_force(mxu, float(cfg.softening), interp,
                             cfg.coincident)
        a0 = force(pos, mass)
        vh = vh + end_half * a0
        pos = pos + dt * vh
        ksteps = steps - 1
    else:
        ksteps = steps
    done = 0
    while done < ksteps:
        k = min(seg, ksteps - done)
        pos, vh = simulate_resident_sym(
            pos, vh, mass, steps=k, dt=dt, softening=float(cfg.softening),
            mxu=mxu, tile=tile, interpret=interp,
            coincident=cfg.coincident, y4=y4,
            y4_phase=(done % 3) if y4 is not None else 0)
        done += k
        if done < ksteps:
            _sync(pos)
    if cfg.integrator in ("leapfrog", "yoshida4"):
        vel = vh + end_half * force(pos, mass)
    else:
        vel = vh
    return BodyState(pos=pos, vel=vel, mass=state.mass)


def _simulate_hostseg(cfg: SimConfig, state: BodyState, steps: int) -> BodyState:
    """Host-stepped loop for N where one force pass would trip the watchdog:
    the force runs as multiple dispatches (body_force_symmetric_segmented,
    bit-identical to the 'sym' backend), integration as plain O(N) jnp ops.
    Used automatically by simulate; any configured backend routes to the
    symmetric kernel here (the only one with a segmented driver)."""
    from mini_nbody_tpu.ops.symmetric_force import (
        body_force_symmetric_segmented)

    interpret = cfg.resolve_interpret()

    def force(pos_i, _pos_j, mass_j):
        return body_force_symmetric_segmented(
            pos_i, mass_j if cfg.use_masses else None,
            softening=float(cfg.softening), interpret=interpret,
        )

    integ = INTEGRATORS[cfg.integrator]
    acc = initial_acc(state, force, cfg.integrator)
    for _ in range(steps):
        state, acc = integ(state, acc, force, cfg.dt)
        # the segmented force syncs per dispatch internally; the O(N)
        # integrate ops need no extra pacing
    return state


def make_rollout_fn(cfg: SimConfig, steps: int, remat: str = "sqrt"):
    """Differentiable multi-step rollout ``(state, acc) -> (state, acc)``
    with gradient-checkpointed memory — the HBM-for-FLOPs trade that makes
    ``jax.grad`` through LONG trajectories fit on chip.

    A naive differentiable scan stores every step's VJP residuals
    (positions + masses per custom_vjp step: ~16 MB/step at N=1M, so a
    1000-step adjoint would want ~16 GB of HBM).  remat policies:

      * "none": plain scan; residuals for every step live until the
        backward pass (fastest backward, O(steps) memory).
      * "step": each step wrapped in jax.checkpoint — only the per-step
        carries survive the forward; each step's force recomputes in the
        backward (O(steps) carries, no residuals).
      * "sqrt" (default): the scan is split into ~sqrt(steps) checkpointed
        segments of ~sqrt(steps) steps; the forward keeps one carry per
        SEGMENT and the backward recomputes one segment at a time —
        O(sqrt(steps)) live states, one extra forward of compute. The
        standard recursive-checkpoint sweet spot for trajectory adjoints.

    The rollout composes with jax.grad/jax.vjp like any pure function:
    ``jax.grad(lambda p: loss(rollout((replace(state, pos=p), acc))))``.
    """
    if remat not in ("none", "step", "sqrt"):
        raise ValueError(f"remat must be 'none', 'step' or 'sqrt', got {remat!r}")
    step = make_step_fn(cfg, differentiable=True)
    if remat == "step":
        step = jax.checkpoint(step)

    def scan_steps(carry, k):
        def body(c, _):
            return step(c), None

        return jax.lax.scan(body, carry, None, length=k)[0]

    if remat != "sqrt" or steps <= 2:
        return partial(scan_steps, k=steps)

    import math

    inner = max(1, math.isqrt(steps))
    full, rem = divmod(steps, inner)
    segment = jax.checkpoint(partial(scan_steps, k=inner))

    def rollout(carry):
        def outer(c, _):
            return segment(c), None

        carry, _ = jax.lax.scan(outer, carry, None, length=full)
        if rem:
            carry = scan_steps(carry, rem)
        return carry

    return rollout


@partial(jax.jit, static_argnames=("cfg", "steps", "save_every"))
def _trajectory_scan(cfg: SimConfig, carry, steps: int, save_every: int):
    step = make_step_fn(cfg)

    def outer(c, _):
        def inner(c2, _):
            return step(c2), None

        c, _ = jax.lax.scan(inner, c, None, length=save_every)
        return c, c[0].pos

    return jax.lax.scan(outer, carry, None, length=steps // save_every)


def trajectory(cfg: SimConfig, state: BodyState, steps: int, save_every: int = 1):
    """Like simulate, but also returns stacked position snapshots every
    `save_every` steps: (state_final, pos_history[steps//save_every, N, 3]).

    Watchdog-segmented like simulate: long runs split into host dispatches
    on save_every boundaries, snapshot chunks concatenated on host.
    """
    if steps % save_every != 0:
        raise ValueError("steps must be divisible by save_every")
    per_step = float(cfg.n) ** 2 / (_pacing_rate(cfg) * 1e9)
    if per_step > MAX_DEVICE_SECONDS_PER_DISPATCH:
        # One force pass alone exceeds the watchdog: host-stepped loop with
        # the segmented force, collecting snapshots on the way (the
        # trajectory analog of _simulate_hostseg).
        return _trajectory_hostseg(cfg, state, steps, save_every)
    carry = init_carry(cfg, state)
    seg = max_steps_per_dispatch(cfg.n, cfg=cfg)
    seg = max(save_every, seg - seg % save_every)  # multiple of save_every
    if steps <= seg:
        carry, hist = _trajectory_scan(cfg, carry, steps, save_every)
        return carry[0], hist
    chunks = []
    done = 0
    while done < steps:
        k = min(seg, steps - done)
        carry, hist = _trajectory_scan(cfg, carry, k, save_every)
        _sync(carry)
        chunks.append(hist)
        done += k
    return carry[0], jnp.concatenate(chunks, axis=0)


def _trajectory_hostseg(cfg: SimConfig, state: BodyState, steps: int,
                        save_every: int):
    from mini_nbody_tpu.ops.symmetric_force import (
        body_force_symmetric_segmented)

    interpret = cfg.resolve_interpret()

    def force(pos_i, _pos_j, mass_j):
        return body_force_symmetric_segmented(
            pos_i, mass_j if cfg.use_masses else None,
            softening=float(cfg.softening), interpret=interpret,
        )

    integ = INTEGRATORS[cfg.integrator]
    acc = initial_acc(state, force, cfg.integrator)
    snaps = []
    for k in range(1, steps + 1):
        state, acc = integ(state, acc, force, cfg.dt)
        if k % save_every == 0:
            snaps.append(state.pos)
    return state, jnp.stack(snaps)


def simulate_ensemble(cfg: SimConfig, state: BodyState, steps: int = None,
                      mesh=None):
    """Integrate B INDEPENDENT N-body systems batched on one chip.

    state fields carry a leading batch dim: pos/vel (B, N, 3), mass (B, N).
    Forces run through the symmetric ensemble drivers (each system is one
    chunk of the symmetric traversal; no cross-system pairs, no per-system
    launches — the device sees one (B*c)-body program and small systems
    run at the big-N streamed rate): backend 'sym_mxu' = the bf16-class
    MXU hybrid (ops/sym_mxu_force.body_force_sym_mxu_ensemble), 'sym' =
    fp32-exact (ops/symmetric_force.body_force_symmetric_ensemble). Any
    cfg.integrator works (the integrators are elementwise over the
    batched state). Watchdog-segmented like simulate.

    mesh (optional jax.sharding.Mesh, first axis = the batch axis): shard
    the B systems data-parallel over devices — embarrassingly parallel,
    ZERO collectives (no cross-system pairs means no cross-device pairs);
    each device runs its B/P-system sub-batch through the same ensemble
    kernel via shard_map. Requires B % mesh.devices.size == 0.

    The TPU-native answer to parameter sweeps / perturbation ensembles —
    a workload the reference could only serve one RAM-load at a time
    (``src/top_level.vhd:180-186``).
    """
    steps = cfg.steps if steps is None else steps
    state, seg = _ensemble_prepare(cfg, state, mesh)
    if mesh is None and _route_resident_ensemble(cfg, steps,
                                                 state.pos.shape[0]):
        return _simulate_resident_ensemble(cfg, state, steps)
    st, acc = state, _ensemble_initial_acc(cfg, mesh, state)
    done = 0
    while done < steps:
        k = min(seg, steps - done)
        st, acc = _ensemble_run_k(cfg, mesh, st, acc, k)
        done += k
        if done < steps:
            _sync(st.pos)
    return st


def _resident_ensemble_admissible(cfg: SimConfig, b: int) -> bool:
    """Whether the batched-resident kernel can hold all B systems in VMEM
    at cfg's tile (ops/resident_sym.auto_tile_ensemble admission)."""
    from mini_nbody_tpu.ops.resident_sym import (
        RESIDENT_SYM_MAX_N, auto_tile_ensemble)
    from mini_nbody_tpu.utils.config import round_up

    mxu = cfg.effective_backend() == "sym_mxu"
    try:
        tile = cfg.resident_tile or auto_tile_ensemble(
            b, cfg.n, mxu, masses=cfg.use_masses)
    except ValueError:
        return False
    return b * round_up(cfg.n, tile) <= RESIDENT_SYM_MAX_N


def _route_resident_ensemble(cfg: SimConfig, steps: int, b: int) -> bool:
    """Whether simulate_ensemble fuses the whole batched trajectory into
    the resident-ensemble kernel (ops/resident_sym.py). Same class-
    preserving rules as _route_resident; the auto regime additionally
    requires VMEM admission for ALL B systems."""
    if cfg.fused_integrate or steps < 1:
        return False
    if cfg.integrator not in ("euler", "leapfrog", "yoshida4"):
        return False
    if cfg.resident is not None:
        return cfg.resident and _resident_ensemble_admissible(cfg, b)
    if cfg.split_w:
        return False
    import jax

    return (jax.default_backend() == "tpu" and steps >= 2
            and cfg.n <= RESIDENT_ENSEMBLE_AUTO_MAX_N.get(
                cfg.effective_backend(), 0)
            and _resident_ensemble_admissible(cfg, b))


def _simulate_resident_ensemble(cfg: SimConfig, state: BodyState,
                                steps: int) -> BodyState:
    """Whole-trajectory batched-resident run: B systems x steps in one
    kernel launch per watchdog segment (ops/resident_sym.py's batched
    grid); leapfrog = the same kernel on half-kick-staggered velocities
    with one streamed ensemble force pass at each end."""
    from mini_nbody_tpu.ops.resident_sym import (
        _class_force_ensemble, auto_tile_ensemble,
        simulate_resident_sym_ensemble, y4_cycle)

    interp = cfg.resolve_interpret()
    mxu = cfg.effective_backend() == "sym_mxu"
    b = state.pos.shape[0]
    mass = state.mass if cfg.use_masses else None
    dt = float(cfg.dt)
    tile = cfg.resident_tile or auto_tile_ensemble(
        b, cfg.n, mxu, masses=cfg.use_masses)
    # Watchdog pacing: B x per-system pair work plus the slot-overhead
    # envelope (the same 2 us/slot bound as _simulate_resident).
    nb = -(-cfg.n // tile)
    nd = nb // 2 + 1
    slots = b * ((nb + -(-nb // nd)) * nd)
    per_step = (b * float(cfg.n) ** 2 / (_pacing_rate(cfg) * 1e9)
                + 2e-6 * slots)
    seg = max(1, int(MAX_DEVICE_SECONDS_PER_DISPATCH / per_step))

    pos, vh = state.pos, state.vel
    y4 = None
    end_half = 0.5 * dt
    if cfg.integrator == "yoshida4":
        y4, h1 = y4_cycle(dt)
        end_half = 0.5 * h1
        force = _class_force_ensemble(mxu, float(cfg.softening), interp,
                                      cfg.coincident)
        a0 = force(pos, mass)
        vh = vh + end_half * a0
        pos = pos + h1 * vh
        ksteps = 3 * steps - 1
    elif cfg.integrator == "leapfrog":
        force = _class_force_ensemble(mxu, float(cfg.softening), interp,
                                      cfg.coincident)
        a0 = force(pos, mass)
        vh = vh + end_half * a0
        pos = pos + dt * vh
        ksteps = steps - 1
    else:
        ksteps = steps
    done = 0
    while done < ksteps:
        k = min(seg, ksteps - done)
        pos, vh = simulate_resident_sym_ensemble(
            pos, vh, mass, steps=k, dt=dt, softening=float(cfg.softening),
            mxu=mxu, tile=tile, interpret=interp, coincident=cfg.coincident,
            y4=y4, y4_phase=(done % 3) if y4 is not None else 0)
        done += k
        if done < ksteps:
            _sync(pos)
    if cfg.integrator in ("leapfrog", "yoshida4"):
        vel = vh + end_half * force(pos, mass)
    else:
        vel = vh
    return BodyState(pos=pos, vel=vel, mass=state.mass)


def _ensemble_prepare(cfg: SimConfig, state: BodyState, mesh):
    """Shared ensemble entry validation + watchdog pacing: returns the
    (possibly mesh-placed) batched state and the per-dispatch step cap."""
    if state.pos.ndim != 3:
        raise ValueError(
            f"ensemble entry points need batched state (B, N, 3); got pos "
            f"{state.pos.shape}")
    eff = cfg.effective_backend()
    if eff not in ("sym", "sym_mxu"):
        raise ValueError(
            "ensembles run the symmetric ensemble kernels; set "
            f"backend='sym_mxu' or 'sym' (got {eff!r})")
    b, n = state.pos.shape[0], state.pos.shape[1]
    if n != cfg.n:
        raise ValueError(f"cfg.n={cfg.n} != per-system N={n}")
    interp = cfg.resolve_interpret()

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = mesh.devices.size
        if b % nd != 0:
            raise ValueError(
                f"ensemble batch B={b} must divide the mesh size {nd}")
        ax = mesh.axis_names[0]
        # place the batched state on the mesh (batch axis sharded)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(ax, *([None] * (x.ndim - 1))))),
            state)

    # Watchdog pacing: B systems x c^2/2-ish pairs per force pass, with c
    # from the SAME tiling resolution the ensemble driver uses (a hand-
    # rolled copy here missed symmetric_force's mass-mode 896 tile cap ->
    # ~3x pair undercount; code-review r3d) and the integrator's force
    # evals per step (yoshida4 runs 3 passes in one dispatch).
    from mini_nbody_tpu.ops.integrators import FORCE_EVALS

    if eff == "sym_mxu":
        from mini_nbody_tpu.ops.sym_mxu_force import ensemble_tiling

        _, c = ensemble_tiling(n, cfg.sym_tile, interp)
    else:
        from mini_nbody_tpu.ops.symmetric_force import ensemble_tiling

        _, c = ensemble_tiling(n, cfg.sym_tile, cfg.use_masses, interp)
    per_step = (FORCE_EVALS[cfg.integrator] * b * float(c) * c
                / (_pacing_rate(cfg) * 1e9))
    seg = max(1, int(MAX_DEVICE_SECONDS_PER_DISPATCH / max(per_step, 1e-12)))
    return state, seg


def trajectory_ensemble(cfg: SimConfig, state: BodyState, steps: int = None,
                        save_every: int = 1, mesh=None):
    """simulate_ensemble + stacked per-system position snapshots: returns
    (state_final, pos_history[steps//save_every, B, N, 3]).

    Snapshot semantics match trajectory(): one snapshot AFTER every
    `save_every`-th step. Watchdog-segmented on save_every boundaries with
    snapshot chunks concatenated on host; under a mesh the history stays
    batch-sharded (gather with np.asarray if the host needs it whole).

    The batched analog of the reference host reading positions back after
    each force pass (``src/top_level.vhd:180-186``), for B systems at once.
    """
    steps = cfg.steps if steps is None else steps
    if steps % save_every != 0:
        raise ValueError("steps must be divisible by save_every")
    state, seg = _ensemble_prepare(cfg, state, mesh)
    seg = max(save_every, seg - seg % save_every)  # multiple of save_every
    st, acc = state, _ensemble_initial_acc(cfg, mesh, state)
    chunks = []
    done = 0
    while done < steps:
        k = min(seg, steps - done)
        st, acc, hist = _ensemble_traj_k(cfg, mesh, st, acc, k, save_every)
        done += k
        chunks.append(hist)
        if done < steps:
            _sync(st.pos)
    return st, (chunks[0] if len(chunks) == 1
                else jnp.concatenate(chunks, axis=0))


@partial(jax.jit, static_argnames=("cfg", "mesh", "k", "save_every"))
def _ensemble_traj_k(cfg: SimConfig, mesh, st, acc, k: int, save_every: int):
    force = _ensemble_forcefn(cfg, mesh)
    mass3 = st.mass if cfg.use_masses else None
    integ = INTEGRATORS[cfg.integrator]

    def inner(carry, _):
        s, a = carry
        s, a = integ(s, a, lambda pi, pj, mj: force(pi, mass3), cfg.dt)
        return (s, a), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=save_every)
        return carry, carry[0].pos

    (st, acc), hist = jax.lax.scan(outer, (st, acc), None,
                                   length=k // save_every)
    return st, acc, hist


def _ensemble_forcefn(cfg: SimConfig, mesh):
    """(pos (B,N,3), mass (B,N)|None) -> acc, resolved from cfg statics.

    Plain builder (no jit of its own) called inside the module-level jitted
    ensemble runners below so tracing is keyed on (cfg, mesh) — a per-call
    closure here previously made EVERY simulate_ensemble() call re-trace and
    re-compile the whole multi-step scan (~20 s each through the remote
    compile helper), which the r3e batched-vs-looped probe mis-read as a
    75x kernel slowdown."""
    interp = cfg.resolve_interpret()
    # 'auto' inside the fused step scan would pay the vmapped duplicate
    # scan + cond EVERY step (~725 us/step at B=64, N=1024 — over 4x the
    # masked force itself; benchmarks/probe_ensemble_perf.py). Resolve it
    # to 'masked' here, exactly like the resident kernel's 'auto'
    # (duplicates can form at ANY step of a fused trajectory, so masked is
    # the only always-correct per-trajectory choice) — bitwise-neutral
    # when no duplicates ever occur, because the maskless kernels are
    # bitwise-identical to masked then (ops/sym_mxu_force.any_coincident).
    # 'fast' stays an explicit opt-in.
    coin = "masked" if cfg.coincident == "auto" else cfg.coincident
    if cfg.effective_backend() == "sym_mxu":
        from mini_nbody_tpu.ops.sym_mxu_force import (
            body_force_sym_mxu_ensemble)

        def base(p, m):
            return body_force_sym_mxu_ensemble(
                p, m, softening=cfg.softening, tile=cfg.sym_tile,
                interpret=interp, split_w=cfg.split_w,
                coincident=coin)
    else:
        from mini_nbody_tpu.ops.symmetric_force import (
            body_force_symmetric_ensemble)

        def base(p, m):
            return body_force_symmetric_ensemble(
                p, m, softening=cfg.softening, tile=cfg.sym_tile,
                interpret=interp)

    if mesh is None:
        return base
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    bspec = P(mesh.axis_names[0])
    if cfg.use_masses:
        return shard_map(base, mesh=mesh, in_specs=(bspec, bspec),
                         out_specs=bspec, check_vma=False)
    smap = shard_map(lambda p: base(p, None), mesh=mesh, in_specs=(bspec,),
                     out_specs=bspec, check_vma=False)
    return lambda p, m: smap(p)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _ensemble_initial_acc(cfg: SimConfig, mesh, st):
    force = _ensemble_forcefn(cfg, mesh)
    mass3 = st.mass if cfg.use_masses else None
    return initial_acc(st, lambda pi, pj, mj: force(pi, mass3),
                       cfg.integrator)


@partial(jax.jit, static_argnames=("cfg", "mesh", "k"))
def _ensemble_run_k(cfg: SimConfig, mesh, st, acc, k: int):
    force = _ensemble_forcefn(cfg, mesh)
    mass3 = st.mass if cfg.use_masses else None
    integ = INTEGRATORS[cfg.integrator]

    def body(carry, _):
        s, a = carry
        s, a = integ(s, a, lambda pi, pj, mj: force(pi, mass3), cfg.dt)
        return (s, a), None

    (st, acc), _ = jax.lax.scan(body, (st, acc), None, length=k)
    return st, acc
