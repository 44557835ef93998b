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


def max_steps_per_dispatch(n: int, n_devices: int = 1) -> int:
    """Steps per XLA dispatch that keep estimated device time under the
    watchdog cap (O(N^2/P) pairs/step at a conservative per-chip rate)."""
    per_step = float(n) * n / n_devices / (_CONSERVATIVE_GINTER_S * 1e9)
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
    if (cfg.backend == "auto" and cfg.integrator == "euler"
            and not cfg.fused_integrate and steps >= 2
            and jax.default_backend() == "tpu"):
        from mini_nbody_tpu.ops.resident import (
            RESIDENT_MAX_N, simulate_resident)

        if cfg.n <= RESIDENT_MAX_N:
            # Small-N fast path: the whole trajectory runs inside ONE
            # kernel launch with the state resident in VMEM — 3.9x the
            # streamed per-step path at N=4096, where every backend is
            # launch-bound (ops/resident.py). Long runs are host-segmented
            # into watchdog-safe dispatches like every other path (the
            # per-step estimate uses the same conservative rate).
            # Pair-rate estimate PLUS a per-grid-iteration overhead term: at
            # small N fixed per-iteration cost dominates (N=128 is ~1-2 us
            # per step, not the ~0.16 us the pair count suggests), and a
            # several-hundred-million-step request must still stay under the
            # ~5-min tunnel watchdog in one dispatch.
            tile = 1024 if cfg.n <= 4096 else 512
            nb = -(-cfg.n // tile)
            per_step = (float(cfg.n) ** 2 / (_CONSERVATIVE_GINTER_S * 1e9)
                        + 2e-6 * nb * nb)
            seg = max(1, int(MAX_DEVICE_SECONDS_PER_DISPATCH / per_step))
            interp = cfg.resolve_interpret()
            pos, vel = state.pos, state.vel
            mass = state.mass if cfg.use_masses else None
            done = 0
            while done < steps:
                k = min(seg, steps - done)
                pos, vel = simulate_resident(
                    pos, vel, mass,
                    steps=k, dt=float(cfg.dt),
                    softening=float(cfg.softening), interpret=interp,
                )
                done += k
                if done < steps:
                    _sync(pos)
            return BodyState(pos=pos, vel=vel, mass=state.mass)
    per_step = float(cfg.n) ** 2 / (_CONSERVATIVE_GINTER_S * 1e9)
    if per_step > MAX_DEVICE_SECONDS_PER_DISPATCH:
        # One force pass alone exceeds the watchdog (N >~ 3.5M at the
        # conservative rate): step from the host with the chunk-group-
        # segmented symmetric force (bit-identical to backend 'sym').
        return _simulate_hostseg(cfg, state, steps)
    carry = init_carry(cfg, state)
    seg = max_steps_per_dispatch(cfg.n)
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
    per_step = float(cfg.n) ** 2 / (_CONSERVATIVE_GINTER_S * 1e9)
    if per_step > MAX_DEVICE_SECONDS_PER_DISPATCH:
        # One force pass alone exceeds the watchdog: host-stepped loop with
        # the segmented force, collecting snapshots on the way (the
        # trajectory analog of _simulate_hostseg).
        return _trajectory_hostseg(cfg, state, steps, save_every)
    carry = init_carry(cfg, state)
    seg = max_steps_per_dispatch(cfg.n)
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
