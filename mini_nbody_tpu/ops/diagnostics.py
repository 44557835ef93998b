"""Physics diagnostics: energy, momentum, angular momentum.

The reference has no numerical-correctness checking at all — its testbenches
verify handshake protocol only ("Do not check the output payload values",
``sim/tb_dxy.vhd:899-923``). These diagnostics are the replacement: invariants
a correct force kernel + symplectic integrator must (approximately) conserve,
used by the test suite and the ``--check`` harness mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.utils.config import SOFTENING


@partial(jax.jit, static_argnames=("softening",))
def potential_energy(pos, mass, softening: float = SOFTENING):
    """U = -sum_{i<j} m_i m_j / sqrt(r_ij^2 + eps), matching the softened force
    law (the force here is exactly -grad of this potential)."""
    d = pos[None, :, :] - pos[:, None, :]
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(softening, pos.dtype)
    inv = jax.lax.rsqrt(r2)
    mm = mass[:, None] * mass[None, :]
    n = pos.shape[0]
    off_diag = 1.0 - jnp.eye(n, dtype=pos.dtype)
    return -0.5 * jnp.sum(mm * inv * off_diag)


@jax.jit
def kinetic_energy(vel, mass):
    return 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))


def total_energy(state: BodyState, softening: float = SOFTENING):
    return kinetic_energy(state.vel, state.mass) + potential_energy(
        state.pos, state.mass, softening
    )


@jax.jit
def momentum(state: BodyState):
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


@jax.jit
def angular_momentum(state: BodyState):
    return jnp.sum(state.mass[:, None] * jnp.cross(state.pos, state.vel), axis=0)


def energy_drift(e0, e1):
    """Relative energy drift |E1 - E0| / |E0| (BASELINE gate: <= 1e-5 / 1k steps)."""
    return jnp.abs(e1 - e0) / jnp.abs(e0)


@jax.jit
def check_finite(state: BodyState):
    """NaN/overflow guard (the failure detection the reference lacks —
    SURVEY.md §5: its only flow control is busy flags with no error path).
    Returns a dict of booleans; cheap enough to run every K steps."""
    return {
        "pos_finite": jnp.isfinite(state.pos).all(),
        "vel_finite": jnp.isfinite(state.vel).all(),
        "pos_bounded": (jnp.abs(state.pos) < 1e30).all(),
    }


def assert_finite(state: BodyState, context: str = ""):
    """Host-side hard check; raises on NaN/Inf (fetches 3 scalars)."""
    flags = {k: bool(v) for k, v in check_finite(state).items()}
    if not all(flags.values()):
        raise FloatingPointError(f"non-finite body state {context}: {flags}")
