"""Whole-simulation-resident kernel (ops/resident.py) vs the step loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu import SimConfig, simulate
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.resident import RESIDENT_MAX_N, simulate_resident

INTERP = jax.default_backend() != "tpu"


def _check(n, steps, masses=False, tile=64, softening=1e-2):
    make = init.plummer if masses else init.uniform_random
    s = make(jax.random.key(n), n)
    cfg = SimConfig(n=n, dt=1e-3, steps=steps, backend="jnp",
                    softening=softening, use_masses=masses,
                    integrator="euler")
    ref = simulate(cfg, s)
    pos, vel = simulate_resident(s.pos, s.vel, s.mass if masses else None,
                                 steps=steps, dt=1e-3, softening=softening,
                                 tile=tile, interpret=INTERP)
    scale = max(np.abs(np.asarray(ref.pos)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.pos),
                               rtol=1e-4, atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(ref.vel),
                               rtol=1e-4, atol=1e-5 * scale)


def test_unit_mass_multi_step():
    _check(256, 5)


def test_mass_mode():
    _check(256, 4, masses=True)


def test_ragged_tail_far_padding():
    _check(300, 3)


def test_single_step_single_tile():
    _check(100, 1, tile=32)


def test_odd_step_parity():
    _check(128, 7, tile=32)


def test_default_softening():
    # self pair: d * w = 0 exactly even at eps^-1.5 weights
    _check(128, 2, tile=32, softening=1e-9)


def test_n_bound():
    pos = jnp.zeros((RESIDENT_MAX_N + 1, 3))
    with pytest.raises(ValueError, match="VMEM"):
        simulate_resident(pos, pos, steps=1, dt=1e-3, interpret=INTERP)


def test_steps_bound():
    pos = jnp.zeros((8, 3))
    with pytest.raises(ValueError, match="steps"):
        simulate_resident(pos, pos, steps=0, dt=1e-3, interpret=INTERP)


def test_zero_mass_sources_inert():
    n = 128
    s = init.uniform_random(jax.random.key(3), n)
    mass = jnp.ones((n,)).at[n // 2:].set(0.0)
    pos, vel = simulate_resident(s.pos, s.vel, mass, steps=2, dt=1e-3,
                                 softening=1e-2, tile=32, interpret=INTERP)
    # massless bodies exert no force: evolving only the massive half must
    # give the same trajectory for those bodies
    pos2, vel2 = simulate_resident(
        s.pos[: n // 2], s.vel[: n // 2], mass[: n // 2], steps=2, dt=1e-3,
        softening=1e-2, tile=32, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(pos[: n // 2]), np.asarray(pos2),
                               rtol=1e-5, atol=1e-7)
