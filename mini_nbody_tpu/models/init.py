"""Initial-condition generators (the ``randomizeBodies`` analog and friends).

Upstream mini-nbody seeds every position *and* velocity component with
``2*(rand()/RAND_MAX) - 1`` (uniform in [-1, 1]); in the reference system this
runs on the ARM host before the bodies are written into the shared RAM
(SURVEY.md §0 — host software is not mounted).  Here the generators are pure
JAX functions of a PRNG key, so initialization runs on-device and is
reproducible under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mini_nbody_tpu.models.state import BodyState


def uniform_random(key: jax.Array, n: int, dtype=jnp.float32) -> BodyState:
    """The mini-nbody ``randomizeBodies`` distribution: pos, vel ~ U[-1, 1]."""
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 3), dtype, minval=-1.0, maxval=1.0)
    vel = jax.random.uniform(kv, (n, 3), dtype, minval=-1.0, maxval=1.0)
    return BodyState.create(pos, vel, dtype=dtype)


def plummer(key: jax.Array, n: int, dtype=jnp.float32, total_mass: float = 1.0) -> BodyState:
    """Plummer-sphere equilibrium model (standard N-body test system).

    Positions follow the Plummer density profile; velocities are drawn from
    the isotropic distribution function via the standard rejection-free
    approximation (Aarseth, Henon & Wielen 1974 construction). Useful for
    energy-drift gates: unlike the uniform benchmark cloud it is near virial
    equilibrium, so total energy should be conserved by a good integrator.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    m = jnp.full((n,), total_mass / n, dtype)

    # Radius from inverse-CDF of the Plummer cumulative mass profile.
    # maxval stays far enough from 1 that u^(-2/3) - 1 cannot round to 0 in
    # fp32 (at maxval 1-1e-6 it does for some of ~1e5+ samples -> inf radii);
    # 1-1e-4 truncates the cluster at r ~ 122 (a standard finite-radius cut),
    # and the clamp bounds stragglers at r = 100.
    u = jax.random.uniform(k1, (n,), jnp.float32, minval=1e-6, maxval=1.0 - 1e-4)
    r = jnp.minimum((u ** (-2.0 / 3.0) - 1.0) ** -0.5, 100.0)

    def _isotropic(key, radius):
        kz, kphi = jax.random.split(key)
        z = jax.random.uniform(kz, radius.shape, jnp.float32, minval=-1.0, maxval=1.0)
        phi = jax.random.uniform(kphi, radius.shape, jnp.float32, maxval=2.0 * jnp.pi)
        s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        return radius[:, None] * jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)

    pos = _isotropic(k2, r)

    # Speed via von Neumann rejection replaced by the q-distribution quantile
    # trick: sample q in [0,1] with density q^2 (1-q^2)^{7/2} by rejection
    # implemented as a fixed number of resampling rounds (static shapes).
    def sample_q(key):
        ka, kb = jax.random.split(key)
        q = jax.random.uniform(ka, (n, 32), jnp.float32)
        g = jax.random.uniform(kb, (n, 32), jnp.float32, maxval=0.1)
        ok = g < q * q * (1.0 - q * q) ** 3.5
        # take first accepted sample per row; fall back to median 0.4
        idx = jnp.argmax(ok, axis=1)
        any_ok = jnp.any(ok, axis=1)
        picked = jnp.take_along_axis(q, idx[:, None], axis=1)[:, 0]
        return jnp.where(any_ok, picked, 0.4)

    q = sample_q(k3)
    v_esc = jnp.sqrt(2.0) * (1.0 + r * r) ** -0.25
    speed = q * v_esc
    vel = _isotropic(k4, speed)

    # Standard units: G = M = 1, rescale to virial radius via the 16/(3*pi)
    # Plummer scale factor.
    scale = 16.0 / (3.0 * jnp.pi)
    pos = pos / scale
    vel = vel * jnp.sqrt(scale)

    # Center of mass / momentum frame.
    pos = pos - jnp.mean(pos, axis=0, keepdims=True)
    vel = vel - jnp.mean(vel, axis=0, keepdims=True)
    del k5
    return BodyState.create(pos.astype(dtype), vel.astype(dtype), m, dtype=dtype)


def cold_sphere(key: jax.Array, n: int, dtype=jnp.float32) -> BodyState:
    """Cold uniform sphere (zero velocities) — collapse test problem."""
    k1, k2 = jax.random.split(key)
    # Uniform in the unit ball via normalized Gaussian * r^(1/3).
    g = jax.random.normal(k1, (n, 3), jnp.float32)
    g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    r = jax.random.uniform(k2, (n, 1), jnp.float32) ** (1.0 / 3.0)
    pos = (g * r).astype(dtype)
    vel = jnp.zeros((n, 3), dtype)
    return BodyState.create(pos, vel, jnp.full((n,), 1.0 / n, dtype), dtype=dtype)


def two_cluster(key, n: int, dtype=jnp.float32, separation: float = 4.0,
                approach: float = 0.3) -> BodyState:
    """Two Plummer spheres on a collision course (merger test problem)."""
    k1, k2 = jax.random.split(key)
    n1 = n // 2
    a = plummer(k1, n1, dtype, total_mass=0.5)
    b = plummer(k2, n - n1, dtype, total_mass=0.5)
    off = jnp.asarray([separation / 2, 0.0, 0.0], dtype)
    vel = jnp.asarray([approach / 2, 0.0, 0.0], dtype)
    pos = jnp.concatenate([a.pos - off, b.pos + off])
    v = jnp.concatenate([a.vel + vel, b.vel - vel])
    mass = jnp.concatenate([a.mass, b.mass])
    return BodyState.create(pos, v, mass, dtype=dtype)


PRESETS = {
    "uniform": uniform_random,
    "plummer": plummer,
    "cold_sphere": cold_sphere,
    "two_cluster": two_cluster,
}


def make(name: str, key: jax.Array, n: int, dtype=jnp.float32) -> BodyState:
    if name not in PRESETS:
        raise ValueError(f"unknown preset {name!r}; options: {sorted(PRESETS)}")
    return PRESETS[name](key, n, dtype)
