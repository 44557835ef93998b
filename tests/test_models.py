"""Initial-condition generators and state pytree mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_nbody_tpu.models import init
from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.ops import diagnostics as diag


def test_uniform_distribution_bounds():
    s = init.uniform_random(jax.random.key(0), 4096)
    for arr in (s.pos, s.vel):
        a = np.asarray(arr)
        assert a.min() >= -1.0 and a.max() <= 1.0
        # Uniform[-1,1]: mean ~0, var ~1/3
        assert abs(a.mean()) < 0.02
        assert abs(a.var() - 1 / 3) < 0.02
    assert np.all(np.asarray(s.mass) == 1.0)


def test_plummer_virial():
    s = init.plummer(jax.random.key(2), 4096)
    ke = float(diag.kinetic_energy(s.vel, s.mass))
    pe = float(diag.potential_energy(s.pos, s.mass, 1e-9))
    # Virial equilibrium: 2*KE ~ -PE (loose gate; finite-N + sampling noise).
    assert 0.5 < -pe / (2 * ke) < 2.0
    # Centered frames.
    assert np.abs(np.asarray(diag.momentum(s))).max() < 1e-3


def test_pad_unpad_roundtrip():
    s = init.uniform_random(jax.random.key(1), 100)
    p = s.pad_to(128)
    assert p.n == 128
    assert np.all(np.asarray(p.mass[100:]) == 0.0)
    u = p.unpad(100)
    np.testing.assert_array_equal(np.asarray(u.pos), np.asarray(s.pos))


def test_state_is_pytree():
    s = init.uniform_random(jax.random.key(0), 16)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 3
    doubled = jax.tree_util.tree_map(lambda x: x * 2, s)
    np.testing.assert_allclose(np.asarray(doubled.pos), 2 * np.asarray(s.pos))


def test_potential_energy_chunked_matches_direct():
    s = init.uniform_random(jax.random.key(5), 300)
    u_direct = float(diag.potential_energy(s.pos, s.mass, 1e-2, row_chunk=512))
    u_chunked = float(diag.potential_energy(s.pos, s.mass, 1e-2, row_chunk=64))
    np.testing.assert_allclose(u_chunked, u_direct, rtol=1e-5)
    # vs numpy fp64
    p = np.asarray(s.pos, np.float64)
    d = p[None] - p[:, None]
    r2 = (d * d).sum(-1) + 1e-2
    ref = -0.5 * (1.0 / np.sqrt(r2))[~np.eye(300, dtype=bool)].sum()
    np.testing.assert_allclose(u_direct, ref, rtol=1e-4)


def test_two_cluster_preset():
    s = init.make("two_cluster", jax.random.key(0), 200)
    assert s.n == 200
    x = np.asarray(s.pos[:, 0])
    # two spatially separated groups
    assert (x < -1).sum() > 50 and (x > 1).sum() > 50
    assert abs(float(np.asarray(s.mass).sum()) - 1.0) < 1e-5


def test_plummer_finite_at_scale():
    # Regression: the inverse-CDF radius produced inf for u within fp32
    # rounding of 1 — appeared only at large sample counts (~1e5+).
    s = init.plummer(jax.random.key(0), 300000)
    a = np.asarray(s.pos)
    assert np.isfinite(a).all()
    assert np.abs(a).max() < 200.0
