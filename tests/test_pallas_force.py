"""Pallas direct kernel vs oracle (interpret mode on CPU; real Mosaic on TPU).

The same suite runs unmodified on a real TPU chip (SimConfig.resolve_interpret
flips interpret off there); CI here uses the CPU interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.pallas_force import body_force_pallas
from mini_nbody_tpu.ops.reference import body_force_jnp

INTERP = jax.default_backend() != "tpu"


def _check(pos_i, pos_j, mass_j=None, **kw):
    f = body_force_pallas(pos_i, pos_j, mass_j, interpret=INTERP, **kw)
    ref = body_force_jnp(pos_i, pos_j, mass_j)
    f, ref = np.asarray(f), np.asarray(ref)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(f, ref, rtol=1e-4, atol=1e-5 * scale)


@pytest.mark.parametrize("n", [8, 128, 256, 512])
def test_square_aligned(n):
    s = init.uniform_random(jax.random.key(n), n)
    _check(s.pos, s.pos, s.mass, tile_i=64, tile_j=128)


@pytest.mark.parametrize("n", [1, 7, 100, 300])
def test_tail_padding(n):
    # Non-tile-aligned N: zero-mass padding is the WRITE_MASK analog
    # (src/top_level.vhd:201-205) — results must match exactly-sized oracle.
    s = init.uniform_random(jax.random.key(n), n)
    _check(s.pos, s.pos, s.mass, tile_i=64, tile_j=128)


def test_rectangular_with_masses(rng):
    pos_i = jnp.asarray(rng.uniform(-1, 1, (96, 3)), jnp.float32)
    pos_j = jnp.asarray(rng.uniform(-1, 1, (200, 3)), jnp.float32)
    m_j = jnp.asarray(rng.uniform(0.1, 2.0, 200), jnp.float32)
    _check(pos_i, pos_j, m_j, tile_i=32, tile_j=128)


def test_multi_j_block_accumulation(rng):
    # Nj spanning several j grid steps exercises the accumulate-across-grid
    # path (the analog of the rotating-partial-sum flush, src/fxyz.vhd:130-184).
    pos_i = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    pos_j = jnp.asarray(rng.uniform(-1, 1, (640, 3)), jnp.float32)
    _check(pos_i, pos_j, tile_i=64, tile_j=128)


def test_zero_mass_inert(rng):
    pos = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    f = body_force_pallas(pos, pos, jnp.zeros((64,), jnp.float32), interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(f), 0.0)


def test_coincident_bodies_finite():
    # All bodies at the same point: softening must keep everything finite and
    # the net force zero (reference semantics: softened self/coincident pairs).
    pos = jnp.zeros((32, 3), jnp.float32)
    f = body_force_pallas(pos, pos, interpret=INTERP)
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_array_equal(np.asarray(f), 0.0)


class TestSymmetric:
    """Newton's-third-law kernel (each pair once) vs oracle."""

    def _check(self, n, tile, chunk, masses=False, init_fn=None):
        from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric

        make = init_fn or init.uniform_random
        s = make(jax.random.key(n + 1), n)
        m = (s.mass * 1.5) if masses else None
        f = body_force_symmetric(s.pos, m, tile=tile, chunk=chunk,
                                 interpret=INTERP)
        ref = body_force_jnp(s.pos, s.pos, m)
        f, ref = np.asarray(f), np.asarray(ref)
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(f, ref, rtol=1e-4, atol=1e-5 * scale)

    def test_single_chunk(self):
        self._check(256, 64, 256)

    def test_multi_chunk_with_ragged_tail(self):
        # 3 chunks incl. a ragged one + far-padded tail: exercises the
        # tri-band, cross-rect, and padding paths together.
        self._check(300, 64, 128)

    def test_even_block_count_wrap_band(self):
        # nb even: the antipodal band (d = nb/2) must be half-masked or
        # pairs double-count.
        self._check(512, 64, 512)

    def test_mass_mode_single_chunk(self):
        # m_j-weighted rows + m_i-weighted reactions (VERDICT r1 item 2).
        self._check(256, 64, 256, masses=True, init_fn=init.plummer)

    def test_mass_mode_multi_chunk_ragged(self):
        self._check(300, 64, 128, masses=True, init_fn=init.plummer)

    def test_mass_mode_two_cluster(self):
        self._check(200, 64, 256, masses=True, init_fn=init.two_cluster)

    def test_mass_mode_zero_mass_inert(self):
        from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric

        s = init.uniform_random(jax.random.key(5), 128)
        f = body_force_symmetric(s.pos, jnp.zeros((128,), jnp.float32),
                                 tile=64, chunk=128, interpret=INTERP)
        np.testing.assert_array_equal(np.asarray(f), 0.0)

    def test_dispatch_routes_masses(self):
        from mini_nbody_tpu.ops.force import body_force

        s = init.plummer(jax.random.key(3), 96)
        f = body_force(s.pos, s.pos, s.mass, backend="sym", interpret=INTERP)
        ref = body_force_jnp(s.pos, s.pos, s.mass)
        scale = max(float(np.abs(np.asarray(ref)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(f), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5 * scale)

    def test_backend_dispatch_guards(self):
        import pytest as _pytest
        from mini_nbody_tpu.ops.force import body_force

        s = init.uniform_random(jax.random.key(0), 64)
        with _pytest.raises(ValueError, match="same array object"):
            body_force(s.pos, s.pos + 0.0, backend="sym")


class TestBodyForcePairMasses:
    def test_cross_pair_masses(self):
        from mini_nbody_tpu.ops.symmetric_force import body_force_pair

        ka, kb = jax.random.split(jax.random.key(7))
        pa = jax.random.uniform(ka, (96, 3), jnp.float32, -1, 1)
        pb = jax.random.uniform(kb, (200, 3), jnp.float32, -1, 1) + 3.0
        ma = jax.random.uniform(ka, (96,), jnp.float32, 0.1, 2.0)
        mb = jax.random.uniform(kb, (200,), jnp.float32, 0.1, 2.0)
        fa, fb = body_force_pair(pa, pb, ma, mb, tile=64, interpret=INTERP)
        ref_a = body_force_jnp(pa, pb, mb)
        ref_b = body_force_jnp(pb, pa, ma)
        scale = max(float(np.abs(np.asarray(ref_a)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(fa), np.asarray(ref_a),
                                   rtol=1e-4, atol=1e-5 * scale)
        np.testing.assert_allclose(np.asarray(fb), np.asarray(ref_b),
                                   rtol=1e-4, atol=1e-5 * scale)

    def test_mass_arg_pairing_enforced(self):
        from mini_nbody_tpu.ops.symmetric_force import body_force_pair

        pa = jnp.zeros((8, 3), jnp.float32)
        ma = jnp.ones((8,), jnp.float32)
        with pytest.raises(ValueError, match="both masses or neither"):
            body_force_pair(pa, pa + 1.0, ma, None, interpret=INTERP)


class TestSegmentedSymmetric:
    def _check(self, n, masses):
        from mini_nbody_tpu.ops.symmetric_force import (
            body_force_symmetric, body_force_symmetric_segmented)

        s = init.plummer(jax.random.key(n), n)
        m = s.mass if masses else None
        ref = np.asarray(body_force_symmetric(
            s.pos, m, softening=1e-2, tile=64, chunk=64, interpret=INTERP))
        seen = []
        got = np.asarray(body_force_symmetric_segmented(
            s.pos, m, softening=1e-2, tile=64, chunk=64, interpret=INTERP,
            pairs_per_dispatch=64 * 64 * 3,  # force several host dispatches
            progress=lambda d, t: seen.append((d, t))))
        # Same kernels, same order within each unit: bit-exact equivalence.
        np.testing.assert_array_equal(got, ref)
        assert len(seen) > 2 and seen[-1][0] == seen[-1][1]

    def test_unit_mass(self):
        self._check(300, masses=False)

    def test_masses_ragged(self):
        self._check(520, masses=True)


class TestFusedEuler:
    def test_matches_unfused_step(self):
        from mini_nbody_tpu.ops.pallas_force import euler_step_fused

        for n, masses in [(256, False), (300, True)]:
            s = init.plummer(jax.random.key(n), n)
            m = s.mass if masses else None
            p2, v2 = euler_step_fused(s.pos, s.vel, m, dt=0.01,
                                      softening=1e-2, tile_i=64, tile_j=128,
                                      interpret=INTERP)
            f = body_force_pallas(s.pos, s.pos, m, softening=1e-2,
                                  tile_i=64, tile_j=128, interpret=INTERP)
            vref = s.vel + 0.01 * f
            pref = s.pos + 0.01 * vref
            scale = max(float(np.abs(np.asarray(pref)).max()), 1.0)
            np.testing.assert_allclose(np.asarray(v2), np.asarray(vref),
                                       rtol=1e-5, atol=1e-6 * scale)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(pref),
                                       rtol=1e-5, atol=1e-6 * scale)

    def test_simulate_with_fused_config(self):
        from mini_nbody_tpu import SimConfig, simulate

        s = init.uniform_random(jax.random.key(2), 128)
        cfg = SimConfig(n=128, dt=1e-3, steps=5, backend="pallas",
                        softening=1e-2, tile_i=64, tile_j=128)
        ref = simulate(cfg, s)
        out = simulate(cfg.replace(fused_integrate=True), s)
        scale = float(np.abs(np.asarray(ref.pos)).max())
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   rtol=1e-5, atol=1e-6 * scale)

    def test_config_guard(self):
        from mini_nbody_tpu import SimConfig

        with pytest.raises(ValueError, match="fused_integrate"):
            SimConfig(n=64, fused_integrate=True, integrator="leapfrog",
                      backend="pallas")
        with pytest.raises(ValueError, match="fused_integrate"):
            SimConfig(n=64, fused_integrate=True, backend="sym")


def test_segmented_runners_cached():
    # jit caches by function identity: repeated segmented-force calls with
    # the same static config must reuse the SAME runner objects or every
    # call recompiles (r2 self-review finding).
    from mini_nbody_tpu.ops.symmetric_force import _segmented_runners

    a = _segmented_runners(1e-2, 64, 64, 3, True)
    b = _segmented_runners(1e-2, 64, 64, 3, True)
    assert a[0] is b[0] and a[1] is b[1]
    c = _segmented_runners(1e-2, 64, 128, 3, True)
    assert c[0] is not a[0]
