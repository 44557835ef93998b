"""MXU-hybrid backward kernel (ops/vjp_mxu.py) vs the analytic jnp VJP.

Interpret mode on CPU is exact fp32 (the compensated [hi|lo] operand split
sums back losslessly and CPU matmuls are fp32); on real TPU the matmuls run
single-pass bf16 with the uniform ~4e-3-relative w/c rounding class
documented in the module docstring and measured in benchmarks/RESULTS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.autodiff import _vjp_pos
from mini_nbody_tpu.ops.vjp_mxu import vjp_pos_sym_mxu

INTERP = jax.default_backend() != "tpu"
RTOL, ATOL_SCALE = ((1e-4, 1e-4) if INTERP else (2e-2, 5e-3))


def _check(n, tile, masses=False, softening=1e-2, init_fn=None):
    make = init_fn or (init.plummer if masses else init.uniform_random)
    s = make(jax.random.key(n + 1), n)
    g = jax.random.normal(jax.random.key(n + 7), (n, 3), jnp.float32)
    m = s.mass if masses else None
    out = vjp_pos_sym_mxu(s.pos, g, m, softening=softening, tile=tile,
                          interpret=INTERP)
    ref = _vjp_pos(s.pos, g, m if masses else jnp.ones((n,), jnp.float32),
                   softening)
    out, ref = np.asarray(out), np.asarray(ref)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL_SCALE * scale)


def test_unit_mass_single_band():
    _check(256, 64)


def test_unit_mass_default_softening_coincident_mask():
    _check(256, 64, softening=1e-9)


def test_ragged_tail_far_padding():
    _check(300, 64, softening=1e-9)


def test_even_block_count_wrap_band():
    _check(512, 64)


def test_mass_mode_plummer():
    _check(256, 64, masses=True)


def test_mass_mode_two_cluster():
    _check(200, 64, masses=True, init_fn=init.two_cluster)


def test_mass_mode_ragged():
    _check(300, 64, masses=True, softening=1e-9)


def test_mass_grad():
    n = 256
    s = init.plummer(jax.random.key(1), n)
    g = jax.random.normal(jax.random.key(2), (n, 3), jnp.float32)
    pout, mout = vjp_pos_sym_mxu(s.pos, g, s.mass, softening=1e-2, tile=64,
                                 interpret=INTERP, mass_grad=True)
    pref, mref = _vjp_pos(s.pos, g, s.mass, 1e-2, with_mass_grad=True)
    pscale = max(np.abs(np.asarray(pref)).max(), 1.0)
    mscale = max(np.abs(np.asarray(mref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(pout), np.asarray(pref),
                               rtol=RTOL, atol=ATOL_SCALE * pscale)
    np.testing.assert_allclose(np.asarray(mout), np.asarray(mref),
                               rtol=RTOL, atol=ATOL_SCALE * mscale)


def test_mass_grad_requires_masses():
    pos = init.uniform_random(jax.random.key(0), 64).pos
    g = jnp.zeros((64, 3), jnp.float32)
    with pytest.raises(ValueError):
        vjp_pos_sym_mxu(pos, g, mass_grad=True, interpret=INTERP)


def test_zero_cotangent_zero_grad():
    pos = init.uniform_random(jax.random.key(0), 128).pos
    out = vjp_pos_sym_mxu(pos, jnp.zeros((128, 3), jnp.float32), tile=64,
                          interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_translation_invariance():
    # The pairwise gradient is antisymmetric: the total over all bodies of
    # pos_bar vanishes for any cotangent (momentum-conservation analog).
    n = 256
    s = init.uniform_random(jax.random.key(9), n)
    g = jax.random.normal(jax.random.key(10), (n, 3), jnp.float32)
    out = np.asarray(vjp_pos_sym_mxu(s.pos, g, tile=64, interpret=INTERP))
    scale = np.abs(out).max() * n
    assert np.abs(out.sum(axis=0)).max() < 1e-5 * scale


@pytest.mark.parametrize("nk,nj,masses", [(128, 256, False), (100, 300, True),
                                          (256, 256, True)])
def test_rect_vs_fp32_rect(nk, nj, masses):
    from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_rect
    from mini_nbody_tpu.ops.vjp_mxu import vjp_rect_mxu

    make = init.plummer if masses else init.uniform_random
    s = make(jax.random.key(1), nj)
    g = jax.random.normal(jax.random.key(2), (nj, 3), jnp.float32)
    pk, gk = s.pos[:nk], g[:nk]
    mk, mj = (s.mass[:nk], s.mass) if masses else (None, None)
    ref = vjp_pos_rect(pk, gk, s.pos, g, mk, mj, softening=1e-2,
                       interpret=INTERP)
    out = vjp_rect_mxu(pk, gk, s.pos, g, mk, mj, softening=1e-2, tile=64,
                       interpret=INTERP)
    ref, out = np.asarray(ref), np.asarray(out)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out, ref, rtol=RTOL, atol=ATOL_SCALE * scale)


def test_rect_mass_arg_mismatch():
    pos = init.uniform_random(jax.random.key(0), 64).pos
    g = jnp.zeros((64, 3), jnp.float32)
    from mini_nbody_tpu.ops.vjp_mxu import vjp_rect_mxu
    with pytest.raises(ValueError):
        vjp_rect_mxu(pos, g, pos, g, mass_k=jnp.ones((64,)),
                     interpret=INTERP)


def test_large_n_mxu_backward_routes_rect_self(monkeypatch):
    # Beyond the symmetric kernel's single-launch bound the mxu backward
    # streams j via the rect kernel called square (pos vs pos). Shrink the
    # bound so the branch runs at test size; the result must match the
    # analytic jnp VJP.
    from mini_nbody_tpu.ops import autodiff

    monkeypatch.setattr(autodiff, "_SYM_BWD_MAX", 128)
    n = 256
    s = init.uniform_random(jax.random.key(11), n)
    g0 = jax.random.normal(jax.random.key(12), (n, 3), jnp.float32)
    diff = autodiff.make_body_force_diff(
        lambda p, m: jnp.zeros_like(p), 1e-2, backward="mxu",
        interpret=INTERP, unit_mass=True)
    out = jax.vjp(diff, s.pos, jnp.ones((n,), jnp.float32))[1](g0)[0]
    ref = _vjp_pos(s.pos, g0, jnp.ones((n,), jnp.float32), 1e-2)
    scale = max(np.abs(np.asarray(ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL_SCALE * scale)


class TestCoincidentRouting:
    """coincident='auto'/'fast' must be BITWISE equal to 'masked' on
    duplicate-free inputs (multi-band tiling: diagonal, off-diagonal and
    tail-pad paths all exercised), and 'auto' must route duplicate inputs
    back through the masked kernels (again bitwise)."""

    def _run(self, mode, pos, g, m=None, mass_grad=False):
        out = vjp_pos_sym_mxu(pos, g, m, softening=1e-9, tile=64,
                              interpret=INTERP, mass_grad=mass_grad,
                              coincident=mode)
        return ([np.asarray(o) for o in out] if mass_grad
                else [np.asarray(out)])

    def test_unit_mass_bitwise(self):
        s = init.uniform_random(jax.random.key(21), 300)
        g = jax.random.normal(jax.random.key(22), (300, 3), jnp.float32)
        ref = self._run("masked", s.pos, g)
        for mode in ("auto", "fast"):
            for a, b in zip(self._run(mode, s.pos, g), ref):
                np.testing.assert_array_equal(a, b)

    def test_mass_grad_bitwise(self):
        s = init.plummer(jax.random.key(23), 300)
        g = jax.random.normal(jax.random.key(24), (300, 3), jnp.float32)
        ref = self._run("masked", s.pos, g, s.mass, mass_grad=True)
        for mode in ("auto", "fast"):
            for a, b in zip(self._run(mode, s.pos, g, s.mass,
                                      mass_grad=True), ref):
                np.testing.assert_array_equal(a, b)

    def test_duplicates_route_to_masked(self):
        s = init.uniform_random(jax.random.key(25), 300)
        dup = s.pos.at[200].set(s.pos[3])  # cross-tile duplicate (tile=64)
        g = jax.random.normal(jax.random.key(26), (300, 3), jnp.float32)
        ref = self._run("masked", dup, g)
        got = self._run("auto", dup, g)
        np.testing.assert_array_equal(got[0], ref[0])
        assert np.isfinite(got[0]).all()

    def test_validation(self):
        pos = init.uniform_random(jax.random.key(27), 64).pos
        with pytest.raises(ValueError, match="coincident"):
            vjp_pos_sym_mxu(pos, jnp.zeros_like(pos), interpret=INTERP,
                            coincident="never")


class TestRectSquareCoincident:
    """vjp_rect_mxu called SQUARE (array identity, autodiff's N>bound
    branch): overlap-masked routing must be bitwise equal to masked on
    duplicate-free inputs (w/c feed matmuls directly), route duplicates
    to the all-masked kernel, and ignore the flag on true rect calls."""

    KW = dict(softening=1e-9, tile=64, interpret=INTERP)

    def _sq(self, mode, pos, g):
        from mini_nbody_tpu.ops.vjp_mxu import vjp_rect_mxu

        return np.asarray(vjp_rect_mxu(pos, g, pos, g, coincident=mode,
                                       **self.KW))

    def test_square_bitwise(self):
        s = init.uniform_random(jax.random.key(71), 300)
        g = jax.random.normal(jax.random.key(72), (300, 3), jnp.float32)
        ref = self._sq("masked", s.pos, g)
        for mode in ("auto", "fast"):
            np.testing.assert_array_equal(self._sq(mode, s.pos, g), ref)

    def test_square_duplicates_route_to_masked(self):
        s = init.uniform_random(jax.random.key(73), 300)
        dup = s.pos.at[200].set(s.pos[3])
        g = jax.random.normal(jax.random.key(74), (300, 3), jnp.float32)
        got = self._sq("auto", dup, g)
        np.testing.assert_array_equal(got, self._sq("masked", dup, g))
        assert np.isfinite(got).all()

    def test_rect_embedded_ignores_fast(self):
        from mini_nbody_tpu.ops.vjp_mxu import vjp_rect_mxu

        s = init.uniform_random(jax.random.key(75), 300)
        g = jax.random.normal(jax.random.key(76), (300, 3), jnp.float32)
        ref = np.asarray(vjp_rect_mxu(s.pos[:200], g[:200], s.pos, g,
                                      coincident="masked", **self.KW))
        got = np.asarray(vjp_rect_mxu(s.pos[:200], g[:200], s.pos, g,
                                      coincident="fast", **self.KW))
        np.testing.assert_array_equal(got, ref)
        assert np.isfinite(got).all()
