"""Analytic force VJP vs jnp autodiff ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu import SimConfig
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.autodiff import make_differentiable_force
from mini_nbody_tpu.ops.reference import body_force_jnp


def _loss_through(force, pos, mass=None):
    # arbitrary nonlinear scalar so the cotangent varies per element
    f = force(pos) if mass is None else force(pos, mass)
    return jnp.sum(jnp.sin(f) * jnp.cos(pos))


def test_grad_matches_jnp_autodiff():
    cfg = SimConfig(n=96, backend="pallas", softening=1e-2, tile_i=32,
                    tile_j=128)
    s = init.uniform_random(jax.random.key(0), 96)

    force = make_differentiable_force(cfg)
    grad_analytic = jax.grad(lambda p: _loss_through(force, p))(s.pos)

    def jnp_force(p):
        return body_force_jnp(p, p, softening=1e-2)

    grad_auto = jax.grad(lambda p: _loss_through(jnp_force, p))(s.pos)
    ga, gb = np.asarray(grad_analytic), np.asarray(grad_auto)
    scale = np.abs(gb).max()
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-4 * scale)


def test_grad_with_masses():
    cfg = SimConfig(n=64, backend="jnp", softening=1e-2, use_masses=True)
    s = init.plummer(jax.random.key(1), 64)
    force = make_differentiable_force(cfg)
    grad_analytic = jax.grad(
        lambda p: _loss_through(lambda q: force(q, s.mass), p)
    )(s.pos)

    def jnp_force(p):
        return body_force_jnp(p, p, s.mass, softening=1e-2)

    grad_auto = jax.grad(lambda p: _loss_through(jnp_force, p))(s.pos)
    ga, gb = np.asarray(grad_analytic), np.asarray(grad_auto)
    scale = max(np.abs(gb).max(), 1e-9)
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-4 * scale)


def _ref_vjp_f64(pos, g, mass, softening):
    """fp64 reference pos_bar with the self pair explicitly excluded.

    Masking the diagonal does not change the forward values (the self term is
    w * 0) but makes fp64 autodiff yield the exact gradient, free of the
    +-eps^-1.5 g_k cancellation residue (ADVICE.md round-1 high finding)."""
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64 (enabled only in forced-CPU test runs)")
    n = pos.shape[0]
    pos64 = jnp.asarray(np.asarray(pos), jnp.float64)
    g64 = jnp.asarray(np.asarray(g), jnp.float64)
    m64 = jnp.asarray(np.asarray(mass), jnp.float64)
    eye = jnp.eye(n, dtype=jnp.float64)

    def f(p):
        d = p[None, :, :] - p[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + softening
        w = r2 ** -1.5 * m64[None, :] * (1.0 - eye)
        return jnp.sum(d * w[:, :, None], axis=1)

    _, vjp = jax.vjp(f, pos64)
    return np.asarray(vjp(g64)[0])


@pytest.mark.parametrize("use_masses", [False, True])
def test_grad_at_default_softening(use_masses):
    """Self-pair cancellation fails catastrophically in fp32 at the default
    SOFTENING=1e-9 (w_self ~ 3e13) unless coincident pairs are masked; both
    backward paths must stay accurate there (ADVICE.md round-1 high)."""
    from mini_nbody_tpu.ops.autodiff import _vjp_pos
    from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_pallas
    from mini_nbody_tpu.utils.config import SOFTENING

    n = 256
    s = init.plummer(jax.random.key(11), n) if use_masses else \
        init.uniform_random(jax.random.key(11), n)
    g = jax.random.normal(jax.random.key(12), (n, 3), jnp.float32)
    ref = _ref_vjp_f64(s.pos, g, s.mass, SOFTENING)
    scale = np.abs(ref).max()

    got_jnp = np.asarray(_vjp_pos(s.pos, g, s.mass, SOFTENING))
    np.testing.assert_allclose(got_jnp, ref, rtol=1e-3, atol=1e-4 * scale)

    interp = jax.default_backend() != "tpu"
    got_pal = np.asarray(
        vjp_pos_pallas(s.pos, g, s.mass if use_masses else None,
                       softening=SOFTENING, tile_i=64, tile_j=128,
                       interpret=interp)
    )
    np.testing.assert_allclose(got_pal, ref, rtol=1e-3, atol=1e-4 * scale)


def test_vjp_chunked_matches_unchunked():
    from mini_nbody_tpu.ops.autodiff import _vjp_pos

    s = init.uniform_random(jax.random.key(2), 300)
    g = jax.random.normal(jax.random.key(3), (300, 3), jnp.float32)
    full = _vjp_pos(s.pos, g, s.mass, 1e-2, row_chunk=512)
    chunked = _vjp_pos(s.pos, g, s.mass, 1e-2, row_chunk=64)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-4,
        atol=1e-5 * float(np.abs(np.asarray(full)).max()),
    )


def test_finite_difference():
    # Directional derivative via central differences in fp64 (CPU x64 on).
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64 (enabled only in forced-CPU test runs)")
    s = init.uniform_random(jax.random.key(4), 32)
    pos64 = jnp.asarray(np.asarray(s.pos), jnp.float64)
    v = jax.random.normal(jax.random.key(5), pos64.shape, jnp.float64)
    soft = 1e-2

    def loss(p):
        f = body_force_jnp(p, p, softening=soft)
        return jnp.sum(jnp.sin(f))

    # analytic via our VJP formula (through custom_vjp machinery)
    cfg = SimConfig(n=32, backend="jnp", softening=soft)
    force = make_differentiable_force(cfg)
    g = jax.grad(lambda p: jnp.sum(jnp.sin(force(p))))(pos64)
    eps = 1e-6
    fd = (loss(pos64 + eps * v) - loss(pos64 - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=1e-4)


def test_grad_through_trajectory():
    # End-to-end differentiable simulation: gradient of a final-state scalar
    # w.r.t. initial positions through several integration steps (scan
    # backprop uses the custom force VJP at every step).
    from mini_nbody_tpu.ops.integrators import leapfrog_step
    from mini_nbody_tpu.models.state import BodyState

    cfg = SimConfig(n=48, backend="jnp", softening=1e-2, dt=1e-3)
    force_diff = make_differentiable_force(cfg)
    s = init.plummer(jax.random.key(8), 48)

    def force3(pos_i, pos_j, mass_j):
        return force_diff(pos_i, mass_j)

    def rollout(pos0, steps=5):
        state = BodyState(pos=pos0, vel=s.vel, mass=s.mass)
        acc = force3(pos0, pos0, s.mass)
        for _ in range(steps):
            state, acc = leapfrog_step(state, acc, force3, cfg.dt)
        return jnp.sum(state.pos ** 2)

    def rollout_ref(pos0, steps=5):
        def f3(pos_i, pos_j, mass_j):
            return body_force_jnp(pos_i, pos_j, mass_j, softening=1e-2)

        state = BodyState(pos=pos0, vel=s.vel, mass=s.mass)
        acc = f3(pos0, pos0, s.mass)
        for _ in range(steps):
            state, acc = leapfrog_step(state, acc, f3, cfg.dt)
        return jnp.sum(state.pos ** 2)

    ga = np.asarray(jax.grad(rollout)(s.pos))
    gb = np.asarray(jax.grad(rollout_ref)(s.pos))
    scale = np.abs(gb).max()
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-3 * scale)


class TestPallasVJPKernel:
    def _check(self, n, mass):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_pallas

        s = init.uniform_random(jax.random.key(n), n)
        g = jax.random.normal(jax.random.key(n + 1), (n, 3), jnp.float32)
        interp = jax.default_backend() != "tpu"
        m = s.mass * 1.5 if mass else None
        pb = vjp_pos_pallas(s.pos, g, m, softening=1e-2,
                            tile_i=64, tile_j=128, interpret=interp)

        def f(p):
            return body_force_jnp(p, p, m, softening=1e-2)

        _, vjp = jax.vjp(f, s.pos)
        ref = np.asarray(vjp(g)[0])
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(pb), ref,
                                   rtol=1e-3, atol=1e-4 * scale)

    def test_unit_mass(self):
        self._check(256, mass=False)

    def test_masses(self):
        self._check(256, mass=True)

    def test_ragged_far_padding(self):
        self._check(300, mass=False)

    def test_ragged_zero_padding_masses(self):
        self._check(300, mass=True)


class TestSymmetricVJPKernel:
    """Backward with each unordered pair computed once (the pairwise
    gradient contribution is antisymmetric, like the force)."""

    def _check(self, n, mass, softening=1e-2):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym

        s = init.plummer(jax.random.key(n), n)
        g = jax.random.normal(jax.random.key(n + 1), (n, 3), jnp.float32)
        interp = jax.default_backend() != "tpu"
        m = s.mass if mass else None
        got = np.asarray(vjp_pos_sym(s.pos, g, m, softening=softening,
                                     tile=64, interpret=interp))

        def f(p):
            return body_force_jnp(p, p, m, softening=softening)

        if softening < 1e-6:
            ref = _ref_vjp_f64(s.pos, g,
                               s.mass if mass else jnp.ones((n,)), softening)
        else:
            _, vjp = jax.vjp(f, s.pos)
            ref = np.asarray(vjp(g)[0])
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4 * scale)

    def test_unit_mass(self):
        self._check(256, mass=False)

    def test_masses_ragged(self):
        self._check(300, mass=True)

    def test_even_band_count(self):
        self._check(512, mass=True)

    def test_default_softening(self):
        # self/coincident mask at SOFTENING=1e-9
        self._check(256, mass=True, softening=1e-9)

    def test_grad_routes_through_sym_backward(self):
        # make_differentiable_force uses vjp_pos_sym at these sizes; the
        # end-to-end gradient must match jnp autodiff.
        cfg = SimConfig(n=96, backend="pallas", softening=1e-2, tile_i=32,
                        tile_j=128)
        s = init.uniform_random(jax.random.key(0), 96)
        force = make_differentiable_force(cfg)
        ga = np.asarray(
            jax.grad(lambda p: _loss_through(force, p))(s.pos))
        gb = np.asarray(jax.grad(
            lambda p: _loss_through(
                lambda q: body_force_jnp(q, q, softening=1e-2), p))(s.pos))
        scale = np.abs(gb).max()
        np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-4 * scale)


def test_differentiable_step_api():
    from mini_nbody_tpu.sim import init_carry, make_step_fn

    cfg = SimConfig(n=64, backend="jnp", softening=1e-2, dt=1e-3)
    s = init.uniform_random(jax.random.key(9), 64)
    step = make_step_fn(cfg, differentiable=True)

    def loss(pos0):
        from mini_nbody_tpu.models.state import BodyState

        carry = init_carry(cfg, BodyState(pos=pos0, vel=s.vel, mass=s.mass))
        for _ in range(3):
            carry = step(carry)
        return jnp.sum(carry[0].pos ** 2)

    g = jax.grad(loss)(s.pos)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


class TestMassGradients:
    """Gradients w.r.t. per-body masses (dF_j/dm_k = w d_jk): new capability
    beyond the reference (fixed-function hardware has no derivative at all).
    """

    def _ref(self, pos, g, mass, softening):
        def f(args):
            p, m = args
            return body_force_jnp(p, p, m, softening=softening)

        _, vjp = jax.vjp(f, (pos, mass))
        return vjp(g)[0]

    @pytest.mark.parametrize("backend", ["jnp", "pallas"])
    def test_vjp_matches_autodiff(self, backend):
        n = 192
        s = init.plummer(jax.random.key(41), n)
        g = jax.random.normal(jax.random.key(42), (n, 3), jnp.float32)
        soft = 1e-2
        cfg = SimConfig(n=n, backend=backend, softening=soft,
                        use_masses=True, tile_i=32, tile_j=128)
        force = make_differentiable_force(cfg, mass_grad=True)
        _, vjp = jax.vjp(lambda p, m: force(p, m), s.pos, s.mass)
        pos_bar, mass_bar = vjp(g)
        ref_pos, ref_mass = self._ref(s.pos, g, s.mass, soft)
        sp = float(np.abs(np.asarray(ref_pos)).max())
        sm = float(np.abs(np.asarray(ref_mass)).max())
        np.testing.assert_allclose(np.asarray(pos_bar), np.asarray(ref_pos),
                                   rtol=1e-3, atol=1e-4 * sp)
        np.testing.assert_allclose(np.asarray(mass_bar), np.asarray(ref_mass),
                                   rtol=1e-3, atol=1e-4 * sm)

    def test_kernel_direct(self):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym

        n = 300  # ragged
        s = init.plummer(jax.random.key(43), n)
        g = jax.random.normal(jax.random.key(44), (n, 3), jnp.float32)
        interp = jax.default_backend() != "tpu"
        pos_bar, mass_bar = vjp_pos_sym(s.pos, g, s.mass, softening=1e-2,
                                        tile=64, interpret=interp,
                                        mass_grad=True)
        ref_pos, ref_mass = self._ref(s.pos, g, s.mass, 1e-2)
        sm = float(np.abs(np.asarray(ref_mass)).max())
        np.testing.assert_allclose(np.asarray(mass_bar),
                                   np.asarray(ref_mass),
                                   rtol=1e-3, atol=1e-4 * sm)
        sp = float(np.abs(np.asarray(ref_pos)).max())
        np.testing.assert_allclose(np.asarray(pos_bar), np.asarray(ref_pos),
                                   rtol=1e-3, atol=1e-4 * sp)

    def test_requires_masses(self):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym

        with pytest.raises(ValueError, match="mass"):
            vjp_pos_sym(jnp.zeros((8, 3)), jnp.zeros((8, 3)),
                        mass_grad=True, interpret=True)
        cfg = SimConfig(n=8, backend="jnp", use_masses=False)
        with pytest.raises(ValueError, match="mass"):
            make_differentiable_force(cfg, mass_grad=True)


def test_backward_routing_respects_precision_class():
    # mxu with the default pair_dtype='float32' runs Precision.HIGHEST —
    # fp32-exact class — and must KEEP the fp32 backward; only bf16-class
    # forwards (sym_mxu, or mxu with bfloat16 operands) get the bf16-class
    # MXU backward (code-review r2c finding).
    from mini_nbody_tpu.utils.config import SimConfig

    assert not SimConfig(n=64, backend="mxu").bf16_class()
    assert not SimConfig(n=64, backend="sym").bf16_class()
    assert not SimConfig(n=64, backend="pallas").bf16_class()
    assert SimConfig(n=64, backend="mxu", pair_dtype="bfloat16").bf16_class()
    assert SimConfig(n=64, backend="sym_mxu").bf16_class()


class TestSymBackwardCoincident:
    """vjp_pos_sym coincident routing: 'auto'/'fast' vs 'masked' on
    duplicate-free inputs agree to a few ulp (dropping the select changes
    XLA's FMA contraction in this kernel's elementwise chains — docstring;
    NOT bitwise like the matmul-fed forward), duplicates route to the
    masked kernels exactly, and cfg threads through
    make_differentiable_force."""

    # few-ulp FMA-contraction window (measured max ~5e-6 relative)
    RTOL = 3e-5
    ATOL_SCALE = 3e-5

    def _close(self, a, b):
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=self.RTOL,
                                   atol=self.ATOL_SCALE * scale)

    def _run(self, mode, pos, g, m=None, mass_grad=False):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym

        interp = jax.default_backend() != "tpu"
        out = vjp_pos_sym(pos, g, m, softening=1e-9, tile=64,
                          interpret=interp, mass_grad=mass_grad,
                          coincident=mode)
        return ([np.asarray(o) for o in out] if mass_grad
                else [np.asarray(out)])

    def test_unit_and_mass_grad_equivalence(self):
        s = init.plummer(jax.random.key(31), 300)
        g = jax.random.normal(jax.random.key(32), (300, 3), jnp.float32)
        ref_u = self._run("masked", s.pos, g)
        ref_m = self._run("masked", s.pos, g, s.mass, mass_grad=True)
        for mode in ("auto", "fast"):
            for a, b in zip(self._run(mode, s.pos, g), ref_u):
                self._close(a, b)
            for a, b in zip(self._run(mode, s.pos, g, s.mass,
                                      mass_grad=True), ref_m):
                self._close(a, b)

    def test_duplicates_route_to_masked(self):
        # 'auto' on a duplicate input runs the fully-masked kernels — the
        # result must be EXACTLY the 'masked' one (same kernel, same input).
        s = init.uniform_random(jax.random.key(33), 300)
        dup = s.pos.at[200].set(s.pos[3])  # cross-tile duplicate (tile=64)
        g = jax.random.normal(jax.random.key(34), (300, 3), jnp.float32)
        ref = self._run("masked", dup, g)
        got = self._run("auto", dup, g)
        np.testing.assert_array_equal(got[0], ref[0])
        assert np.isfinite(got[0]).all()

    def test_cfg_threads_coincident_to_backward(self):
        # grad through the differentiable force with coincident='fast'
        # must match the 'masked' grad (few-ulp window) on duplicate-free
        # input (the sym backward is the only coincident-aware piece here;
        # the fp32 sym forward computes w*d directly and needs no mask).
        from mini_nbody_tpu import SimConfig
        from mini_nbody_tpu.ops.autodiff import make_differentiable_force

        n = 192
        s = init.uniform_random(jax.random.key(35), n)

        grads = {}
        for mode in ("fast", "masked"):
            cfg = SimConfig(n=n, backend="sym", sym_tile=64,
                            interpret=True, coincident=mode)
            force = make_differentiable_force(cfg)
            grads[mode] = np.asarray(jax.grad(
                lambda p: jnp.sum(force(p) ** 2))(s.pos))
        self._close(grads["fast"], grads["masked"])


class TestOrderedBackwardCoincident:
    """vjp_pos_pallas overlap-conditional masking (square call): few-ulp
    equivalence on duplicate-free inputs, exact masked routing of
    duplicates. Tiles chosen so the grid has off-overlap blocks."""

    def _run(self, mode, pos, g, m=None):
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_pallas

        interp = jax.default_backend() != "tpu"
        return np.asarray(vjp_pos_pallas(
            pos, g, m, softening=1e-9, tile_i=64, tile_j=128,
            interpret=interp, coincident=mode))

    def _close(self, a, b):
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5 * scale)

    @pytest.mark.parametrize("masses", [False, True])
    def test_matches_masked(self, masses):
        s = init.plummer(jax.random.key(61), 300)
        g = jax.random.normal(jax.random.key(62), (300, 3), jnp.float32)
        m = s.mass if masses else None
        ref = self._run("masked", s.pos, g, m)
        for mode in ("auto", "fast"):
            self._close(self._run(mode, s.pos, g, m), ref)

    def test_duplicates_route_to_masked(self):
        s = init.uniform_random(jax.random.key(63), 300)
        dup = s.pos.at[200].set(s.pos[3])
        g = jax.random.normal(jax.random.key(64), (300, 3), jnp.float32)
        got = self._run("auto", dup, g)
        np.testing.assert_array_equal(got, self._run("masked", dup, g))
        assert np.isfinite(got).all()
