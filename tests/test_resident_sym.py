"""Multi-step fused symmetric resident kernel (ops/resident_sym.py) vs the
streamed step loop, both precision classes, euler + leapfrog."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu import SimConfig, simulate
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.resident_sym import (
    RESIDENT_SYM_MAX_N,
    simulate_resident_sym,
    simulate_resident_sym_leapfrog,
)

INTERP = jax.default_backend() != "tpu"


def _check(n, steps, masses=False, mxu=False, integrator="euler", tile=64,
           softening=1e-2, rtol=1e-4, atol=1e-5):
    """Resident trajectory vs the streamed jnp step loop. In interpret mode
    even mxu=True is exact fp32 (the interpreter's matmuls don't round);
    on the real chip mxu mode carries the legitimate bf16-accumulate error
    class (compensated-split, ~1e-4 median force error — ops/sym_mxu_force)
    so those runs get the class tolerance."""
    if mxu and not INTERP:
        rtol, atol = 2e-2, 2e-3
    make = init.plummer if masses else init.uniform_random
    s = make(jax.random.key(n), n)
    cfg = SimConfig(n=n, dt=1e-3, steps=steps, backend="jnp",
                    softening=softening, use_masses=masses,
                    integrator=integrator, resident=False)
    ref = simulate(cfg, s)
    from mini_nbody_tpu.ops.resident_sym import (
        simulate_resident_sym_yoshida4)

    fn = {"leapfrog": simulate_resident_sym_leapfrog,
          "yoshida4": simulate_resident_sym_yoshida4,
          "euler": simulate_resident_sym}[integrator]
    pos, vel = fn(s.pos, s.vel, s.mass if masses else None, steps=steps,
                  dt=1e-3, softening=softening, tile=tile, mxu=mxu,
                  interpret=INTERP)
    scale = max(np.abs(np.asarray(ref.pos)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(ref.pos),
                               rtol=rtol, atol=atol * scale)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(ref.vel),
                               rtol=rtol, atol=atol * scale)


def test_euler_unit_mass_multi_step():
    _check(256, 5)


def test_euler_mxu_mode():
    _check(256, 5, mxu=True)


def test_euler_mass_mode():
    _check(256, 4, masses=True, mxu=True)


def test_euler_ragged_tail_far_padding():
    _check(300, 3)


def test_euler_ragged_mass_mxu():
    _check(300, 3, masses=True, mxu=True)


def test_single_step_single_block():
    _check(100, 1, tile=128)


def test_multi_block_odd_count():
    _check(320, 3, tile=64)  # nb = 5: odd diagonal-band wrap


def test_even_block_antipodal_dedup():
    _check(256, 3, tile=64)  # nb = 4: even-nb half-band mask


def test_default_softening_self_pair_mask():
    _check(128, 2, tile=32, softening=1e-9)


def test_leapfrog_unit_mass():
    _check(200, 5, integrator="leapfrog")


def test_leapfrog_mass_mxu():
    _check(256, 6, masses=True, mxu=True, integrator="leapfrog")


def test_leapfrog_single_step():
    # steps=1 never enters the kernel: pre-kick + drift + closing kick only
    _check(100, 1, integrator="leapfrog", tile=128)


def test_yoshida4_unit_mass():
    _check(200, 4, integrator="yoshida4")


def test_yoshida4_mass_mxu():
    _check(256, 5, masses=True, mxu=True, integrator="yoshida4")


def test_yoshida4_single_step():
    # steps=1 still enters the kernel (3*1-1 = 2 interior substeps)
    _check(100, 1, integrator="yoshida4", tile=128)


def test_yoshida4_ragged_tail():
    _check(300, 3, integrator="yoshida4", tile=64)


def test_yoshida4_phase_split_bitwise():
    """Splitting the interior substep chain across dispatches with
    y4_phase carrying the cycle position must be bitwise identical to the
    single-dispatch run (what sim's watchdog segmentation relies on)."""
    from mini_nbody_tpu.ops.resident_sym import y4_cycle

    s = init.plummer(jax.random.key(11), 200)
    cycle, _ = y4_cycle(1e-3)
    one = simulate_resident_sym(s.pos, s.vel, s.mass, steps=8, dt=1e-3,
                                softening=1e-2, tile=64, interpret=INTERP,
                                y4=cycle)
    p, v = s.pos, s.vel
    for start, k in ((0, 3), (3, 4), (7, 1)):
        p, v = simulate_resident_sym(p, v, s.mass, steps=k, dt=1e-3,
                                     softening=1e-2, tile=64,
                                     interpret=INTERP, y4=cycle,
                                     y4_phase=start)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(one[0]))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(one[1]))


def test_yoshida4_matches_streamed_composition():
    """The fused substep chain's update arithmetic is op-for-op the
    streamed composition's (unmerged double half-kicks): against a
    reference loop that applies integrators.yoshida4_step with the SAME
    resident-class force values the trajectories should agree to fp32
    tolerance (the force kernels differ, so this is the allclose gate;
    the bitwise gates are the phase-split and standalone-vs-ensemble
    tests)."""
    from mini_nbody_tpu.ops.resident_sym import (
        simulate_resident_sym_yoshida4)

    _ = simulate_resident_sym_yoshida4  # exercised via _check
    _check(192, 3, integrator="yoshida4", tile=64)


def test_n_bound():
    pos = jnp.zeros((RESIDENT_SYM_MAX_N + 1, 3))
    with pytest.raises(ValueError, match="VMEM"):
        simulate_resident_sym(pos, pos, steps=1, dt=1e-3, interpret=INTERP)


def test_steps_bound():
    pos = jnp.zeros((8, 3))
    with pytest.raises(ValueError, match="steps"):
        simulate_resident_sym(pos, pos, steps=0, dt=1e-3, interpret=INTERP)


def test_zero_mass_sources_inert():
    n = 128
    s = init.uniform_random(jax.random.key(3), n)
    mass = jnp.ones((n,)).at[n // 2:].set(0.0)
    pos, _ = simulate_resident_sym(s.pos, s.vel, mass, steps=2, dt=1e-3,
                                   softening=1e-2, tile=32, interpret=INTERP)
    pos2, _ = simulate_resident_sym(
        s.pos[: n // 2], s.vel[: n // 2], mass[: n // 2], steps=2, dt=1e-3,
        softening=1e-2, tile=32, interpret=INTERP)
    np.testing.assert_allclose(np.asarray(pos[: n // 2]), np.asarray(pos2),
                               rtol=1e-5, atol=1e-7)


def test_simulate_routes_resident_when_forced():
    """cfg.resident=True sends simulate() through the resident kernel (the
    interpret path off-TPU), for euler AND leapfrog, matching the pinned
    streamed run."""
    n = 192
    for integrator in ("euler", "leapfrog"):
        s = init.plummer(jax.random.key(7), n)
        cfg = SimConfig(n=n, dt=1e-3, steps=4, softening=1e-2,
                        use_masses=True, integrator=integrator)
        out_res = simulate(cfg.replace(resident=True), s)
        out_str = simulate(cfg.replace(resident=False, backend="jnp"), s)
        scale = np.abs(np.asarray(out_str.pos)).max()
        np.testing.assert_allclose(
            np.asarray(out_res.pos), np.asarray(out_str.pos),
            rtol=1e-4, atol=1e-5 * scale)


def test_auto_tile_admission_and_picks():
    """auto_tile returns the measured-fastest VMEM-admissible tile: every
    choice respects the compile-verified _MAX_NB table, and the probed
    optima (benchmarks/probe_resident_tiles.py, v5e round 3b) are pinned."""
    from mini_nbody_tpu.ops.resident_sym import _MAX_NB, auto_tile
    from mini_nbody_tpu.utils.config import round_up

    # probed optima: tile=1024 wins the whole admissible mxu range
    assert auto_tile(4096, True) == 1024     # 309.8 G/s vs 286.8 streamed
    assert auto_tile(65536, True) == 1024    # 403.4 vs 330 at tile=512
    assert auto_tile(114688, True) == 1024   # largest verified nb=112
    assert auto_tile(131072, True) == 768    # nb=128 at 1024 exceeds VMEM
    # fp32 post-diet (round 4): 1024 admits to nb=56, 896 to nb=112
    assert auto_tile(4096, False) == 1024    # 254.9 G/s measured on chip
    assert auto_tile(57344, False) == 1024   # largest verified nb=56
    assert auto_tile(65536, False) == 896    # 319.1 vs 278.5 at 768
    assert auto_tile(131072, False) == 640   # 768 nb=171 exceeds VMEM;
    # 640 admits the cap at nb=205: 240.9 vs 218.5 G/s at 512
    # aligned small tiles beat padded big ones (768 at n=1024 would pad
    # to 1536 = 2.25x the pair work)
    assert auto_tile(512, True) == 512
    assert auto_tile(1024, False) == 1024    # nb=1, no padding: admissible
    # fp32 MASS mode schedules one more live (T,T): 1024 is inadmissible
    # at ANY nb (17.3 MB scoped VMEM measured), so the mass table caps
    # lower — N=1024 falls back to 512, large N to 768/640
    assert auto_tile(1024, False, masses=True) == 512
    assert auto_tile(65536, False, masses=True) == 768
    assert auto_tile(131072, False, masses=True) == 640
    # mxu mass admission matches unit-mass (mass folds into the operand)
    assert auto_tile(4096, True, masses=True) == 1024
    # admission invariant for arbitrary N
    from mini_nbody_tpu.ops.resident_sym import _admission
    for n in (7, 600, 5000, 100000, 120000, 131072):
        for mxu in (True, False):
            for masses in (False, True):
                t = auto_tile(n, mxu, masses=masses)
                assert round_up(n, t) // t <= _admission(mxu, masses)[t]


def test_resident_config_validation():
    with pytest.raises(ValueError, match="resident"):
        SimConfig(n=64, resident=True, backend="pallas")
    with pytest.raises(ValueError, match="resident"):
        SimConfig(n=64, resident=True, mesh_shape=(8,), comm="ring")
    # symmetric-class backends are fine
    SimConfig(n=64, resident=True, backend="sym_mxu")


def test_leapfrog_energy_drift():
    """The drift-gate integrator on the resident kernel: bounded energy
    drift over a real KDK run (the property euler doesn't have)."""
    from mini_nbody_tpu.ops import diagnostics as diag

    n = 256
    s = init.plummer(jax.random.key(11), n)
    cfg = SimConfig(n=n, dt=1e-3, steps=100, softening=1e-2,
                    use_masses=True, integrator="leapfrog", resident=True)
    e0 = float(diag.total_energy(s, cfg.softening))
    out = simulate(cfg, s)
    e1 = float(diag.total_energy(out, cfg.softening))
    assert abs(e1 - e0) / abs(e0) < 1e-3


class TestCoincidentFast:
    """coincident='fast' drops the off-diagonal mask (diagonal self pairs
    and FAR pads stay exact); on duplicate-free inputs the trajectory must
    match 'masked' to a few ulp per step (dropping the select can change
    XLA FMA contraction, as in vjp_pos_sym). 'auto' is identical to
    'masked' here — the fused trajectory can form duplicates mid-run, so
    no t=0 scan applies (simulate_resident_sym docstring)."""

    def _run(self, mode, mxu, masses=False, leapfrog=False, n=200,
             steps=5):
        make = init.plummer if masses else init.uniform_random
        s = make(jax.random.key(41), n)
        fn = (simulate_resident_sym_leapfrog if leapfrog
              else simulate_resident_sym)
        p, v = fn(s.pos, s.vel, s.mass if masses else None, steps=steps,
                  dt=1e-3, softening=1e-9, mxu=mxu, tile=64,
                  interpret=INTERP, coincident=mode)
        return np.asarray(p), np.asarray(v)

    @pytest.mark.parametrize("mxu", [False, True])
    @pytest.mark.parametrize("masses", [False, True])
    def test_matches_masked(self, mxu, masses):
        pm, vm = self._run("masked", mxu, masses)
        pa, va = self._run("auto", mxu, masses)
        np.testing.assert_array_equal(pa, pm)  # auto == masked exactly
        np.testing.assert_array_equal(va, vm)
        pf, vf = self._run("fast", mxu, masses)
        # few-ulp FMA-contraction window, compounded over 5 steps
        for a, b in ((pf, pm), (vf, vm)):
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * scale)

    def test_leapfrog_threads(self):
        pm, vm = self._run("masked", True, leapfrog=True)
        pf, vf = self._run("fast", True, leapfrog=True)
        for a, b in ((pf, pm), (vf, vm)):
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * scale)

    def test_validation(self):
        s = init.uniform_random(jax.random.key(42), 64)
        with pytest.raises(ValueError, match="coincident"):
            simulate_resident_sym(s.pos, s.vel, steps=1, dt=1e-3,
                                  interpret=INTERP, coincident="no")


def test_fold_vs_nofold_trajectory():
    """Folded diagonals change only eval geometry: same trajectory up to
    fp32 reassociation (rows/cols split differs on diagonal blocks)."""
    import numpy as np

    s = init.plummer(jax.random.key(31), 192)
    outs = {}
    for fold in (False, True):
        p, v = simulate_resident_sym(
            s.pos, s.vel, s.mass, steps=5, dt=1e-3, tile=64, mxu=False,
            interpret=INTERP, fold=fold)
        outs[fold] = np.asarray(p)
    scale = max(1.0, np.abs(outs[False]).max())
    np.testing.assert_allclose(outs[True], outs[False], rtol=0,
                               atol=1e-5 * scale)


def test_fold_ensemble_bitwise_vs_standalone():
    """The batched kernel with fold stays bitwise equal per system to the
    standalone fold run (same kernel body, same fold slots)."""
    import numpy as np
    from mini_nbody_tpu.ops.resident_sym import simulate_resident_sym_ensemble

    ss = [init.plummer(jax.random.key(41 + i), 96) for i in range(2)]
    pos = jnp.stack([s.pos for s in ss])
    vel = jnp.stack([s.vel for s in ss])
    mass = jnp.stack([s.mass for s in ss])
    pe, ve = simulate_resident_sym_ensemble(
        pos, vel, mass, steps=4, dt=1e-3, tile=32, mxu=True,
        interpret=INTERP, fold=True)
    for i, s in enumerate(ss):
        p1, v1 = simulate_resident_sym(
            s.pos, s.vel, s.mass, steps=4, dt=1e-3, tile=32, mxu=True,
            interpret=INTERP, fold=True)
        np.testing.assert_array_equal(np.asarray(pe)[i], np.asarray(p1))
        np.testing.assert_array_equal(np.asarray(ve)[i], np.asarray(v1))
