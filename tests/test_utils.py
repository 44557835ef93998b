"""Utils: config validation, checkpoint roundtrip, shmoo formatting, metrics."""

import jax
import numpy as np
import pytest

from mini_nbody_tpu import SimConfig
from mini_nbody_tpu.models import init
from mini_nbody_tpu.utils import checkpoint as ckpt
from mini_nbody_tpu.utils import shmoo
from mini_nbody_tpu.utils.config import ceil_log2, round_up
from mini_nbody_tpu.utils.harness import Throughput, auto_inner
from mini_nbody_tpu.utils.tracing import StepMetrics


def test_config_validation():
    with pytest.raises(ValueError):
        SimConfig(n=0)
    with pytest.raises(ValueError):
        SimConfig(n=16, backend="cuda")
    with pytest.raises(ValueError):
        SimConfig(n=16, tile_j=100)
    with pytest.raises(ValueError):
        SimConfig(n=16, integrator="rk9")
    cfg = SimConfig(n=16)
    assert cfg.replace(steps=5).steps == 5
    assert hash(cfg) == hash(SimConfig(n=16))  # usable as jit static arg


def test_helpers():
    assert ceil_log2(1) == 0 and ceil_log2(16) == 4 and ceil_log2(17) == 5
    assert round_up(100, 128) == 128 and round_up(256, 128) == 256
    assert auto_inner(1 << 20) == 3   # ~10 s/sync at the headline rate
    assert auto_inner(1 << 22) == 1   # one step already amortizes
    assert auto_inner(1024) == 65536  # capped (sync share ~6% at 0.56 s/sync)


def test_checkpoint_roundtrip(tmp_path):
    state = init.uniform_random(jax.random.key(0), 64)
    cfg = SimConfig(n=64, steps=7)
    path = tmp_path / "ck.npz"
    ckpt.save(path, state, step=42, cfg=cfg)
    s2, step, cfg_dict = ckpt.load(path)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(s2.vel), np.asarray(state.vel))
    restored = ckpt.restore_config(cfg_dict)
    assert restored == cfg


def test_checkpoint_suffixless_path_roundtrip(tmp_path):
    # np.savez appends '.npz' when missing; save must report the real file
    # and load must find it from the same suffixless argument (--save ck ...
    # --resume ck used to FileNotFoundError, ADVICE.md round 1).
    state = init.uniform_random(jax.random.key(1), 16)
    path = tmp_path / "ck"
    written = ckpt.save(path, state, step=3)
    assert written.exists() and written.suffix == ".npz"
    s2, step, _ = ckpt.load(path)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(state.pos))


def test_shmoo_rows_and_csv():
    cfg = SimConfig(n=256, backend="jnp")
    rows = shmoo.sweep(cfg, [256, 512], reps=1)
    assert [r["n"] for r in rows] == [256, 512]
    csv_text = shmoo.to_csv(rows)
    assert csv_text.splitlines()[0].startswith("n,backend,")
    assert len(csv_text.splitlines()) == 3
    assert all(r["ginteractions_per_s"] > 0 for r in rows)


def test_shmoo_resident_route_row():
    """Forced-resident configs are timed on the resident kernel and the
    row says so — the shmoo reports simulate()'s actual routing."""
    cfg = SimConfig(n=64, dt=1e-3, backend="sym_mxu", resident=True,
                    interpret=True)
    rows = shmoo.sweep(cfg, [64], reps=1)
    assert rows[0]["backend"] == "sym_mxu_resident"
    assert rows[0]["ginteractions_per_s"] > 0


def test_throughput_math():
    t = Throughput(n=1000, steps=2, seconds=1.0, n_devices=2)
    assert t.interactions == 2e6
    assert t.ginteractions_per_s_per_device == pytest.approx(1e-3)
    rep = t.report()
    assert set(["n", "seconds", "ginteractions_per_s", "roofline_frac"]) <= set(rep)


def test_throughput_report_tiny_rate_significant_figures():
    # n=64 interpret mode through the remote tunnel can land below
    # 5e-4 GInter/s; report() must keep significant figures rather than
    # rounding a real rate to exactly 0.0.
    t = Throughput(n=64, steps=1, seconds=10.0)
    rep = t.report()
    assert rep["ginteractions_per_s"] == pytest.approx(4.096e-7)
    assert rep["roofline_frac"] > 0
    # Normal-magnitude rates keep their familiar precision.
    big = Throughput(n=1_000_000, steps=1, seconds=1e12 / 413.7e9)
    assert big.report()["ginteractions_per_s"] == pytest.approx(413.7, abs=1e-3)


def test_step_metrics():
    m = StepMetrics(n=1000).start()
    row = m.tick(10, energy=-1.0)
    assert row["step"] == 10 and row["energy"] == -1.0
    m.tick(5)
    assert "\n" in m.jsonl()


def test_multihost_noop_without_env(monkeypatch):
    from mini_nbody_tpu.parallel import multihost

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False
    assert multihost.is_primary()
    assert multihost.global_mesh().devices.size >= 1


def test_check_finite_guard():
    import jax.numpy as jnp
    from mini_nbody_tpu.models.state import BodyState
    from mini_nbody_tpu.ops.diagnostics import assert_finite, check_finite

    s = init.uniform_random(jax.random.key(0), 16)
    assert all(bool(v) for v in check_finite(s).values())
    bad = BodyState(pos=s.pos.at[0, 0].set(jnp.nan), vel=s.vel, mass=s.mass)
    with pytest.raises(FloatingPointError):
        assert_finite(bad, "test")


def test_profile_trace_and_annotate(tmp_path):
    # Smoke: the wrappers must actually produce a trace dir and not break
    # the wrapped computation (VERDICT r1 weak #5: zero coverage before).
    import jax.numpy as jnp
    from mini_nbody_tpu.utils.tracing import annotate, profile_trace

    logdir = tmp_path / "trace"
    with profile_trace(str(logdir)):
        with annotate("force"):
            out = jnp.sum(jnp.arange(16.0) ** 2)
    assert float(out) == 1240.0
    produced = list(logdir.rglob("*"))
    assert produced, "profiler produced no trace files"


class TestMultihostInitialize:
    """Arg/env precedence of parallel.multihost.initialize with the actual
    jax.distributed.initialize monkeypatched out (VERDICT r1 weak #8)."""

    def _patch(self, monkeypatch):
        calls = []
        import jax as _jax

        monkeypatch.setattr(_jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        return calls

    def test_noop_without_config(self, monkeypatch):
        from mini_nbody_tpu.parallel import multihost

        calls = self._patch(monkeypatch)
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert multihost.initialize() is False
        assert calls == []

    def test_env_vars_picked_up(self, monkeypatch):
        from mini_nbody_tpu.parallel import multihost

        calls = self._patch(monkeypatch)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        assert multihost.initialize() is True
        assert calls == [dict(coordinator_address="10.0.0.1:1234",
                              num_processes=4, process_id=2)]

    def test_args_override_env(self, monkeypatch):
        from mini_nbody_tpu.parallel import multihost

        calls = self._patch(monkeypatch)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        assert multihost.initialize("10.9.9.9:999", 8, 7) is True
        assert calls == [dict(coordinator_address="10.9.9.9:999",
                              num_processes=8, process_id=7)]

    def test_num_processes_alone_triggers_init(self, monkeypatch):
        from mini_nbody_tpu.parallel import multihost

        calls = self._patch(monkeypatch)
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert multihost.initialize(num_processes=2, process_id=0) is True
        assert calls == [dict(coordinator_address=None,
                              num_processes=2, process_id=0)]


class TestPotentialEnergyKernel:
    def _check(self, n, masses):
        import jax.numpy as jnp
        from mini_nbody_tpu.models import init
        from mini_nbody_tpu.ops.diagnostics import potential_energy
        from mini_nbody_tpu.ops.pe_kernel import potential_energy_pallas

        s = init.plummer(jax.random.key(n), n)
        m = s.mass if masses else jnp.ones((n,), jnp.float32)
        ref = float(potential_energy(s.pos, m, 1e-2))
        interp = jax.default_backend() != "tpu"
        got = float(potential_energy_pallas(
            s.pos, s.mass if masses else None, softening=1e-2,
            tile_i=64, tile_j=128, interpret=interp))
        assert abs(got - ref) / abs(ref) < 1e-5

    def test_unit_mass_aligned(self):
        self._check(256, masses=False)

    def test_masses_ragged(self):
        self._check(300, masses=True)

    def test_unit_mass_ragged(self):
        # ragged unit-mass: FAR padding is NOT inert for inv^1 — the kernel
        # must switch to zero-mass padding.
        self._check(300, masses=False)

    def test_self_excluded_coincident_kept(self):
        # The diagonal is masked by exact INDEX: distinct coincident bodies
        # keep their real eps^-0.5 pair term, exactly like the jnp
        # diagnostic (r1-review finding: a |d|^2==0 mask silently dropped
        # those terms and diverged from potential_energy).
        import jax.numpy as jnp
        from mini_nbody_tpu.ops.pe_kernel import potential_energy_pallas

        n = 32
        pos = jnp.zeros((n, 3), jnp.float32)
        interp = jax.default_backend() != "tpu"
        u = float(potential_energy_pallas(pos, softening=1e-2,
                                          tile_i=32, tile_j=128,
                                          interpret=interp))
        expect = -0.5 * n * (n - 1) / np.sqrt(1e-2)
        assert abs(u - expect) / abs(expect) < 1e-5


def test_orbax_checkpoint_roundtrip(tmp_path):
    state = init.uniform_random(jax.random.key(7), 64)
    cfg = SimConfig(n=64, steps=3)
    path = ckpt.save_orbax(tmp_path / "ock", state, step=9, cfg=cfg)
    s2, step, cfg_dict = ckpt.load_orbax(path)
    assert step == 9
    np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(s2.vel), np.asarray(state.vel))
    assert ckpt.restore_config(cfg_dict) == cfg


def test_orbax_checkpoint_sharded_restore(tmp_path):
    # restore directly onto the mesh: no host gather (unlike npz)
    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mini_nbody_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    state = init.uniform_random(jax.random.key(8), 128)
    path = ckpt.save_orbax(tmp_path / "ock2", state, step=1)
    shardings = {
        "pos": NamedSharding(mesh, P("i", None)),
        "vel": NamedSharding(mesh, P("i", None)),
        "mass": NamedSharding(mesh, P("i")),
    }
    s2, step, _ = ckpt.load_orbax(path, sharding=shardings)
    assert step == 1
    assert s2.pos.sharding.spec == P("i", None)
    np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(state.pos))


class TestAutotune:
    def _fake_measure(self, table):
        calls = []

        def measure(cfg, reps):
            calls.append(cfg)
            key = cfg.sym_tile if cfg.effective_backend() in ("sym", "sym_mxu") \
                else (cfg.tile_i, cfg.tile_j)
            v = table[key]
            if v is None:
                raise RuntimeError("VMEM exceeded (fake)")
            return v

        return measure, calls

    def test_picks_fastest_sym_tile_and_caches(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=4096, backend="sym_mxu")
        table = {512: 3.0, 768: 2.0, 896: 1.5, 1024: 1.0, 1152: None}
        measure, calls = self._fake_measure(table)
        path = tmp_path / "tune.json"
        best = autotune.tune(cfg, measure=measure, path=path)
        assert best.sym_tile == 1024
        assert len(calls) == len(autotune.SYM_TILES)
        # cache hit: no re-measure
        measure2, calls2 = self._fake_measure(table)
        best2 = autotune.tune(cfg, measure=measure2, path=path)
        assert best2.sym_tile == 1024 and calls2 == []
        # different bucket -> fresh measurement
        autotune.tune(cfg.replace(n=65536), measure=measure2, path=path)
        assert len(calls2) == len(autotune.SYM_TILES)

    def test_streaming_backend_tunes_tile_pairs(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=4096, backend="pallas")
        table = {(256, 2048): 2.0, (512, 1024): 1.5, (512, 2048): 1.0,
                 (1024, 1024): 4.0}
        measure, _ = self._fake_measure(table)
        best = autotune.tune(cfg, measure=measure, path=tmp_path / "t.json")
        assert (best.tile_i, best.tile_j) == (512, 2048)

    def test_all_candidates_fail_raises(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=4096, backend="sym")
        measure, _ = self._fake_measure({t: None for t in autotune.SYM_TILES})
        with pytest.raises(RuntimeError):
            autotune.tune(cfg, measure=measure, path=tmp_path / "t.json")

    def test_sym_tile_threads_into_kernel(self):
        # cfg.sym_tile must actually reach the symmetric kernels: a
        # non-default tile still computes correct forces via make_force_fn.
        import numpy as np

        from mini_nbody_tpu.models import init as minit
        from mini_nbody_tpu.ops.force import make_force_fn
        from mini_nbody_tpu.ops.reference import body_force_jnp
        from mini_nbody_tpu.utils.config import SimConfig

        s = minit.uniform_random(jax.random.key(2), 256)
        cfg = SimConfig(n=256, backend="sym", softening=1e-2, sym_tile=32,
                        sym_chunk=128)
        f = np.asarray(make_force_fn(cfg)(s.pos, s.pos, None))
        ref = np.asarray(body_force_jnp(s.pos, s.pos, softening=1e-2))
        np.testing.assert_allclose(f, ref, rtol=1e-4,
                                   atol=1e-5 * np.abs(ref).max())


class TestAutotuneV2:
    def test_chunk_phase_when_n_spans_chunks(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=262144, backend="sym_mxu")
        seen = []

        def measure(cand, reps):
            seen.append((cand.sym_tile, cand.sym_chunk))
            base = {512: 3.0, 768: 2.0, 896: 1.5, 1024: 1.0,
                    1152: 2.5}[cand.sym_tile]
            # single-chunk (262144) measures faster at this N
            return base * (0.9 if cand.sym_chunk == 262144 else 1.0)

        best = autotune.tune(cfg, measure=measure, path=tmp_path / "t.json")
        assert best.sym_tile == 1024 and best.sym_chunk == 262144
        # phase 2 ran only the non-default chunk at the winning tile
        assert (1024, 262144) in seen

    def test_resident_config_sweeps_resident_tile_only(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=4096, backend="sym_mxu", resident=True)
        seen = []

        def measure(cand, reps):
            assert cand.resident
            seen.append(cand.resident_tile)
            return {512: 2.0, 640: 1.5, 768: 1.2, 896: 3.0, 1024: 1.0}[
                cand.resident_tile]

        best = autotune.tune(cfg, measure=measure, path=tmp_path / "t.json")
        assert best.resident_tile == 1024
        assert set(seen) == set(autotune.RESIDENT_TILES)

    def test_backward_phase_and_cache(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=4096, backend="sym")
        fwd_table = {512: 3.0, 768: 2.0, 896: 1.5, 1024: 1.0, 1152: 2.0}

        def measure(cand, reps):
            return fwd_table[cand.sym_tile]

        def measure_bwd(cand, reps):
            return {512: 2.0, 640: 1.0, 768: 1.5, 896: 3.0}[
                cand.sym_bwd_tile]

        path = tmp_path / "t.json"
        best = autotune.tune(cfg, measure=measure, path=path,
                             backward=True, measure_bwd=measure_bwd)
        assert best.sym_tile == 1024 and best.sym_bwd_tile == 640
        # cache hit applies both; a forward-only prior cache would NOT
        # satisfy backward=True (sym_bwd_tile absent)
        best2 = autotune.tune(cfg, measure=None, path=path, backward=True,
                              measure_bwd=None)
        assert best2.sym_bwd_tile == 640
        # explicit user override survives the cache hit
        best3 = autotune.tune(cfg.replace(sym_bwd_tile=896), path=path,
                              backward=True)
        assert best3.sym_bwd_tile == 896


class TestAutotuneEnsemble:
    def test_sweeps_streamed_and_resident_head_to_head(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=1024, backend="sym_mxu")
        seen = []

        def measure(cand, b, reps):
            assert b == 8
            if cand.resident:
                seen.append(("res", cand.resident_tile))
                return {512: 2.0, 640: 1.8, 768: 0.5, 896: 1.9,
                        1024: 1.7}[cand.resident_tile]
            seen.append(("str", cand.sym_tile))
            return 1.0  # every streamed candidate slower than res@768

        path = tmp_path / "t.json"
        best = autotune.tune_ensemble(cfg, 8, measure=measure, path=path)
        assert best.resident is True and best.resident_tile == 768
        # both families swept: all streamed tiles <= padded N, all
        # VMEM-admissible resident tiles
        assert {s for s in seen if s[0] == "str"} == {
            ("str", t) for t in autotune.ENSEMBLE_TILES}
        assert {s for s in seen if s[0] == "res"} == {
            ("res", t) for t in autotune.RESIDENT_TILES}
        # cache hit: no re-measure, result applied
        def boom(cand, b, reps):
            raise AssertionError("cache miss")
        best2 = autotune.tune_ensemble(cfg, 8, measure=boom, path=path)
        assert best2.resident is True and best2.resident_tile == 768
        # different B bucket -> fresh key (measure runs again)
        calls = []

        def measure2(cand, b, reps):
            calls.append(cand)
            return 1.0

        autotune.tune_ensemble(cfg, 512, measure=measure2, path=path)
        assert calls

    def test_streamed_wins_pins_resident_false(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        cfg = SimConfig(n=1024, backend="sym_mxu")

        def measure(cand, b, reps):
            if cand.resident:
                return 2.0
            return 0.5 if cand.sym_tile == 256 else 1.0

        best = autotune.tune_ensemble(cfg, 8, measure=measure,
                                      path=tmp_path / "t.json")
        assert best.resident is False and best.sym_tile == 256

    def test_resident_candidates_respect_vmem_cap(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig

        # B * round_up(N, tile) > RESIDENT_SYM_MAX_N for every tile:
        # only streamed candidates may be measured.
        cfg = SimConfig(n=16384, backend="sym_mxu")

        def measure(cand, b, reps):
            assert not cand.resident
            return 1.0

        best = autotune.tune_ensemble(cfg, 64, measure=measure,
                                      path=tmp_path / "t.json")
        assert best.resident is False

    def test_cached_rate_feeds_watchdog_pacing(self, tmp_path):
        from mini_nbody_tpu.utils import autotune
        from mini_nbody_tpu.utils.config import SimConfig
        from mini_nbody_tpu.sim import (
            _CONSERVATIVE_GINTER_S, _pacing_rate, max_steps_per_dispatch)

        cfg = SimConfig(n=65536, backend="sym_mxu")
        path = tmp_path / "t.json"
        assert autotune.cached_rate(cfg, path=path) is None

        def measure(cand, reps):
            return 1e-2  # 65536^2 / 1e-2 s = 429 G/s

        autotune.tune(cfg, measure=measure, path=path)
        rate = autotune.cached_rate(cfg, path=path)
        assert rate is not None and rate > 400
        # pacing uses the measured rate via the env-pointed cache
        import os

        old = os.environ.get(autotune.CACHE_ENV)
        os.environ[autotune.CACHE_ENV] = str(path)
        try:
            assert _pacing_rate(cfg) == pytest.approx(0.5 * rate)
            assert (max_steps_per_dispatch(cfg.n, cfg=cfg)
                    > max_steps_per_dispatch(cfg.n))
        finally:
            if old is None:
                os.environ.pop(autotune.CACHE_ENV, None)
            else:
                os.environ[autotune.CACHE_ENV] = old

    def test_sym_bwd_tile_threads_into_backward(self):
        import jax.numpy as jnp
        import numpy as np

        from mini_nbody_tpu.models import init as minit
        from mini_nbody_tpu.ops.autodiff import make_differentiable_force
        from mini_nbody_tpu.utils.config import SimConfig

        s = minit.uniform_random(jax.random.key(3), 256)
        base = SimConfig(n=256, backend="sym", softening=1e-2,
                         interpret=True)

        def gradf(cfg):
            force = make_differentiable_force(cfg)
            return jax.grad(lambda p: jnp.sum(force(p) ** 2))(s.pos)

        g_def = np.asarray(gradf(base))
        g_tuned = np.asarray(gradf(base.replace(sym_bwd_tile=32)))
        np.testing.assert_allclose(g_tuned, g_def, rtol=1e-5,
                                   atol=1e-6 * np.abs(g_def).max())
