"""Symmetric x MXU hybrid kernel vs oracle (interpret mode on CPU; on real
TPU the matmuls run single-pass bf16 — error class documented in
ops/sym_mxu_force.py and gated by the config-3 drift run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.reference import body_force_jnp
from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu

INTERP = jax.default_backend() != "tpu"
# Real-TPU runs use bf16 matmul operands; interpret mode is exact fp32.
# On chip the compensated [vhi|vlo] operand split leaves the uniform
# ~3e-3-relative w-rounding class with p99 per-body error ~1.2e-3 of scale
# and max ~2e-2 (benchmarks/RESULTS.md "Compensated bf16 operand splits";
# quality-gated by the config-3 energy-drift run, 6.3e-8 vs 1e-5).
RTOL, ATOL_SCALE = ((1e-4, 1e-5) if INTERP else (2e-2, 5e-3))


def _check(n, tile, chunk, masses=False, init_fn=None, softening=1e-2):
    make = init_fn or init.uniform_random
    s = make(jax.random.key(n + 1), n)
    m = s.mass if masses else None
    f = body_force_sym_mxu(s.pos, m, softening=softening, tile=tile,
                           chunk=chunk, interpret=INTERP)
    ref = body_force_jnp(s.pos, s.pos, m, softening=softening)
    f, ref = np.asarray(f), np.asarray(ref)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(f, ref, rtol=RTOL, atol=ATOL_SCALE * scale)


def test_single_chunk():
    _check(256, 64, 256)


def test_multi_chunk_with_ragged_tail():
    _check(300, 64, 128)


def test_even_block_count_wrap_band():
    _check(512, 64, 512)


def test_mass_mode_plummer():
    _check(256, 64, 256, masses=True, init_fn=init.plummer)


def test_mass_mode_multi_chunk_ragged():
    _check(300, 64, 128, masses=True, init_fn=init.plummer)


def test_mass_mode_two_cluster():
    _check(200, 64, 256, masses=True, init_fn=init.two_cluster)


def test_default_softening_coincident_mask():
    # Self pairs at SOFTENING=1e-9: the separated sum(w*p)/sum(w) matmul
    # accumulation needs the |d|^2 == 0 mask or eps^-1.5 swamps everything
    # (measured ~3e6 relative without it). On real TPU the bf16 operand
    # rounding legitimately leaves per-body tails up to ~10% of scale on the
    # closest pairs (benchmarks/RESULTS.md), so this gates the MASK — errors
    # bounded by the bf16 class, not by eps^-1.5 — with a tight median.
    n = 256
    s = init.uniform_random(jax.random.key(n + 1), n)
    f = np.asarray(body_force_sym_mxu(s.pos, softening=1e-9, tile=64,
                                      chunk=256, interpret=INTERP))
    ref = np.asarray(body_force_jnp(s.pos, s.pos, softening=1e-9))
    err = np.abs(f - ref)
    scale = np.abs(ref).max()
    assert np.isfinite(f).all()
    assert err.max() / scale < 0.5, "mask failed: eps^-1.5 leaked in"
    assert np.median(err) / scale < 1e-3


def test_zero_mass_inert():
    pos = init.uniform_random(jax.random.key(5), 128).pos
    f = body_force_sym_mxu(pos, jnp.zeros((128,), jnp.float32),
                           tile=64, chunk=128, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(f), 0.0)


def test_coincident_bodies_finite():
    pos = jnp.zeros((32, 3), jnp.float32)
    f = body_force_sym_mxu(pos, tile=32, chunk=32, interpret=INTERP)
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_array_equal(np.asarray(f), 0.0)


def test_dispatch_and_config():
    from mini_nbody_tpu import SimConfig
    from mini_nbody_tpu.ops.force import body_force

    s = init.plummer(jax.random.key(3), 96)
    f = body_force(s.pos, s.pos, s.mass, backend="sym_mxu", interpret=INTERP)
    ref = body_force_jnp(s.pos, s.pos, s.mass)
    scale = max(float(np.abs(np.asarray(ref)).max()), 1.0)
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref),
                               rtol=RTOL, atol=ATOL_SCALE * scale)
    # sym_mxu + mesh is valid under every comm: rectangular exchanges route
    # cross-shard work through the mxu streaming kernel (parallel/sharded).
    SimConfig(n=96, backend="sym_mxu", mesh_shape=(8,))
    with pytest.raises(ValueError, match="same array object"):
        body_force(s.pos, s.pos + 0.0, backend="sym_mxu", interpret=INTERP)


def test_segmented_matches_one_program():
    from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu_segmented

    for n, masses in [(300, False), (520, True)]:
        s = init.plummer(jax.random.key(n), n)
        m = s.mass if masses else None
        ref = np.asarray(body_force_sym_mxu(
            s.pos, m, softening=1e-2, tile=64, chunk=64, interpret=INTERP))
        seen = []
        got = np.asarray(body_force_sym_mxu_segmented(
            s.pos, m, softening=1e-2, tile=64, chunk=64, interpret=INTERP,
            pairs_per_dispatch=64 * 64 * 3,
            progress=lambda d, t: seen.append((d, t))))
        # Same kernels/order, but the XLA dot lowering may reassociate
        # differently across the two program boundaries: ~few-ulp diffs
        # (measured 6e-5 on O(300) values), not bit-exact like the pure-VPU
        # symmetric driver.
        scale = float(np.abs(ref).max())
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5 * scale)
        assert len(seen) > 2 and seen[-1][0] == seen[-1][1]


@pytest.mark.skipif(INTERP, reason="bf16 MXU rounding only exists on chip")
def test_tpu_split_kills_cancellation_tails():
    """On-chip gate that the compensated [vhi|vlo] operand split is ACTIVE.

    Without the split (or if XLA ever starts folding it away again — the
    astype form WAS silently folded to identity, see sym_mxu_force._pack)
    the bf16 rounding of [p|1] is amplified by net-force cancellation into
    per-body relative-error tails of p99 ~ 0.14 / max ~ 2 at N=65536.
    With it the tails collapse ~100x (measured p99 1.2e-3, max 1.6e-2).
    split_w additionally compensates w (measured median 3.8e-6)."""
    from tests.conftest import oracle_force

    n = 16384
    s = init.uniform_random(jax.random.key(n + 1), n)
    ref = oracle_force(np.asarray(s.pos), softening=1e-9)
    rn = np.maximum(np.linalg.norm(ref, axis=1), 1e-30)

    f = np.asarray(body_force_sym_mxu(s.pos, softening=1e-9))
    err = np.linalg.norm(f - ref, axis=1) / rn
    assert np.median(err) < 1e-3
    assert np.percentile(err, 99) < 1e-2, "v-split inactive: tails are back"

    fw = np.asarray(body_force_sym_mxu(s.pos, softening=1e-9, split_w=True))
    errw = np.linalg.norm(fw - ref, axis=1) / rn
    assert np.median(errw) < 1e-4, "w-split inactive (Mosaic folded astype?)"
    assert np.percentile(errw, 99) < 2e-3


def test_split_regression_cpu_emulated_bf16():
    """CPU gate that _pack's compensated [vhi|vlo] operand split is ACTIVE
    and sufficient — no chip needed.

    Emulates the MXU's single-pass bf16 operand rounding in NumPy (the
    diagnosis methodology of benchmarks/RESULTS.md "Compensated bf16
    operand splits") on the ACTUAL operand `_pack` produces: W computed
    exact fp32 (the on-chip VPU path), every matmul operand rounded to
    bf16, fp32 accumulation. If XLA ever folds the reduce_precision split
    to identity again (the astype form WAS folded — _pack docstring), vlo
    collapses to zero and the emulated force error reverts to the
    pre-split cancellation-tail class, failing both assertions below.
    """
    import ml_dtypes

    from mini_nbody_tpu.ops.sym_mxu_force import _pack

    n = 4096
    soft = 1e-9
    pos = np.asarray(init.uniform_random(jax.random.key(7), n).pos)

    def bf16(a):
        return a.astype(ml_dtypes.bfloat16).astype(np.float32)

    # Exact fp32 weight matrix (the kernel's VPU path), self pairs masked.
    d = pos[None, :, :].astype(np.float32) - pos[:, None, :]
    d2 = (d * d).sum(-1)
    w = (d2 + np.float32(soft)) ** np.float32(-1.5)
    w = np.where(d2 == 0.0, np.float32(0.0), w).astype(np.float32)

    # fp64 oracle on the same pairs.
    ref = (d.astype(np.float64)
           * ((d2.astype(np.float64) + soft) ** -1.5)[:, :, None]).sum(1)
    rn = np.maximum(np.linalg.norm(ref, axis=1), 1e-30)

    def emulated_force(v):
        # rows-side accumulation identity with bf16-rounded MXU operands;
        # the reaction side partitions the same sum, so rounding behavior
        # is identical on the full matrix.
        s = bf16(w) @ bf16(v)
        s = s[:, 0:4] + s[:, 4:8]
        return s[:, 0:3] - pos * s[:, 3:4]

    # The operand the real kernel sees (jitted, so a folding regression in
    # XLA's simplifier is exactly what this exercises).
    v_split = np.asarray(jax.jit(
        lambda p: _pack(p, None, n, n)[2])(jnp.asarray(pos)))
    assert np.abs(v_split[:, 4:8]).max() > 0, \
        "split folded to identity: vlo == 0"

    err_split = np.linalg.norm(emulated_force(v_split) - ref, axis=1) / rn
    # A FOLDED split is [v | 0]: the documented pre-split tail class.
    v_broken = np.concatenate([v_split[:, 0:4] + v_split[:, 4:8],
                               np.zeros((n, 4), np.float32)], axis=1)
    err_broken = np.linalg.norm(emulated_force(v_broken) - ref, axis=1) / rn

    # Compensated class: uniform w-rounding error only (no |p|/|d| tails).
    assert np.median(err_split) < 1e-3
    assert np.percentile(err_split, 99) < 1e-2
    # And the emulation DISCRIMINATES: the broken operand's cancellation
    # tails are far above the gate (so the gate would really catch it).
    assert np.percentile(err_broken, 99) > 3 * np.percentile(err_split, 99)


def test_pair_mxu_matches_rect_oracle():
    from tests.conftest import oracle_force_rect
    from mini_nbody_tpu.ops.sym_mxu_force import body_force_pair_mxu

    for na, nb, masses in [(200, 136, False), (130, 200, True),
                           (64, 64, True)]:
        sa = init.plummer(jax.random.key(na), na)
        sb = init.plummer(jax.random.key(nb + 1), nb)
        ma = sa.mass if masses else None
        mb = sb.mass if masses else None
        fa, fb = body_force_pair_mxu(sa.pos, sb.pos, ma, mb,
                                     softening=1e-2, tile=64,
                                     interpret=INTERP)
        ra = oracle_force_rect(sa.pos, sb.pos, mb, softening=1e-2)
        rb = oracle_force_rect(sb.pos, sa.pos, ma, softening=1e-2)
        scale = max(np.abs(ra).max(), np.abs(rb).max())
        tol = 1e-5 if INTERP else 5e-3
        np.testing.assert_allclose(np.asarray(fa), ra, rtol=tol,
                                   atol=tol * scale)
        np.testing.assert_allclose(np.asarray(fb), rb, rtol=tol,
                                   atol=tol * scale)


def test_pair_mxu_mass_mismatch_raises():
    from mini_nbody_tpu.ops.sym_mxu_force import body_force_pair_mxu

    s = init.plummer(jax.random.key(1), 64)
    with pytest.raises(ValueError, match="both masses or neither"):
        body_force_pair_mxu(s.pos, s.pos, s.mass, None, interpret=INTERP)


def test_any_coincident():
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident

    pos = init.uniform_random(jax.random.key(0), 257).pos
    assert not bool(any_coincident(pos))
    assert bool(any_coincident(pos.at[200].set(pos[3])))
    # -0.0 and +0.0 coordinates are the SAME position (d2 == 0): the
    # detector canonicalizes before sorting so they land adjacent.
    # match pos.dtype: under the x64 CPU suite a default jnp.array literal
    # is f64 and .at[].set() would scatter-cast (FutureWarning -> error).
    neg = pos.at[0].set(jnp.array([0.5, -0.0, 0.25], pos.dtype))
    assert bool(any_coincident(
        neg.at[1].set(jnp.array([0.5, 0.0, 0.25], pos.dtype))))


def test_any_coincident_conservative_guards():
    """NON-equal rows can still hit d2 == 0 (per-coordinate diff squares
    underflow below 2^-74.5) or collide with the FAR pad sentinel; the
    scan must flag those conservatively (-> masked kernels run)."""
    from mini_nbody_tpu.ops.sym_mxu_force import any_coincident
    from mini_nbody_tpu.utils.config import FAR

    pos = init.uniform_random(jax.random.key(1), 64).pos
    assert not bool(any_coincident(pos))
    # two DISTINCT bodies whose coordinate diff squares underflow to 0
    tiny = pos.at[0].set(jnp.array([2.0 ** -60, 0.25, 0.5], pos.dtype))
    tiny = tiny.at[1].set(
        jnp.array([2.0 ** -60 + 2.0 ** -80, 0.25, 0.5], pos.dtype))
    assert bool(any_coincident(tiny))
    # a real body at the exact FAR pad sentinel would coincide with pads
    far = pos.at[5].set(jnp.array([FAR, FAR, FAR], pos.dtype))
    assert bool(any_coincident(far))
    # exactly-zero coordinates alone must NOT flag (common: origin bodies)
    zc = pos.at[3].set(jnp.array([0.0, 0.25, 0.5], pos.dtype))
    assert not bool(any_coincident(zc))


def test_coincident_modes_bitwise_identical():
    """coincident='auto'/'fast' must be BITWISE equal to 'masked' on
    duplicate-free inputs (multi-chunk config: exercises tri diag, tri
    off-diag and cross kernels plus the FAR tail pads), and 'auto' must
    route duplicates to the masked kernels (again bitwise)."""
    pos = init.uniform_random(jax.random.key(9), 300).pos
    kw = dict(softening=1e-9, tile=64, chunk=128, interpret=INTERP)
    f_m = np.asarray(body_force_sym_mxu(pos, coincident="masked", **kw))
    for mode in ("auto", "fast"):
        f = np.asarray(body_force_sym_mxu(pos, coincident=mode, **kw))
        np.testing.assert_array_equal(f, f_m)
    dup = pos.at[7].set(pos[3]).at[250].set(pos[3])  # cross-chunk trio
    g_m = np.asarray(body_force_sym_mxu(dup, coincident="masked", **kw))
    g_a = np.asarray(body_force_sym_mxu(dup, coincident="auto", **kw))
    np.testing.assert_array_equal(g_a, g_m)
    assert np.isfinite(g_a).all()


def test_coincident_segmented_and_pair_modes():
    from mini_nbody_tpu.ops.sym_mxu_force import (
        body_force_pair_mxu, body_force_sym_mxu_segmented)

    pos = init.uniform_random(jax.random.key(11), 300).pos
    kw = dict(softening=1e-9, tile=64, chunk=128, interpret=INTERP)
    h_m = np.asarray(body_force_sym_mxu_segmented(
        pos, coincident="masked", **kw))
    for mode in ("auto", "fast"):
        h = np.asarray(body_force_sym_mxu_segmented(
            pos, coincident=mode, **kw))
        np.testing.assert_array_equal(h, h_m)

    sb = init.uniform_random(jax.random.key(12), 200).pos
    pkw = dict(softening=1e-9, tile=64, interpret=INTERP)
    pa_m = body_force_pair_mxu(pos[:200], sb, coincident="masked", **pkw)
    for mode in ("auto", "fast"):
        pa = body_force_pair_mxu(pos[:200], sb, coincident=mode, **pkw)
        np.testing.assert_array_equal(np.asarray(pa[0]), np.asarray(pa_m[0]))
        np.testing.assert_array_equal(np.asarray(pa[1]), np.asarray(pa_m[1]))
    # cross-set duplicate: 'auto' detects it on the concatenated sets
    dup_b = sb.at[5].set(pos[17])
    da = body_force_pair_mxu(pos[:200], dup_b, coincident="auto", **pkw)
    dm = body_force_pair_mxu(pos[:200], dup_b, coincident="masked", **pkw)
    np.testing.assert_array_equal(np.asarray(da[0]), np.asarray(dm[0]))
    np.testing.assert_array_equal(np.asarray(da[1]), np.asarray(dm[1]))


def test_coincident_validation_and_dispatch():
    from mini_nbody_tpu import SimConfig
    from mini_nbody_tpu.ops.force import body_force

    pos = init.uniform_random(jax.random.key(2), 96).pos
    with pytest.raises(ValueError, match="coincident"):
        body_force_sym_mxu(pos, coincident="never", interpret=INTERP)
    with pytest.raises(ValueError, match="coincident"):
        SimConfig(n=96, coincident="nope")
    # dispatcher threads the flag (identical output, no error)
    f = body_force(pos, pos, backend="sym_mxu", interpret=INTERP,
                   coincident="fast", sym_tile=32, sym_chunk=96)
    ref = body_force(pos, pos, backend="sym_mxu", interpret=INTERP,
                     coincident="masked", sym_tile=32, sym_chunk=96)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(ref))


def test_split_w_config_threads_through():
    from mini_nbody_tpu import SimConfig
    from mini_nbody_tpu.sim import make_step_fn
    from mini_nbody_tpu.models import init as minit

    n = 128
    cfg = SimConfig(n=n, dt=1e-3, softening=1e-2, backend="sym_mxu",
                    use_masses=True, split_w=True)
    s = minit.plummer(jax.random.key(4), n)
    acc = jnp.zeros_like(s.pos)
    out, _ = make_step_fn(cfg)((s, acc))
    ref = body_force_jnp(s.pos, s.pos, s.mass, softening=1e-2)
    # one euler step: v' = v + dt*F; x' = x + dt*v'
    want = np.asarray(s.pos + cfg.dt * (s.vel + cfg.dt * ref))
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(out.pos), want,
                               rtol=RTOL, atol=ATOL_SCALE * scale)
