"""MXU-hybrid kernel vs oracle (interpret mode on CPU; structure-level checks).

Interpret mode runs the accumulation dot in CPU fp32, so these tests validate
kernel structure (identity-form accumulation, self-pair masking, far-padding)
rather than TPU bf16 rounding. Real-TPU accuracy envelopes are documented in
ops/mxu_force.py and exercised by the /verify drive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.mxu_force import body_force_mxu
from mini_nbody_tpu.ops.reference import body_force_jnp

INTERP = jax.default_backend() != "tpu"

# Interpret mode runs the accumulation dot in fp32 regardless of pair_dtype;
# on real TPU the structural checks use the exact fp32 contract so tolerances
# stay tight (the bf16 path's accuracy envelope has its own test below).
_STRUCT_DTYPE = jnp.bfloat16 if INTERP else jnp.float32


def _check(pos_i, pos_j, mass_j=None, rtol=2e-3, **kw):
    kw.setdefault("pair_dtype", _STRUCT_DTYPE)
    f = body_force_mxu(pos_i, pos_j, mass_j, interpret=INTERP,
                       tile_i=64, tile_j=128, **kw)
    ref = body_force_jnp(pos_i, pos_j, mass_j, softening=kw.get("softening", 1e-9))
    f, ref = np.asarray(f), np.asarray(ref)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(f, ref, rtol=rtol, atol=rtol * scale)


def test_square_with_self_pairs():
    # Self-pair masking (w swamping the accumulator) is the key regression:
    # without it, errors were ~3e6 relative.
    s = init.uniform_random(jax.random.key(0), 192)
    _check(s.pos, s.pos)


def test_tail_far_padding():
    s = init.uniform_random(jax.random.key(1), 100)  # pads 100 -> 128
    _check(s.pos, s.pos)


def test_masses_and_rectangular(rng):
    pos_i = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    pos_j = jnp.asarray(rng.uniform(-1, 1, (256, 3)), jnp.float32)
    m_j = jnp.asarray(rng.uniform(0.5, 2.0, 256), jnp.float32)
    _check(pos_i, pos_j, m_j)


def test_coincident_bodies_inert():
    pos = jnp.zeros((64, 3), jnp.float32)
    f = body_force_mxu(pos, pos, interpret=INTERP, tile_i=64, tile_j=128)
    np.testing.assert_array_equal(np.asarray(f), 0.0)


def test_f32_exact_contract_mode():
    s = init.uniform_random(jax.random.key(2), 128)
    _check(s.pos, s.pos, pair_dtype=jnp.float32, rtol=1e-4)


def test_bf16_accumulate_envelope():
    # Throughput mode accuracy envelope: median per-body error ~3e-3 on TPU
    # (interpret mode computes the dot in fp32, so this is trivially tight
    # there; the gate matters on real hardware).
    s = init.uniform_random(jax.random.key(7), 512)
    f = np.asarray(body_force_mxu(s.pos, s.pos, interpret=INTERP,
                                  pair_dtype=jnp.bfloat16, softening=1e-3))
    ref = np.asarray(body_force_jnp(s.pos, s.pos, softening=1e-3))
    per_body = np.abs(f - ref).max(axis=1) / (np.abs(ref).max(axis=1) + 1e-6)
    assert np.median(per_body) < 1e-2


class TestCoincidentRouting:
    """Square-call coincident routing (overlap-masked blocks): 'auto' and
    'fast' must be BITWISE equal to 'masked' on duplicate-free inputs
    (w feeds the matmul directly, like the sym_mxu forward); 'auto' must
    route duplicates back to the all-masked kernel; rectangular calls
    ignore the flag (pos_i can be embedded in pos_j — self pairs at a
    caller-only-known offset)."""

    KW = dict(softening=1e-9, tile_i=64, tile_j=128, interpret=INTERP)

    def test_square_bitwise(self):
        s = init.uniform_random(jax.random.key(51), 300)
        ref = np.asarray(body_force_mxu(s.pos, s.pos, s.mass,
                                        coincident="masked", **self.KW))
        for mode in ("auto", "fast"):
            got = np.asarray(body_force_mxu(s.pos, s.pos, s.mass,
                                            coincident=mode, **self.KW))
            np.testing.assert_array_equal(got, ref)

    def test_square_duplicates_route_to_masked(self):
        s = init.uniform_random(jax.random.key(52), 300)
        dup = s.pos.at[200].set(s.pos[3])  # crosses both tile sizes
        ref = np.asarray(body_force_mxu(dup, dup, coincident="masked",
                                        **self.KW))
        got = np.asarray(body_force_mxu(dup, dup, coincident="auto",
                                        **self.KW))
        np.testing.assert_array_equal(got, ref)
        assert np.isfinite(got).all()

    def test_rect_embedded_ignores_fast(self):
        # pos_i is a slice (distinct object) embedded in pos_j: the self
        # pairs sit mid-array, so the rect path must mask even under
        # 'fast' — the result must equal the masked one exactly.
        s = init.uniform_random(jax.random.key(53), 300)
        sub = s.pos[:200]
        ref = np.asarray(body_force_mxu(sub, s.pos, coincident="masked",
                                        **self.KW))
        got = np.asarray(body_force_mxu(sub, s.pos, coincident="fast",
                                        **self.KW))
        np.testing.assert_array_equal(got, ref)
        assert np.isfinite(got).all()

    def test_validation(self):
        s = init.uniform_random(jax.random.key(54), 64)
        with pytest.raises(ValueError, match="coincident"):
            body_force_mxu(s.pos, s.pos, coincident="no", interpret=INTERP)
