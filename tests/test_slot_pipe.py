"""Slot-list traversal (ops/slot_pipe.py): slot-list coverage properties,
equivalence to the band traversal, fold correctness, the auto/masked
bitwise invariant, and the segmented driver.

On CPU both traversals run fp32 matmuls, so slots match band to
accumulation-order ulps; on the real TPU both feed the MXU bf16 operands
and share one error class (gated by the config-3 drift run like every
sym_mxu surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops import slot_pipe as sp
from mini_nbody_tpu.ops.reference import body_force_jnp
from mini_nbody_tpu.ops.sym_mxu_force import (
    body_force_sym_mxu,
    body_force_sym_mxu_segmented,
)

INTERP = jax.default_backend() != "tpu"
RTOL, ATOL_SCALE = ((1e-4, 1e-5) if INTERP else (2e-2, 5e-3))


@pytest.mark.parametrize("nb", range(1, 10))
@pytest.mark.parametrize("fold", [False, True])
def test_tri_slot_list_covers_every_block_pair_once(nb, fold):
    seen = set()
    for kind, bi, bj in sp.tri_slot_list(nb, fold):
        if kind == sp.SLOT_DIAG:
            assert bi == bj
            pairs = [(bi, bi)]
        elif kind == sp.SLOT_CROSS:
            assert bi < bj
            pairs = [(bi, bj)]
        else:
            assert fold and bi + 1 == bj and bi % 2 == 0
            pairs = [(bi, bi), (bj, bj)]
        for p in pairs:
            assert p not in seen, f"block pair {p} visited twice"
            seen.add(p)
    want = {(i, j) for i in range(nb) for j in range(i, nb)}
    assert seen == want
    # fold halves the diagonal slot count (odd nb: one left over)
    n_fold = sum(1 for k, *_ in sp.tri_slot_list(nb, fold)
                 if k == sp.SLOT_FOLD)
    assert n_fold == (nb // 2 if fold else 0)


def _force(n, tile, chunk, masses=False, **kw):
    s = init.plummer(jax.random.key(n), n)
    m = s.mass if masses else None
    f = body_force_sym_mxu(s.pos, m, tile=tile, chunk=chunk,
                           interpret=INTERP, **kw)
    return s, m, np.asarray(f)


@pytest.mark.parametrize("n,tile,chunk,masses", [
    (256, 64, 256, False),
    (300, 64, 128, True),      # multi-chunk, ragged tail
    (512, 64, 512, True),      # even block count
    (200, 64, 64, False),      # many chunks
])
def test_slots_vs_oracle(n, tile, chunk, masses):
    s, m, f = _force(n, tile, chunk, masses, softening=1e-2,
                     traversal="slots")
    ref = np.asarray(body_force_jnp(s.pos, s.pos, m, softening=1e-2))
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(f, ref, rtol=RTOL, atol=ATOL_SCALE * scale)


@pytest.mark.parametrize("n,tile,chunk", [(256, 64, 256), (384, 64, 128)])
def test_slots_vs_band_close(n, tile, chunk):
    """Same kernels' math, different accumulation order: tight allclose
    (error relative to the global force scale — cancellation noise)."""
    _, _, a = _force(n, tile, chunk, traversal="slots")
    _, _, b = _force(n, tile, chunk, traversal="band")
    scale = max(np.abs(b).max(), 1.0)
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-6 * scale)


def test_auto_bitwise_equals_masked_within_slot_path():
    s = init.uniform_random(jax.random.key(3), 256)
    a = np.asarray(body_force_sym_mxu(s.pos, tile=64, chunk=256,
                                      interpret=INTERP, coincident="fast"))
    b = np.asarray(body_force_sym_mxu(s.pos, tile=64, chunk=256,
                                      interpret=INTERP,
                                      coincident="masked"))
    # no coincident pair exists -> maskless w == masked w exactly, and the
    # slot accumulation order is identical -> bitwise
    np.testing.assert_array_equal(a, b)


def test_fold_vs_nofold_and_duplicates():
    rng = np.random.default_rng(7)
    pos = rng.standard_normal((256, 3)).astype(np.float32)
    pos[130] = pos[3]    # cross-block duplicate
    pos[65] = pos[70]    # within-block duplicate (fold territory)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, 256), jnp.float32)
    pos = jnp.asarray(pos)
    from mini_nbody_tpu.ops.sym_mxu_force import _combine, _pack

    p, pjt, v = _pack(pos, mass, 256, 256)
    ref = np.asarray(body_force_jnp(pos, pos, mass))
    scale = max(np.abs(ref).max(), 1.0)
    outs = []
    # direct builder call: tile must be 128-aligned on real TPU (Mosaic
    # lane rule; the production entry rounds up via _resolve_tiling)
    t = 64 if INTERP else 128
    for fold in (False, True):
        call = sp.build_tri_slot_call(1e-9, t, 256, interpret=INTERP,
                                      mask_offdiag=True, fold=fold)
        f = np.asarray(_combine(p, np.asarray(call(p, pjt, v)).T))
        np.testing.assert_allclose(f, ref, rtol=RTOL,
                                   atol=max(ATOL_SCALE, 1e-4) * scale)
        outs.append(f)
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=5e-6 * scale)


def test_split_w_slot_path():
    s, m, f = _force(256, 64, 256, masses=True, split_w=True,
                     traversal="slots")
    ref = np.asarray(body_force_jnp(s.pos, s.pos, m))
    scale = max(np.abs(ref).max(), 1.0)
    tol = (1e-4, 1e-5) if INTERP else (1e-3, 1e-4)
    np.testing.assert_allclose(f, ref, rtol=tol[0], atol=tol[1] * scale)


def test_segmented_slots_matches_one_program():
    s = init.plummer(jax.random.key(11), 384)
    one = np.asarray(body_force_sym_mxu(
        s.pos, s.mass, tile=64, chunk=128, interpret=INTERP,
        traversal="slots"))
    seg = np.asarray(body_force_sym_mxu_segmented(
        s.pos, s.mass, tile=64, chunk=128, interpret=INTERP,
        pairs_per_dispatch=128 * 128 * 2, traversal="slots"))
    scale = max(np.abs(one).max(), 1.0)
    np.testing.assert_allclose(seg, one, rtol=0, atol=5e-6 * scale)
