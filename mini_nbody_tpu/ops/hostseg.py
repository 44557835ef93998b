"""Shared host-segmentation driver for chunk-decomposed pair kernels.

The symmetric kernels decompose N into nc chunks of c bodies: nc self-chunk
work units (~c^2/2 pairs each) plus nc*(nc-1)/2 cross-chunk units (c^2
pairs). One XLA program over all units exceeds the execution watchdog for
large N (a ~14 min N=16M pass), so this driver scans GROUPS of units per
jitted dispatch, keeping the accumulators on device and donating them
between dispatches.

Two hard-won constraints (see CLAUDE.md):
* every dispatch must end with a real device->host transfer —
  block_until_ready can return early through the axon tunnel, and queueing
  minutes of work behind one final read crashes the TPU worker;
* dispatches above ~1.2e13 pairs reproducibly crashed the worker at N=16M;
  the 4e12 default (~12-25 s of device time) runs clean.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def cross_pair_offsets(nc: int, c: int):
    return [(a * c, b * c) for a in range(nc) for b in range(a + 1, nc)]


def make_runners(tri_body, cross_body):
    """Jitted group runners for drive(). Callers MUST cache the result per
    static configuration (functools.lru_cache keyed on (softening, tile, c,
    ...)): jax.jit caches by function identity, so rebuilding these every
    force call would recompile up to 4 programs per integration step —
    ruinous through the remote compile helper."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_tri(a0, a1, *rest):
        *consts_, offs = rest
        (a0, a1, *_), _ = jax.lax.scan(tri_body, (a0, a1, *consts_), offs)
        return a0, a1

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_cross(a0, a1, *rest):
        *consts_, offs = rest
        (a0, a1, *_), _ = jax.lax.scan(cross_body, (a0, a1, *consts_), offs)
        return a0, a1

    return run_tri, run_cross


def make_runners1(tri_body, cross_body):
    """Single-accumulator variant of make_runners for the unified-acc
    slot-pipelined traversal (ops/slot_pipe.py): scan carries are
    (acc, *consts); runners return a 1-tuple so drive() is unchanged.
    Same caching obligation as make_runners."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_tri(a0, *rest):
        *consts_, offs = rest
        (a0, *_), _ = jax.lax.scan(tri_body, (a0, *consts_), offs)
        return (a0,)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_cross(a0, *rest):
        *consts_, offs = rest
        (a0, *_), _ = jax.lax.scan(cross_body, (a0, *consts_), offs)
        return (a0,)

    return run_tri, run_cross


def drive(run_tri, run_cross, accs, consts, nc: int, c: int,
          pairs_per_dispatch: float = 4e12, progress=None):
    """Run all chunk units through host-grouped dispatches.

    run_tri/run_cross: cached runners from make_runners (scan bodies over
    carry (acc_0, acc_1, *consts) and a unit offset). accs: initial
    accumulator arrays (donated between dispatches). consts: arrays threaded
    through unchanged (positions etc. — NOT donated: they may alias caller
    arrays). Returns the final accumulators."""
    g_cross = max(1, int(pairs_per_dispatch // (c * c)))
    g_tri = 2 * g_cross  # tri units are ~c^2/2 pairs

    def _sync(buf):
        np.asarray(jax.device_get(buf.ravel()[0]))

    def _groups(arr, g):
        full = len(arr) - len(arr) % g
        for i in range(0, full, g):
            yield arr[i:i + g]
        if full < len(arr):
            yield arr[full:]

    import jax.numpy as jnp

    tri_offs = np.arange(nc, dtype=np.int32) * c
    cross_offs = np.asarray(cross_pair_offsets(nc, c),
                            dtype=np.int32).reshape(-1, 2)
    total = len(tri_offs) + len(cross_offs)
    done = 0
    for runner, offs, g in ((run_tri, tri_offs, g_tri),
                            (run_cross, cross_offs, g_cross)):
        for grp in _groups(offs, g):
            accs = runner(*accs, *consts, jnp.asarray(grp))
            _sync(accs[0])
            done += len(grp)
            if progress is not None:
                progress(done, total)
    return accs
