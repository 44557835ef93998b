"""Probe: PRODUCTION slot-pipelined traversal vs the diagonal-band grid.

probe_slotlist.py priced the machinery on a synthetic all-cross workload
(slot list ~free, one-slot pipeline -13.4%/slot). This probe measures the
real integrated path (ops/slot_pipe.py via sym_mxu_force._slot_accumulate:
pack + traversal + epilogue) against the shipping band traversal at the
shmoo sizes, both mask variants, fold on/off — the numbers that decide the
default `traversal` and the routing gates.

Expected from the slot model (slots x us/slot, band 4.45 / pipe 3.86):
  8k:  band 40 slots -> slots-nofold 36 -> fold 32;  +25-35%
  16k: band 144 -> 136 -> 128;                        +17-27%
  65k: band 2112 -> 2080 -> 2048;                     +17-19%
  262k (2 chunks of 131072): pipeline-dominated;      ~+15%

Also on-chip value checks: slots vs band allclose (both bf16 class, order
ulps only) and the fast == masked bitwise invariant through the slot path.

Run: python benchmarks/probe_slot_prod.py [quick]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops.sym_mxu_force import (
    _combine, _pack, _resolve_tiling, _slot_accumulate, body_force_sym_mxu)
from mini_nbody_tpu.utils.config import SOFTENING
from mini_nbody_tpu.utils.harness import auto_inner, time_fn

INTERP = jax.default_backend() != "tpu"
CHUNK = 131072


def slot_force(pos, mask_offdiag, fold, tile=1024):
    n = pos.shape[0]
    t, c, nc, np_ = _resolve_tiling(n, tile, CHUNK, INTERP)
    p, pjt, v = _pack(pos, None, n, np_)
    acc = _slot_accumulate(p, pjt, v, SOFTENING, t, c, nc, np_, INTERP,
                           False, mask_offdiag, fold=fold)
    return _combine(p, acc.T)[:n]


def band_force(pos, coincident):
    return body_force_sym_mxu(pos, tile=1024, chunk=CHUNK, interpret=INTERP,
                              coincident=coincident, traversal="band")


def timed(n, make_force, inner_div=4):
    pos = minit.plummer(jax.random.key(0), n).pos

    inner = max(2, auto_inner(n) // inner_div)

    @jax.jit
    def chain(p):
        def body(c, _):
            f = make_force(c)
            return c + 0.0 * f, None

        return jax.lax.scan(body, p, None, length=inner)[0]

    sec = time_fn(chain, pos, reps=2) / inner
    return sec, 2.0 * (n / 1e3) * (n / 1e3) / (sec * 1e3) / 2.0 * 1.0


def g_inter(n, sec):
    return 2.0 * n * n / 2.0 / sec / 1e9  # 2 interactions per unordered pair


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    # --- value checks (N=16384, single chunk) -------------------------
    n = 16384 if not quick else 4096
    pos = minit.plummer(jax.random.key(1), n).pos
    band = np.asarray(band_force(pos, "fast"))
    scale = np.abs(band).max()
    fast = np.asarray(jax.jit(lambda p: slot_force(p, False, True))(pos))
    masked = np.asarray(jax.jit(lambda p: slot_force(p, True, True))(pos))
    print(json.dumps({
        "check": "slots_vs_band_rel",
        "max": float(np.abs(fast - band).max() / scale)}), flush=True)
    print(json.dumps({
        "check": "fast_vs_masked_bitwise",
        "equal": bool(np.array_equal(fast, masked)),
        "max": float(np.abs(fast - masked).max() / scale)}), flush=True)

    # --- timing matrix ------------------------------------------------
    sizes = [8192, 16384, 65536, 262144] if not quick else [4096]
    for n in sizes:
        row = {"n": n}
        variants = [
            ("band_fast", lambda c: band_force(c, "fast")),
            ("slots_fold_fast", lambda c: slot_force(c, False, True)),
        ]
        if n <= 16384:
            variants.append(
                ("slots_nofold_fast", lambda c: slot_force(c, False, False)))
        if n <= 8192:
            variants += [
                ("band_masked", lambda c: band_force(c, "masked")),
                ("slots_fold_masked", lambda c: slot_force(c, True, True)),
            ]
        for name, mk in variants:
            try:
                sec, _ = timed(n, mk)
                row[name] = {"us_step": round(sec * 1e6, 2),
                             "ginter_s": round(g_inter(n, sec), 1)}
            except Exception as e:  # VMEM admission faults land here
                row[name] = {"error": str(e)[:2000]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
