"""Measured tile autotuner with a persistent per-device cache.

The kernels ship with measured-best defaults for TPU v5e (tile=1024 /
chunk=131072 for the symmetric kernels, (512, 2048) for the streaming
kernels — benchmarks/RESULTS.md), but other TPU generations, problem
sizes, or future kernels shift the optimum. `tune(cfg)` times one force
pass per candidate tiling ON THE LIVE BACKEND and returns a SimConfig
with the winner applied; results persist in a JSON cache keyed by
(device kind, backend, mass mode, N bucket) so each point is measured
once per machine.

The reference ships exactly one tiling, frozen at synthesis time
(num_blocks=12, /root/reference .../top_level.vhd:44); an autotuner is the
software-framework analog of re-running synthesis for a new part.

CLI: ``python -m mini_nbody_tpu.cli tune --n 1048576 --backend sym_mxu``.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Callable, Optional

from mini_nbody_tpu.utils.config import SimConfig

#: Candidate tilings per backend family. Symmetric kernels take one square
#: tile (VMEM-bounded from above); streaming kernels take (tile_i, tile_j).
SYM_TILES = (512, 768, 896, 1024, 1152)
STREAM_TILES = ((256, 2048), (512, 1024), (512, 2048), (1024, 1024))
#: Chunk candidates for the symmetric kernels' cross-chunk decomposition
#: (only measured when n spans multiple chunks; at N=1M both measured
#: within noise on v5e — 413.6 vs 415.0 G/s).
SYM_CHUNKS = (131072, 262144)
#: Resident-kernel tiles (ops/resident_sym.py; measured only for configs
#: that route resident).
RESIDENT_TILES = (512, 640, 768, 896, 1024)
#: Symmetric-backward tiles (vjp_pos_sym / vjp_pos_sym_mxu).
BWD_TILES = (512, 640, 768, 896)
#: Ensemble streamed-kernel tile candidates (sym_tile of the batched
#: drivers). Smaller tiles than the standalone sweep: per-system padding
#: costs quadratic pair work PER SYSTEM, so at small per-system N the
#: optimum drops fast (r3g: the flat 1024 default was 3.06x slower than
#: padding-aware tiling at N=1024 mass mode). None = the padded_auto_tile
#: heuristic, kept as the baseline candidate.
ENSEMBLE_TILES = (None, 128, 256, 384, 512, 768, 1024)

CACHE_ENV = "NBODY_TUNE_CACHE"


def cache_path() -> pathlib.Path:
    env = os.environ.get(CACHE_ENV)
    if env:
        return pathlib.Path(env)
    base = pathlib.Path(os.environ.get(
        "XDG_CACHE_HOME", pathlib.Path.home() / ".cache"))
    return base / "mini_nbody_tpu" / "autotune.json"


def _load(path: pathlib.Path) -> dict:
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _save(path: pathlib.Path, data: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(data, indent=1, sort_keys=True))
    tmp.replace(path)


def _bucket(n: int) -> int:
    """Round n up to a power of two: the optimum shifts with scale, not
    with every individual N."""
    b = 1
    while b < n:
        b *= 2
    return b


def _key(cfg: SimConfig, ensemble: int = 0) -> str:
    import jax

    device = jax.devices()[0].device_kind.replace(" ", "_")
    # pair_dtype/split_w change the kernel's compute balance (mxu-bf16 vs
    # mxu-fp32 optima differ by a 2x rate class), so they key the cache;
    # coincident routing changes the VPU body by ~2 ops/pair (12.8%
    # measured), enough to move tile optima, so it keys too. Ensembles key
    # on the B bucket as well: the batched kernels' padding economics are
    # (B, N)-shaped (per-system pads cost quadratic pair work PER SYSTEM —
    # ops/sym_mxu_force.ensemble_tiling), so the optimum moves with both.
    parts = [
        device, cfg.effective_backend(),
        "mass" if cfg.use_masses else "unit", str(_bucket(cfg.n)),
        cfg.pair_dtype, "wsplit" if cfg.split_w else "w1",
        cfg.coincident,
    ]
    if ensemble:
        parts.append(f"ens{_bucket(ensemble)}")
    return "|".join(parts)


def _default_measure(cfg: SimConfig, reps: int) -> float:
    """Median seconds per step of cfg on the live backend, amortized over
    auto_inner(n) scanned steps per sync — a single un-amortized pass would
    be swamped by the ~33 ms dispatch overhead at small N (CLAUDE.md) and
    cache a noise winner. Times the full step (force + O(N) integrate),
    matching bench.py's methodology. cfg.resident=True candidates time the
    resident kernel instead (its tile is what resident_tile tunes)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mini_nbody_tpu.models import init

    state = init.uniform_random(jax.random.key(0), cfg.n)
    if cfg.resident:
        from mini_nbody_tpu.ops.resident_sym import simulate_resident_sym
        from mini_nbody_tpu.utils.harness import auto_inner

        steps = auto_inner(cfg.n)
        mxu = cfg.effective_backend() == "sym_mxu"

        def once():
            t0 = time.perf_counter()
            pos, _ = simulate_resident_sym(
                state.pos, state.vel,
                state.mass if cfg.use_masses else None,
                steps=steps, dt=float(cfg.dt),
                softening=float(cfg.softening), mxu=mxu,
                tile=cfg.resident_tile,
                interpret=cfg.resolve_interpret(),
                coincident=cfg.coincident)
            np.asarray(jax.device_get(pos[0, 0]))
            return time.perf_counter() - t0

        once()
        return min(once() for _ in range(reps)) / steps

    from mini_nbody_tpu.sim import make_step_fn
    from mini_nbody_tpu.utils.harness import time_step_fn

    acc = jnp.zeros_like(state.pos)
    return time_step_fn(make_step_fn(cfg), (state, acc), n=cfg.n, reps=reps)


def _default_measure_bwd(cfg: SimConfig, reps: int) -> float:
    """Seconds per backward pass of the symmetric VJP kernel at
    cfg.sym_bwd_tile (the backward family's tunable)."""
    import jax

    from mini_nbody_tpu.models import init
    from mini_nbody_tpu.utils.harness import time_fn

    state = init.uniform_random(jax.random.key(0), cfg.n)
    g = state.pos + 1.0
    mass = state.mass if cfg.use_masses else None
    interpret = cfg.resolve_interpret()
    tile = cfg.sym_bwd_tile
    if cfg.bf16_class():
        from mini_nbody_tpu.ops.vjp_mxu import vjp_pos_sym_mxu as vjp
    else:
        from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym as vjp
    kw = {} if tile is None else {"tile": tile}

    def run():
        return vjp(state.pos, g, mass, softening=float(cfg.softening),
                   interpret=interpret, coincident=cfg.coincident, **kw)

    return time_fn(run, reps=reps)


def _default_measure_ensemble(cfg: SimConfig, b: int, reps: int) -> float:
    """Median seconds per STEP of a B-system ensemble run at cfg's tiling,
    amortized over ONE multi-step dispatch (whole-carry per-step timing
    carries ~165 us/step of tunnel sync bias — CLAUDE.md r3e; the fused
    scan removes it). cfg.resident=True candidates time the batched-
    resident kernel at cfg.resident_tile; streamed candidates time the
    jitted k-step ensemble scan at cfg.sym_tile."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mini_nbody_tpu.models import init
    from mini_nbody_tpu.models.state import BodyState

    n = cfg.n
    make = init.plummer if cfg.use_masses else init.uniform_random
    s = make(jax.random.key(0), n)
    pos = s.pos[None] + 1e-3 * jax.random.normal(jax.random.key(1),
                                                 (b, n, 3), jnp.float32)
    state = BodyState(pos=pos,
                      vel=jnp.broadcast_to(s.vel, (b, n, 3)),
                      mass=jnp.broadcast_to(s.mass, (b, n)))
    interp = cfg.resolve_interpret()
    mxu = cfg.effective_backend() == "sym_mxu"
    if mxu:
        from mini_nbody_tpu.ops.sym_mxu_force import ensemble_tiling

        _, c = ensemble_tiling(n, cfg.sym_tile, interp)
    else:
        from mini_nbody_tpu.ops.symmetric_force import ensemble_tiling

        _, c = ensemble_tiling(n, cfg.sym_tile, cfg.use_masses, interp)
    # ~1e11 padded pairs per timed dispatch: >=30x the ~33 ms sync cost at
    # the measured ensemble rates, well under the watchdog.
    steps = int(min(512, max(4, 1e11 / (b * float(c) * c))))

    if cfg.resident:
        from mini_nbody_tpu.ops.resident_sym import (
            simulate_resident_sym_ensemble)

        def once():
            t0 = time.perf_counter()
            p, _ = simulate_resident_sym_ensemble(
                state.pos, state.vel,
                state.mass if cfg.use_masses else None,
                steps=steps, dt=float(cfg.dt),
                softening=float(cfg.softening), mxu=mxu,
                tile=cfg.resident_tile, interpret=interp,
                coincident=cfg.coincident)
            np.asarray(jax.device_get(p[0, 0, 0]))
            return time.perf_counter() - t0
    else:
        from mini_nbody_tpu.sim import _ensemble_initial_acc, _ensemble_run_k

        acc = _ensemble_initial_acc(cfg, None, state)

        def once():
            t0 = time.perf_counter()
            st, _ = _ensemble_run_k(cfg, None, state, acc, steps)
            np.asarray(jax.device_get(st.pos[0, 0, 0]))
            return time.perf_counter() - t0

    once()
    return min(once() for _ in range(reps)) / steps


def _candidates(cfg: SimConfig):
    eff = cfg.effective_backend()
    if eff in ("sym", "sym_mxu"):
        return [cfg.replace(sym_tile=t) for t in SYM_TILES]
    if eff in ("pallas", "mxu"):
        return [cfg.replace(tile_i=ti, tile_j=tj) for ti, tj in STREAM_TILES]
    return [cfg]  # jnp: nothing to tune


def _params(cfg: SimConfig) -> dict:
    return {"sym_tile": cfg.sym_tile, "sym_chunk": cfg.sym_chunk,
            "tile_i": cfg.tile_i, "tile_j": cfg.tile_j,
            "sym_bwd_tile": cfg.sym_bwd_tile,
            "resident_tile": cfg.resident_tile}


#: Tiling fields each backend family actually tunes; a cache hit applies
#: ONLY these (and only where the user left the SimConfig default), so
#: `run --autotune --sym-chunk 65536` keeps the explicit chunk instead of
#: resetting it to the tune-time value.
FAMILY_PARAMS = {
    "sym": ("sym_tile", "sym_chunk", "sym_bwd_tile", "resident_tile"),
    "sym_mxu": ("sym_tile", "sym_chunk", "sym_bwd_tile", "resident_tile"),
    "pallas": ("tile_i", "tile_j"),
    "mxu": ("tile_i", "tile_j"),
}

#: Fields the ensemble family tunes: the streamed batched drivers take
#: their tile from sym_tile; the batched-resident route is pinned
#: (resident True/False) with its own tile, since tune measures both
#: families head to head at the actual (B, N).
ENSEMBLE_FAMILY_PARAMS = ("sym_tile", "resident", "resident_tile")


def _apply_cached(cfg: SimConfig, params: dict,
                  fields: tuple | None = None) -> SimConfig:
    """Apply a cached result to cfg: family-tuned fields only, user
    overrides (any field differing from the dataclass default) kept."""
    defaults = SimConfig(n=cfg.n)
    keep = {}
    for k in fields or FAMILY_PARAMS.get(cfg.effective_backend(), ()):
        if k in params and getattr(cfg, k) == getattr(defaults, k):
            keep[k] = params[k]
    return cfg.replace(**keep)


def _sweep(cands, measure, reps, results):
    """(best_cand, best_sec) over candidates; failed compiles recorded."""
    best, best_sec = None, float("inf")
    for cand in cands:
        try:
            sec = measure(cand, reps)
        except Exception as e:  # VMEM-exceeded compiles etc.
            results[json.dumps(_params(cand))] = f"failed: {str(e)[:80]}"
            continue
        results[json.dumps(_params(cand))] = sec
        if sec < best_sec:
            best, best_sec = cand, sec
    return best, best_sec


def tune(
    cfg: SimConfig,
    reps: int = 2,
    use_cache: bool = True,
    measure: Optional[Callable[[SimConfig, int], float]] = None,
    path: Optional[pathlib.Path] = None,
    backward: bool = False,
    measure_bwd: Optional[Callable[[SimConfig, int], float]] = None,
) -> SimConfig:
    """Return cfg with the measured-fastest tiling for its backend applied.

    Phases (each a fresh remote Mosaic compile per candidate — CLAUDE.md):
      1. kernel-family tile sweep (sym_tile / (tile_i, tile_j));
      2. sym_chunk sweep at the winning tile, only when N spans multiple
         chunks (the cross-chunk decomposition is in play);
      3. resident_tile sweep, only when cfg.resident routes the resident
         kernel (cfg.resident=True);
      4. with backward=True: sym_bwd_tile sweep of the symmetric VJP
         kernel matching the config's precision class.

    Candidates that fail to compile (e.g. a tile exceeding VMEM) are
    skipped. `measure`/`measure_bwd` are injectable for tests. With
    use_cache, a prior result for the same (device, backend, mass-mode,
    N-bucket, pair_dtype, split_w) key is applied without re-measuring —
    family-relevant params only, explicit user overrides kept.
    use_cache=False skips the READ only (force a re-measure); fresh
    results are always persisted so `tune --no-cache` updates the cache.
    """
    measure = measure or _default_measure
    measure_bwd = measure_bwd or _default_measure_bwd
    path = path or cache_path()
    key = _key(cfg)
    if use_cache:
        hit = _load(path).get(key)
        if hit and (not backward
                    or hit["params"].get("sym_bwd_tile") is not None):
            return _apply_cached(cfg, hit["params"])

    results = {}
    eff = cfg.effective_backend()
    if cfg.resident and eff in ("sym", "sym_mxu"):
        # A resident config runs the resident kernel: sym_tile/sym_chunk
        # are irrelevant to it — sweep resident_tile only.
        best, best_sec = _sweep(
            [cfg.replace(resident_tile=t) for t in RESIDENT_TILES],
            measure, reps, results)
    else:
        best, best_sec = _sweep(_candidates(cfg), measure, reps, results)
    if best is None:
        raise RuntimeError(
            f"autotune: every candidate failed for {key}: {results}")

    if (not cfg.resident and eff in ("sym", "sym_mxu")
            and cfg.n > min(SYM_CHUNKS)):
        chunk_best, chunk_sec = _sweep(
            [best.replace(sym_chunk=c) for c in SYM_CHUNKS
             if c != (best.sym_chunk or 131072)],
            measure, reps, results)
        if chunk_best is not None and chunk_sec < best_sec:
            best, best_sec = chunk_best, chunk_sec

    if backward and eff in ("sym", "sym_mxu"):
        bwd_best, _ = _sweep(
            [best.replace(sym_bwd_tile=t) for t in BWD_TILES],
            measure_bwd, reps, results)
        if bwd_best is not None:
            best = best.replace(sym_bwd_tile=bwd_best.sym_bwd_tile)

    data = _load(path)
    data[key] = {
        "params": _params(best),
        "seconds": best_sec,
        "ginter_s": float(cfg.n) * cfg.n / best_sec / 1e9,
        "results": results,
    }
    _save(path, data)
    return best


def tune_ensemble(
    cfg: SimConfig,
    b: int,
    reps: int = 2,
    use_cache: bool = True,
    measure: Optional[Callable[[SimConfig, int, int], float]] = None,
    path: Optional[pathlib.Path] = None,
) -> SimConfig:
    """Return cfg with the measured-fastest ENSEMBLE execution plan for a
    B-system batch applied: the streamed batched drivers' sym_tile swept
    over ENSEMBLE_TILES head to head against the batched-resident kernel's
    admissible RESIDENT_TILES, winner pinned (resident True/False +
    tiles). Keyed by (device, backend, mass-mode, N-bucket, ..., B-bucket)
    — the static ensemble_auto_tile heuristic left 3x on the table once
    (r3g), so ensembles get real measurements too.

    CLI: ``tune --ensemble B`` populates the cache;
    ``run --ensemble B --autotune`` consumes it.
    """
    measure = measure or _default_measure_ensemble
    path = path or cache_path()
    key = _key(cfg, ensemble=b)
    if use_cache:
        hit = _load(path).get(key)
        if hit:
            return _apply_cached(cfg, hit["params"],
                                 ENSEMBLE_FAMILY_PARAMS)

    from mini_nbody_tpu.ops.resident_sym import RESIDENT_SYM_MAX_N
    from mini_nbody_tpu.utils.config import round_up

    results = {}
    streamed = [cfg.replace(sym_tile=t, resident=False)
                for t in ENSEMBLE_TILES
                if t is None or t <= round_up(cfg.n, 128)]
    resident = [cfg.replace(resident=True, resident_tile=t)
                for t in RESIDENT_TILES
                if b * round_up(cfg.n, t) <= RESIDENT_SYM_MAX_N
                and cfg.integrator in ("euler", "leapfrog", "yoshida4")]

    def meas(cand, r):
        return measure(cand, b, r)

    best, best_sec = _sweep(streamed + resident, meas, reps, results)
    if best is None:
        raise RuntimeError(
            f"tune_ensemble: every candidate failed for {key}: {results}")

    data = _load(path)
    params = dict(_params(best))
    params["resident"] = bool(best.resident)
    data[key] = {
        "params": params,
        "seconds": best_sec,
        "g_pairs_s": b * float(cfg.n) * cfg.n / best_sec / 1e9,
        "results": results,
    }
    _save(path, data)
    return best


def cached_rate(cfg: SimConfig,
                path: Optional[pathlib.Path] = None) -> Optional[float]:
    """Measured GInteractions/s from a prior tune of this config's cache
    key, or None — consumed by sim's watchdog pacing so segment sizing
    uses the real kernel rate instead of the flat conservative estimate."""
    try:
        hit = _load(path or cache_path()).get(_key(cfg))
    except Exception:
        return None
    if not hit:
        return None
    rate = hit.get("ginter_s")
    return float(rate) if rate else None
