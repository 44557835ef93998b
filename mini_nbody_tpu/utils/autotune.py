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


def _key(cfg: SimConfig) -> str:
    import jax

    device = jax.devices()[0].device_kind.replace(" ", "_")
    # pair_dtype/split_w change the kernel's compute balance (mxu-bf16 vs
    # mxu-fp32 optima differ by a 2x rate class), so they key the cache.
    return "|".join([
        device, cfg.effective_backend(),
        "mass" if cfg.use_masses else "unit", str(_bucket(cfg.n)),
        cfg.pair_dtype, "wsplit" if cfg.split_w else "w1",
    ])


def _default_measure(cfg: SimConfig, reps: int) -> float:
    """Median seconds per step of cfg on the live backend, amortized over
    auto_inner(n) scanned steps per sync — a single un-amortized pass would
    be swamped by the ~33 ms dispatch overhead at small N (CLAUDE.md) and
    cache a noise winner. Times the full step (force + O(N) integrate),
    matching bench.py's methodology."""
    import jax
    import jax.numpy as jnp

    from mini_nbody_tpu.models import init
    from mini_nbody_tpu.sim import make_step_fn
    from mini_nbody_tpu.utils.harness import time_step_fn

    state = init.uniform_random(jax.random.key(0), cfg.n)
    acc = jnp.zeros_like(state.pos)
    return time_step_fn(make_step_fn(cfg), (state, acc), n=cfg.n, reps=reps)


def _candidates(cfg: SimConfig):
    eff = cfg.effective_backend()
    if eff in ("sym", "sym_mxu"):
        return [cfg.replace(sym_tile=t) for t in SYM_TILES]
    if eff in ("pallas", "mxu"):
        return [cfg.replace(tile_i=ti, tile_j=tj) for ti, tj in STREAM_TILES]
    return [cfg]  # jnp: nothing to tune


def _params(cfg: SimConfig) -> dict:
    return {"sym_tile": cfg.sym_tile, "sym_chunk": cfg.sym_chunk,
            "tile_i": cfg.tile_i, "tile_j": cfg.tile_j}


#: Tiling fields each backend family actually tunes; a cache hit applies
#: ONLY these (and only where the user left the SimConfig default), so
#: `run --autotune --sym-chunk 65536` keeps the explicit chunk instead of
#: resetting it to the tune-time value.
FAMILY_PARAMS = {
    "sym": ("sym_tile", "sym_chunk"),
    "sym_mxu": ("sym_tile", "sym_chunk"),
    "pallas": ("tile_i", "tile_j"),
    "mxu": ("tile_i", "tile_j"),
}


def _apply_cached(cfg: SimConfig, params: dict) -> SimConfig:
    """Apply a cached result to cfg: family-tuned fields only, user
    overrides (any field differing from the dataclass default) kept."""
    defaults = SimConfig(n=cfg.n)
    keep = {}
    for k in FAMILY_PARAMS.get(cfg.effective_backend(), ()):
        if k in params and getattr(cfg, k) == getattr(defaults, k):
            keep[k] = params[k]
    return cfg.replace(**keep)


def tune(
    cfg: SimConfig,
    reps: int = 2,
    use_cache: bool = True,
    measure: Optional[Callable[[SimConfig, int], float]] = None,
    path: Optional[pathlib.Path] = None,
) -> SimConfig:
    """Return cfg with the measured-fastest tiling for its backend applied.

    Candidates that fail to compile (e.g. a tile exceeding VMEM) are
    skipped. `measure` is injectable for tests; the default times a real
    force pass. With use_cache, a prior result for the same (device,
    backend, mass-mode, N-bucket) key is applied without re-measuring.
    """
    measure = measure or _default_measure
    path = path or cache_path()
    key = _key(cfg)
    if use_cache:
        hit = _load(path).get(key)
        if hit:
            return _apply_cached(cfg, hit["params"])

    best, best_sec = None, float("inf")
    results = {}
    for cand in _candidates(cfg):
        try:
            sec = measure(cand, reps)
        except Exception as e:  # VMEM-exceeded compiles etc.
            results[json.dumps(_params(cand))] = f"failed: {str(e)[:80]}"
            continue
        results[json.dumps(_params(cand))] = sec
        if sec < best_sec:
            best, best_sec = cand, sec
    if best is None:
        raise RuntimeError(
            f"autotune: every candidate failed for {key}: {results}")

    if use_cache:
        data = _load(path)
        data[key] = {
            "params": _params(best),
            "seconds": best_sec,
            "ginter_s": float(cfg.n) * cfg.n / best_sec / 1e9,
            "results": results,
        }
        _save(path, data)
    return best
