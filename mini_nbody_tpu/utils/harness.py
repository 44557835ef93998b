"""Timing + throughput harness.

TPU-native replacement for the reference's profiling system — a hardware
kilocycle counter published to the host in control-word bits 63:32 at
completion (``src/top_level.vhd:95-96,121-146,255-263``), from which the host
derives interactions/s. Here: wall-clock around a forced device round-trip,
GInteractions/s, and %-of-VPU-roofline per BASELINE.json's metric.

Note on synchronization: under the axon TPU tunnel ``block_until_ready`` can
return before remote execution completes, so ``time_fn`` forces a small
device->host transfer of the result to bound the measurement (verified: gives
physically-plausible rates where block_until_ready alone reports impossible
ones).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from typing import Callable

import jax
import numpy as np

#: Conventional flops-per-interaction accounting used by the CUDA nbody
#: samples (and BASELINE.json): 20 flops per body-body interaction.
FLOPS_PER_INTERACTION = 20.0

#: Approximate VPU fp32 op cost of one interaction in the direct kernel
#: (3 sub, 6 for r^2, 1 rsqrt, 3 cube/scale, 3 mul, 3 add-accumulate).
VPU_OPS_PER_INTERACTION = 19.0

#: The symmetric kernel computes each unordered pair once (~23 ops) and
#: covers two ordered interactions: ~11.5 VPU ops per interaction.
VPU_OPS_PER_INTERACTION_SYM = 11.5

#: Mass mode adds ~9 ops/unordered pair (per-side mass scaling + a
#: displacement recompute for VMEM liveness — ops/symmetric_force.py).
VPU_OPS_PER_INTERACTION_SYM_MASS = 16.0

#: The sym x MXU hybrid keeps only distances + rsqrt on the VPU (~17
#: op-equivalents per unordered pair; products/reductions ride the MXU).
#: The default coincident='auto' route runs maskless off-diagonal blocks
#: (ops/sym_mxu_force.py); the always-masked family pays ~2 more
#: op-equivalents per pair (measured 414.0 vs 472.9 G/s at N=1M), so
#: coincident='masked' runs report ~0.88 of this ceiling by construction.
VPU_OPS_PER_INTERACTION_SYM_MXU = 8.5

#: Peak-throughput estimates per chip generation (per-chip, fp32 VPU ops/s and
#: bf16 MXU flops/s). v5e/v5-lite vpu_fp32 is MEASURED on this hardware as
#: the sustained rate of EXACTLY the maskless w-pipeline (3 sub, d2, +soft,
#: rsqrt((r2*r2)*r2)) counted at the same op-equivalent convention the
#: kernel models use (rsqrt = 4.7), at full instruction-level parallelism:
#: benchmarks/probe_vpu_peak.py w_mix — 3.55e12 at ILP=8, 4.49e12 ILP=16,
#: 4.81e12 ILP=32, 5.01e12 ILP=64 (pure-FMA ILP=32 tops at 5.31e12). The
#: r2 serial-chain figure (4.0e12) undercounted ILP and put the r3 headline
#: at an impossible roofline_frac = 1.006; 5.0e12 is the demonstrated
#: ceiling for the kernels' actual instruction mix, so kernel/ceiling is a
#: true <=1.0 fraction. Other rows are estimates from published TFLOPs.
CHIP_PEAKS = {
    "v5 lite": {"vpu_fp32": 5.0e12, "mxu_bf16": 197e12, "clock": 1.5e9},
    "v5e": {"vpu_fp32": 5.0e12, "mxu_bf16": 197e12, "clock": 1.5e9},
    "v5p": {"vpu_fp32": 7.2e12, "mxu_bf16": 459e12, "clock": 1.75e9},
    "v4": {"vpu_fp32": 4.3e12, "mxu_bf16": 275e12, "clock": 1.05e9},
    "v6e": {"vpu_fp32": 7.6e12, "mxu_bf16": 918e12, "clock": 0.94e9},
    "cpu": {"vpu_fp32": 1e11, "mxu_bf16": 1e12, "clock": 3e9},
}


def roofline_path(cfg, sharded: bool = False) -> str:
    """Roofline accounting lane for a config's effective backend."""
    eff = cfg.effective_backend(sharded=sharded)
    if eff == "sym":
        return "sym_mass" if cfg.use_masses else "sym"
    if eff in ("mxu", "sym_mxu"):
        return eff
    return "vpu"


def chip_peaks() -> dict:
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return CHIP_PEAKS["cpu"]


def _force_sync(out):
    """Force full execution: device->host transfer of one leaf element."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def time_fn(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> float:
    """Median wall-clock seconds per call of fn(*args), compile excluded."""
    for _ in range(warmup):
        _force_sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force_sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def auto_inner(n: int, target_pairs: float = 4e12, cap: int = 65536) -> int:
    """Steps per timed sync so fixed dispatch overhead (~33 ms through the
    axon tunnel) amortizes below ~0.5%: ~target_pairs interactions/sync is
    ~10 s of kernel time at the headline rate (and safely inside both the
    watchdog and the ~4e12-pairs-per-dispatch tunnel crash bound —
    CLAUDE.md). The old 1.2e11 target left N=262,144 syncing every step:
    33 ms on a 199 ms step read as a fake 18% "throughput valley" at
    exactly the official config-3 size (round-2 VERDICT item 1; re-measured
    409.3 G/s = 0.972 roofline, vs 345.3 mis-measured). The round-3a
    cap=4096 was the same bug one octave down: at N<=8192 it left ~8 us
    (33 ms / 4096) of sync overhead on every step — 40%+ of an N=1024
    step, -14% at N=4096. cap=65536 keeps the worst small-N sync share
    below ~6% (N=1024 resident: 0.56 s device work per sync) while scan
    compile time stays length-independent."""
    return max(1, min(cap, int(target_pairs // (float(n) * n) or 1)))


def time_step_fn(step: Callable, carry, n: int, reps: int = 3,
                 inner: int | None = None) -> float:
    """Seconds per step of `step((state, acc)) -> (state, acc)`, measured as a
    jitted lax.scan of `inner` steps per sync (overhead amortized)."""
    import jax

    if inner is None:
        inner = auto_inner(n)
        if jax.default_backend() != "tpu":
            # No ~33 ms tunnel sync to amortize off-TPU (CPU tests):
            # long scans only slow the suite.
            inner = min(inner, 64)
    if inner == 1:
        # Skip the scan wrapper: at this size the 33 ms sync overhead is
        # already negligible and the scan only slows compilation.
        return time_fn(jax.jit(step), carry, reps=reps, warmup=1)

    @jax.jit
    def multi(c):
        def body(c2, _):
            return step(c2), None

        c2, _ = jax.lax.scan(body, c, None, length=inner)
        return c2

    return time_fn(multi, carry, reps=reps, warmup=1) / inner


@dataclass
class Throughput:
    n: int
    steps: int
    seconds: float
    n_devices: int = 1

    @property
    def interactions(self) -> float:
        return float(self.n) ** 2 * self.steps

    @property
    def ginteractions_per_s(self) -> float:
        return self.interactions / self.seconds / 1e9

    @property
    def ginteractions_per_s_per_device(self) -> float:
        return self.ginteractions_per_s / self.n_devices

    @property
    def gflops(self) -> float:
        return self.interactions * FLOPS_PER_INTERACTION / self.seconds / 1e9

    def roofline_fraction(self, path: str = "vpu") -> float:
        """Fraction of per-chip peak: 'vpu' for the direct kernel (VPU-bound),
        'mxu' for the gram-matrix kernel (MXU-bound)."""
        peaks = chip_peaks()
        per_dev = self.interactions / self.seconds / self.n_devices
        if path == "vpu":
            return per_dev * VPU_OPS_PER_INTERACTION / peaks["vpu_fp32"]
        if path == "sym":
            return per_dev * VPU_OPS_PER_INTERACTION_SYM / peaks["vpu_fp32"]
        if path == "sym_mass":
            return (per_dev * VPU_OPS_PER_INTERACTION_SYM_MASS
                    / peaks["vpu_fp32"])
        if path == "sym_mxu":
            # VPU-bound despite the MXU accumulation (the matmuls' padded
            # slot cost is ~1/3 of the VPU time at these shapes).
            return (per_dev * VPU_OPS_PER_INTERACTION_SYM_MXU
                    / peaks["vpu_fp32"])
        return per_dev * FLOPS_PER_INTERACTION / peaks["mxu_bf16"]

    def report(self, path: str = "vpu") -> dict:
        return {
            "n": self.n,
            "steps": self.steps,
            "seconds": round(self.seconds, 6),
            "ginteractions_per_s": _sig(self.ginteractions_per_s),
            "per_device": _sig(self.ginteractions_per_s_per_device),
            "gflops_20c": _sig(self.gflops),
            "roofline_frac": _sig(self.roofline_fraction(path)),
        }


def _sig(x: float, figs: int = 6) -> float:
    """Round to significant figures, not fixed decimals: a tiny-but-real
    rate (n=64 interpret mode through the remote tunnel can land below
    5e-4 GInter/s) must not report as exactly 0.0."""
    if x == 0 or not math.isfinite(x):
        return x
    return round(x, max(0, figs - 1 - math.floor(math.log10(abs(x)))))
