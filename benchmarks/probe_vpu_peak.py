"""Probe: sustained VPU fp32 elementwise peak (the CHIP_PEAKS basis).

The round-3 headline artifact reported roofline_frac = 1.006: the sym_mxu
maskless kernel sustains 473 G unordered-pair-halves/s x 8.5 op-equivalents
= 4.02e12 VPU ops/s against a CHIP_PEAKS constant of 4.0e12 — so the r2
microbenchmark UNDERESTIMATED the sustained peak (a %-roofline metric must
never exceed 1.0; round-3 VERDICT weak #2). This probe re-measures it with
several op mixes and long fused chains, so the constant can be set from the
best measured mix (the ceiling is the fastest thing the VPU demonstrably
does, not the average).

Method: jit a lax.scan whose body applies K unrolled elementwise ops to a
VMEM-friendly (2048, 512) fp32 carry (4 MB; K >= 192 ops/element/iteration
= 24+ ops/byte of HBM traffic even if the carry round-trips, safely
compute-bound against ~819 GB/s). Mixes:
  - fma:   x = x*a + b with ARRAY multiplicands alternating a/b (affine in
           x but not constant-foldable without materializing the chain);
           counts 2 ops per FMA, the conventional accounting this repo's
           op models use (d^2 = dx*dx + ... in the kernels are FMAs too).
  - mul:   x = x*a alternating two array multiplicands; 1 op each.
  - logi:  logistic map x = r*x*(1-x): sub+mul+mul, non-affine (nothing a
           compiler can fold), 3 ops; bounds x in (0,1) forever.
  - force: the kernel body's flavor: 3 FMAs + rsqrt + 2 mul per "lane
           step" (9 op-equivalents with rsqrt counted as its measured
           ~1-slot cost on v5e).

Rates are ops/s with the per-mix op count above. Run on-chip:
    python benchmarks/probe_vpu_peak.py
and set CHIP_PEAKS[...]["vpu_fp32"] (utils/harness.py) from the max.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_nbody_tpu.utils.harness import time_fn

SHAPE = (2048, 512)  # 4 MB fp32
SCAN = 400


def _inputs(key):
    ka, kb, kx = jax.random.split(key, 3)
    a = jax.random.uniform(ka, SHAPE, jnp.float32, 0.999, 1.001)
    b = jax.random.uniform(kb, SHAPE, jnp.float32, -1e-3, 1e-3)
    x = jax.random.uniform(kx, SHAPE, jnp.float32, 0.25, 0.75)
    return x, a, b


def make_fma(k_unroll=128):
    @jax.jit
    def run(x, a, b):
        def body(c, _):
            for i in range(k_unroll):
                c = c * (a if i % 2 == 0 else b + 1.0) + (b if i % 2 else -b)
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=SCAN)
        return c

    return run, 2 * k_unroll


def make_fma_ilp(chains):
    """`chains` INDEPENDENT fma chains advancing together: a single chain
    (make_fma) is latency-bound — every op waits on the previous result, so
    it measures pipeline latency, not issue throughput (measured 2.14e12 vs
    4.02e12 sustained by the real kernels, whose (T,T) temporaries expose
    plenty of ILP). Chains join only once per scan iteration (1 op in
    ~2*k_unroll*chains)."""

    def maker(k_unroll=64):
        @jax.jit
        def run(x, a, b):
            def body(c, _):
                ys = [c * (1.0 + float(k) * 1e-6) for k in range(chains)]
                for i in range(k_unroll):
                    m = a if i % 2 == 0 else b + 1.0
                    s = b if i % 2 else -b
                    ys = [y * m + s for y in ys]
                # fold back to one carry (chains-1 adds + rescale)
                c = ys[0]
                for y in ys[1:]:
                    c = c + y
                return c * (1.0 / chains), None

            c, _ = jax.lax.scan(body, x, None, length=SCAN)
            return c

        return run, 2 * k_unroll * chains

    return maker


def make_mul(k_unroll=192):
    @jax.jit
    def run(x, a, b):
        inv = 1.0 / a
        def body(c, _):
            for i in range(k_unroll):
                c = c * (a if i % 2 == 0 else inv)
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=SCAN)
        return c

    return run, k_unroll


def make_logistic(k_unroll=64):
    @jax.jit
    def run(x, a, b):
        def body(c, _):
            for _ in range(k_unroll):
                c = 3.7 * c * (1.0 - c)
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=SCAN)
        return c

    return run, 3 * k_unroll


def make_force_mix(k_unroll=24):
    @jax.jit
    def run(x, a, b):
        def body(c, _):
            for _ in range(k_unroll):
                d2 = c * c + (b * b + 1e-9)          # 2 FMA = 4 ops
                inv = jax.lax.rsqrt(d2 * d2 * d2)    # 2 mul + rsqrt = 3
                c = c * a + inv * 1e-6               # FMA + mul = 3  (scaled
                # so c stays O(1): inv <= ~1e4 at d2 >= ~1e-3)
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=SCAN)
        return c

    return run, 10 * k_unroll


def make_w_mix(chains):
    """THE roofline mix: each chain-iteration is literally the maskless
    sym_mxu w-pipeline (ops/sym_mxu_force._w_block, coincident-safe body) —
    3 sub, d2 = dx*dx+dy*dy+dz*dz, +softening, w = rsqrt((r2*r2)*r2) —
    counted at the SAME 17 op-equivalent convention the kernel model uses
    (sub/mul/add = 1, rsqrt = 4.7; utils/harness.py). w feeds back as the
    next iteration's position coordinate, so the chain costs ZERO ops
    beyond the body itself (the map contracts to a bounded fixed point —
    values converge, instructions still execute; XLA cannot fold a rsqrt
    chain). The best rate over `chains` is the demonstrated VPU ceiling
    for exactly this instruction mix at full ILP with no grid, mask, MXU
    or memory work attached — the kernel cannot beat it, so
    kernel_rate / this is a true <=1.0 roofline fraction."""

    def maker(k_unroll=16):
        @jax.jit
        def run(x, a, b):
            def body(c, _):
                ys = [c * (1.0 + float(k) * 1e-3) for k in range(chains)]
                for _ in range(k_unroll):
                    new = []
                    for y in ys:
                        dx = y - 0.125  # nonzero: y - 0.0 would fold away
                        dy = y - 1.0
                        dz = y - 2.0
                        d2 = dx * dx + dy * dy + dz * dz
                        r2 = d2 + 1.0
                        new.append(jax.lax.rsqrt((r2 * r2) * r2))
                    ys = new
                c = ys[0]
                for y in ys[1:]:
                    c = c + y
                return c * (1.0 / chains), None

            c, _ = jax.lax.scan(body, x, None, length=SCAN)
            return c

        # 17 op-equivalents per chain body (the maskless-pair convention)
        return run, 17 * k_unroll * chains

    return maker


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(), "shape": SHAPE,
                      "scan": SCAN}))
    x, a, b = _inputs(jax.random.key(0))
    elems = SHAPE[0] * SHAPE[1]
    best = 0.0
    for name, maker in (("fma", make_fma), ("mul", make_mul),
                        ("logistic", make_logistic),
                        ("force_mix", make_force_mix),
                        ("fma_ilp2", make_fma_ilp(2)),
                        ("fma_ilp4", make_fma_ilp(4)),
                        ("fma_ilp8", make_fma_ilp(8)),
                        ("fma_ilp16", make_fma_ilp(16)),
                        ("fma_ilp32", make_fma_ilp(32)),
                        ("w_mix_ilp8", make_w_mix(8)),
                        ("w_mix_ilp16", make_w_mix(16)),
                        ("w_mix_ilp32", make_w_mix(32)),
                        ("w_mix_ilp64", make_w_mix(64))):
        run, ops_per_elem = maker()
        sec = time_fn(run, x, a, b, reps=5)
        rate = elems * ops_per_elem * SCAN / sec
        best = max(best, rate)
        print(json.dumps({"mix": name, "ops_per_elem_iter": ops_per_elem,
                          "sec": round(sec, 6),
                          "ops_per_s": f"{rate:.4e}"}), flush=True)
    print(json.dumps({"best_ops_per_s": f"{best:.4e}"}))
