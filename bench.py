"""Headline benchmark: per-chip GInteractions/s at N=1M (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference design's only absolute rate —
3.0 GInteractions/s (12 interactions/cycle at a 250 MHz fabric clock,
BASELINE.md row "Hypothetical absolute rate").

Extra context goes to stderr. Override knobs via env:
  NBODY_BENCH_N (default 1048576), NBODY_BENCH_REPS, NBODY_BENCH_BACKEND.
"""

import json
import os
import sys

import jax

BASELINE_GIPS = 3.0  # reference FPGA @250 MHz, 12 interactions/cycle

#: North-star comparison (BASELINE.md "The CUDA-nbody number"): the one
#: published CUDA-nbody absolute rate (GPU Gems 3 ch. 31, GeForce 8800 GTX,
#: ">200 GFLOPS" / 20 flops-per-pair) and a peak-scaled V100-class estimate
#: (15.7 TF fp32 x ~0.55 sample efficiency / 20).
CUDA_NBODY_PUBLISHED_GIPS = 10.0
CUDA_NBODY_V100_EST_GIPS = 430.0


def main():
    n = int(os.environ.get("NBODY_BENCH_N", 1 << 20))
    reps = int(os.environ.get("NBODY_BENCH_REPS", 2))
    # Default headline backend: the symmetric MXU hybrid. BASELINE.json's
    # north star names "fp32 or bf16-pairs/fp32-accumulate" kernels with the
    # energy-drift gate (<=1e-5 @1k steps) as the accuracy criterion;
    # sym_mxu passes the official config-3 gate at 6.3e-8 (RESULTS.md) and
    # sustains ~473 GInter/s at N=1M (coincident='auto' maskless blocks)
    # vs 343 for the fp32-exact `sym`
    # (set NBODY_BENCH_BACKEND=sym to bench the fp32 headline instead).
    backend = os.environ.get("NBODY_BENCH_BACKEND", "sym_mxu")

    from mini_nbody_tpu import SimConfig, init
    from mini_nbody_tpu.sim import make_step_fn
    from mini_nbody_tpu.utils.harness import (
        Throughput, roofline_path, time_step_fn)

    cfg = SimConfig(
        n=n, dt=0.01, backend=backend, integrator="euler",
        tile_i=512, tile_j=2048,
    )
    state = init.uniform_random(jax.random.key(0), n)
    acc = jax.numpy.zeros_like(state.pos)
    step = make_step_fn(cfg)

    sec = time_step_fn(step, (state, acc), n=n, reps=reps)
    t = Throughput(n=n, steps=1, seconds=sec, n_devices=1)

    eff = cfg.effective_backend()
    # Label derived from the backend actually run (VERDICT r1 weak #2):
    # sym/pallas are fp32-exact; mxu/sym_mxu accumulate through bf16 MXU
    # passes (fp32 accumulator, exact fp32 distances).
    precision = {
        "sym": "fp32", "pallas": "fp32", "jnp": "fp32",
        "mxu": "bf16-accumulate", "sym_mxu": "bf16-accumulate",
    }.get(eff, "fp32")
    kernel = {
        "sym": "symmetric kernel", "sym_mxu": "symmetric MXU hybrid",
        "pallas": "direct kernel", "mxu": "MXU hybrid", "jnp": "jnp fallback",
    }.get(eff, eff)
    print(
        json.dumps(
            {
                "device": jax.devices()[0].device_kind,
                "backend": eff,
                **t.report(path=roofline_path(cfg)),
            }
        ),
        file=sys.stderr,
    )
    if backend == "auto" and eff == "sym":
        # Context line (stderr, not the contract line): the bf16-accumulate
        # record kernel at the same N. The headline metric stays fp32-exact
        # for round-over-round and CUDA-nbody comparability.
        cfg2 = cfg.replace(backend="sym_mxu")
        sec2 = time_step_fn(make_step_fn(cfg2), (state, acc), n=n, reps=reps)
        t2 = Throughput(n=n, steps=1, seconds=sec2, n_devices=1)
        print(
            json.dumps(
                {
                    "context": "bf16-accumulate record (symmetric MXU "
                               "hybrid; drift gate 6.3e-8 vs 1e-5)",
                    "backend": "sym_mxu",
                    **t2.report(path="sym_mxu"),
                }
            ),
            file=sys.stderr,
        )
    gips = t.ginteractions_per_s_per_device
    print(
        json.dumps(
            {
                "context": "north-star vs CUDA nbody (BASELINE.md table)",
                "cuda_published_8800gtx_gips": CUDA_NBODY_PUBLISHED_GIPS,
                "margin_vs_published_x": round(
                    gips / CUDA_NBODY_PUBLISHED_GIPS, 1),
                "cuda_v100_class_estimate_gips": CUDA_NBODY_V100_EST_GIPS,
                "margin_vs_v100_class_x": round(
                    gips / CUDA_NBODY_V100_EST_GIPS, 2),
                "source": "GPU Gems 3 ch.31 (Nyland, Harris, Prins 2007)",
            }
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (f"per-chip interactions/s, N={n}, "
                           f"{precision} ({kernel})"),
                "value": round(t.ginteractions_per_s_per_device, 3),
                "unit": "GInteractions/s",
                "vs_baseline": round(t.ginteractions_per_s_per_device / BASELINE_GIPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
