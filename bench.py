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


def main():
    n = int(os.environ.get("NBODY_BENCH_N", 1 << 20))
    reps = int(os.environ.get("NBODY_BENCH_REPS", 2))
    backend = os.environ.get("NBODY_BENCH_BACKEND", "auto")

    from mini_nbody_tpu import SimConfig, init
    from mini_nbody_tpu.sim import make_step_fn
    from mini_nbody_tpu.utils.harness import Throughput, time_step_fn

    cfg = SimConfig(
        n=n, dt=0.01, backend=backend, integrator="euler",
        tile_i=512, tile_j=2048,
    )
    state = init.uniform_random(jax.random.key(0), n)
    acc = jax.numpy.zeros_like(state.pos)
    step = make_step_fn(cfg)

    sec = time_step_fn(step, (state, acc), n=n, reps=reps)
    t = Throughput(n=n, steps=1, seconds=sec, n_devices=1)

    print(
        json.dumps(
            {
                "device": jax.devices()[0].device_kind,
                "backend": cfg.effective_backend(),
                **t.report(path={"mxu": "mxu", "sym": "sym"}.get(
                    cfg.effective_backend(), "vpu")),
            }
        ),
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"per-chip interactions/s, N={n}, fp32 (symmetric kernel)",
                "value": round(t.ginteractions_per_s_per_device, 3),
                "unit": "GInteractions/s",
                "vs_baseline": round(t.ginteractions_per_s_per_device / BASELINE_GIPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
