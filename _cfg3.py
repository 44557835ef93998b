import time, jax, numpy as np
from mini_nbody_tpu import SimConfig, simulate, init, native
from mini_nbody_tpu.ops import diagnostics as diag

def energy_f64(state, soft):
    pos = np.asarray(state.pos); m = np.asarray(state.mass)
    v = np.asarray(state.vel, np.float64)
    ke = 0.5 * (m.astype(np.float64) * (v*v).sum(1)).sum()
    return ke + native.potential_energy_oracle(pos, m, softening=soft)

n, soft, dt, steps = 262144, 1e-2, 1e-3, 1000
state = init.plummer(jax.random.key(0), n)
e0 = energy_f64(state, soft)
print(f"E0 = {e0:.8f}", flush=True)
for backend, pd in [("mxu", "bfloat16"), ("auto", "float32")]:
    cfg = SimConfig(n=n, dt=dt, steps=steps, integrator="leapfrog",
                    softening=soft, backend=backend, pair_dtype=pd, use_masses=True)
    t0 = time.perf_counter()
    out = simulate(cfg, state)
    jax.block_until_ready(out.pos)
    wall = time.perf_counter() - t0
    e1 = energy_f64(out, soft)
    rate = float(n)**2 * steps / wall / 1e9
    print(f"{backend}/{pd}: wall {wall:.0f}s ({rate:.0f} G/s incl compile) "
          f"drift {abs(e1-e0)/abs(e0):.2e} (gate 1e-5)", flush=True)
