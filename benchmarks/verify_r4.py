"""Round-4 verify drive (real TPU): standard surface + new r4 surfaces."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_nbody_tpu import SimConfig, simulate, body_force, init

assert jax.default_backend() == "tpu", jax.default_backend()
t0 = time.time()

# 1. Standard drive (skill recipe)
s = init.uniform_random(jax.random.key(0), 4096)
f_ref = np.asarray(body_force(s.pos, s.pos, s.mass, backend="jnp"))
f_pal = np.asarray(body_force(s.pos, s.pos, s.mass, backend="pallas"))
err = np.abs(f_pal - f_ref).max() / np.abs(f_ref).max()
print("pallas vs jnp rel err:", err, flush=True)
assert err < 1e-5
out = simulate(SimConfig(n=4096, steps=10), s)
assert np.isfinite(np.asarray(out.pos)).all()
print("simulate auto ok", time.time() - t0, flush=True)

# 2. N-gated 'auto' (resolve_auto): small-N sym_mxu forward still correct
sm = init.plummer(jax.random.key(1), 1000)
fa = np.asarray(body_force(sm.pos, sm.pos, sm.mass, backend="sym_mxu",
                           coincident="auto"))
fm = np.asarray(body_force(sm.pos, sm.pos, sm.mass, backend="sym_mxu",
                           coincident="masked"))
np.testing.assert_array_equal(fa, fm)
print("auto==masked at N=1000 (gated) ok", time.time() - t0, flush=True)

# 3. Resident yoshida4 vs streamed yoshida4 (fp32 class)
n = 1024
sp = init.plummer(jax.random.key(2), n)
base = SimConfig(n=n, dt=1e-3, steps=5, softening=1e-2, backend="sym",
                 use_masses=True, integrator="yoshida4")
ref = simulate(base.replace(resident=False), sp)
res = simulate(base.replace(resident=True), sp)
scale = np.abs(np.asarray(ref.pos)).max()
dp = np.abs(np.asarray(res.pos) - np.asarray(ref.pos)).max() / scale
print("resident yoshida4 vs streamed rel pos diff:", dp, flush=True)
assert dp < 1e-5, dp

# 4. Batched ensemble backward bitwise vs standalone (both classes)
from mini_nbody_tpu.ops.vjp_kernel import vjp_pos_sym, vjp_pos_sym_ensemble
from mini_nbody_tpu.ops.vjp_mxu import (vjp_pos_sym_mxu,
                                        vjp_pos_sym_mxu_ensemble)

B, NE = 8, 512
ss = [init.plummer(jax.random.key(100 + i), NE) for i in range(B)]
pos = jnp.stack([x.pos for x in ss])
g = jnp.stack([jnp.sin(7.0 * x.pos) for x in ss])
mass = jnp.stack([x.mass for x in ss])
for name, ens, one in (("fp32", vjp_pos_sym_ensemble, vjp_pos_sym),
                       ("mxu", vjp_pos_sym_mxu_ensemble, vjp_pos_sym_mxu)):
    bars = np.asarray(ens(pos, g, mass, tile=128))
    for i in range(B):
        r = np.asarray(one(pos[i], g[i], mass[i], tile=128))
        np.testing.assert_array_equal(bars[i], r)
    print(f"ensemble backward {name} bitwise ok", time.time() - t0,
          flush=True)

# 5. r4 gate move (COINCIDENT_AUTO_MIN_N 32768 -> 16384): at N=16384
# 'auto' now takes the duplicate-scan + maskless route — must stay
# bitwise identical to 'masked' on-chip (the 'auto' contract).
from mini_nbody_tpu.ops.sym_mxu_force import resolve_auto

assert resolve_auto("auto", 16384) == "auto"
assert resolve_auto("auto", 16383) == "masked"
sg = init.plummer(jax.random.key(3), 16384)
fa = np.asarray(body_force(sg.pos, sg.pos, sg.mass, backend="sym_mxu",
                           coincident="auto"))
fm = np.asarray(body_force(sg.pos, sg.pos, sg.mass, backend="sym_mxu",
                           coincident="masked"))
np.testing.assert_array_equal(fa, fm)
print("auto==masked at N=16384 (scan route) ok", time.time() - t0,
      flush=True)

# 6. Recalibrated roofline: report() must be <= 1.0 at the headline config.
from mini_nbody_tpu.utils.harness import Throughput, chip_peaks

peaks = chip_peaks()
assert peaks["vpu_fp32"] == 5.0e12, peaks
rep = Throughput(n=1_048_576, steps=1, seconds=1_048_576**2 / 473.4e9
                 ).report(path="sym_mxu")
print("headline-rate roofline_frac:", rep["roofline_frac"], flush=True)
assert rep["roofline_frac"] <= 1.0

print("ALL VERIFY CHECKS PASSED", time.time() - t0, flush=True)
