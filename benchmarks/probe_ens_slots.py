import sys, json, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu, body_force_sym_mxu_ensemble
from mini_nbody_tpu.utils.harness import time_fn

B, N = 64, 1024
ss = [minit.plummer(jax.random.key(i+1), N) for i in range(B)]
pos = jnp.stack([s.pos for s in ss]); mass = jnp.stack([s.mass for s in ss])

# bitwise check on chip (3 systems)
f = np.asarray(body_force_sym_mxu_ensemble(pos, mass))
ok = all(np.array_equal(f[i], np.asarray(body_force_sym_mxu(
    ss[i].pos, ss[i].mass, tile=1024, chunk=1024))) for i in range(3))
print(json.dumps({"check": "ens_slots_bitwise_vs_standalone", "ok": ok}), flush=True)

for trav in ("band", "slots"):
    @jax.jit
    def chain(p, trav=trav):
        def body(c, _):
            ff = body_force_sym_mxu_ensemble(c, mass, traversal=trav)
            return c + 0.0 * ff, None
        return jax.lax.scan(body, p, None, length=2000)[0]
    sec = time_fn(chain, pos, reps=2) / 2000
    print(json.dumps({"traversal": trav, "us_pass": round(sec*1e6, 2),
                      "g_pairs_s": round(B * N * (N-1) / 2.0 / sec / 1e9, 1)}), flush=True)
