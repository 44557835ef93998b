"""16M sym_mxu segmented re-cert under the round-5 slot traversal (the
host-segmented driver's slot runners at full scale: 2.8e14 pairs across
watchdog-safe dispatches). Companion to probe_16m_recert.py (fp32)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, numpy as np
from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu_segmented
N = 16 * 1024 * 1024
pos = minit.plummer(jax.random.key(0), N).pos
t0 = time.time()
f = body_force_sym_mxu_segmented(pos)
np.asarray(jax.device_get(f.ravel()[0]))
dt = time.time() - t0
print(json.dumps({"case": "sym_mxu_16M_segmented_slots", "n": N,
                  "seconds": round(dt, 1),
                  "ginter_s": round(N * float(N) / dt / 1e9, 1),
                  "finite": bool(np.isfinite(np.asarray(f[:1000])).all())}))
