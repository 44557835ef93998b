import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mini_nbody_tpu.models import init as minit
from mini_nbody_tpu.sim import make_step_fn, init_carry
from mini_nbody_tpu.utils.config import SimConfig
from mini_nbody_tpu.utils.harness import Throughput, time_step_fn
from mini_nbody_tpu.ops import sym_mxu_force as smf

def rate(n, coin, gate=None):
    saved = smf.COINCIDENT_AUTO_MIN_N
    if gate is not None:
        smf.COINCIDENT_AUTO_MIN_N = gate
    try:
        cfg = SimConfig(n=n, dt=1e-3, backend="sym_mxu", resident=False,
                        coincident=coin)
        st = minit.uniform_random(jax.random.key(0), n)
        sec = time_step_fn(make_step_fn(cfg), init_carry(cfg, st), n, reps=3)
        return Throughput(n=n, steps=1, seconds=sec).ginteractions_per_s
    finally:
        smf.COINCIDENT_AUTO_MIN_N = saved

for n in (8192,):
    print(json.dumps({"n": n,
                      "masked": round(rate(n, "masked"), 1),
                      "scan_auto": round(rate(n, "auto", gate=0), 1),
                      "fast": round(rate(n, "fast"), 1)}), flush=True)
