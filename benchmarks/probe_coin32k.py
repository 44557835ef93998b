import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.sym_mxu_force import body_force_sym_mxu
from mini_nbody_tpu.utils.harness import time_step_fn
n = 32768
s = init.plummer(jax.random.key(n), n)
row = {"n": n}
for mode in ("masked", "auto"):
    sec = time_step_fn(
        lambda pos, m=mode: pos + 1e-12 * body_force_sym_mxu(
            pos, s.mass, coincident=m), s.pos, n, reps=2)
    row[f"{mode}_us_step"] = round(sec * 1e6, 1)
row["auto_over_masked"] = round(row["auto_us_step"] / row["masked_us_step"], 3)
print(json.dumps(row), flush=True)
