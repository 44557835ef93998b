import time, jax, numpy as np
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric
from mini_nbody_tpu.ops.reference import body_force_jnp
t0=time.time()
n = 4096
s = init.uniform_random(jax.random.key(0), n)
ref = np.asarray(body_force_jnp(s.pos, s.pos))
print("jnp done", time.time()-t0, flush=True)
f = np.asarray(body_force_symmetric(s.pos, tile=512, chunk=4096))
print(f"sym @4096 rel err {np.abs(f-ref).max()/np.abs(ref).max():.2e} t={time.time()-t0:.0f}s", flush=True)
