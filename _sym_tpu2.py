import time, jax, numpy as np
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric
from mini_nbody_tpu.ops.reference import body_force_jnp

# correctness at the winning tile
n = 8192
s = init.uniform_random(jax.random.key(0), n)
ref = np.asarray(body_force_jnp(s.pos, s.pos))
f = np.asarray(body_force_symmetric(s.pos, tile=1024, chunk=131072))
print(f"t=1024 @8192 rel err: {np.abs(f-ref).max()/np.abs(ref).max():.2e}", flush=True)

N = 262144
s = init.uniform_random(jax.random.key(0), N)
def bench(name, reps=3, **kw):
    try:
        f = body_force_symmetric(s.pos, **kw); _ = np.asarray(f[0])
        t0 = time.perf_counter()
        for _ in range(reps): f = body_force_symmetric(s.pos, **kw); _ = np.asarray(f[0])
        dt = (time.perf_counter()-t0)/reps - 0.033
        print(f"{name:30s}: {dt*1e3:7.1f} ms  {N*N/dt/1e9:7.1f} G/s", flush=True)
    except Exception as e:
        print(f"{name:30s}: FAIL {str(e)[:80]}", flush=True)

for tile, ch in [(1024, 262144), (1152, 131072), (1280, 131072), (1536, 131072)]:
    bench(f"sym t={tile} chunk={ch}", tile=tile, chunk=ch)

# N=1M headline check
N = 1048576
s = init.uniform_random(jax.random.key(0), N)
bench("sym t=1024 chunk=131072 @1M", tile=1024, chunk=131072)
bench("sym t=1024 chunk=262144 @1M", tile=1024, chunk=262144)
