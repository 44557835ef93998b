import time, jax, jax.numpy as jnp, numpy as np
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric
from mini_nbody_tpu.ops.pallas_force import body_force_pallas
from mini_nbody_tpu.ops.reference import body_force_jnp

n = 4096
s = init.uniform_random(jax.random.key(0), n)
ref = np.asarray(body_force_jnp(s.pos, s.pos))
f = np.asarray(body_force_symmetric(s.pos, tile=512, chunk=4096))
print(f"correctness @4096: rel err {np.abs(f-ref).max()/np.abs(ref).max():.2e}")

N = 262144
s = init.uniform_random(jax.random.key(0), N)
def bench(fn, name, reps=3, **kw):
    try:
        f = fn(**kw); _ = np.asarray(f[0])
        t0 = time.perf_counter()
        for _ in range(reps): f = fn(**kw); _ = np.asarray(f[0])
        dt = (time.perf_counter()-t0)/reps - 0.033
        print(f"{name:34s}: {dt*1e3:7.1f} ms  {N*N/dt/1e9:7.1f} G/s")
    except Exception as e:
        print(f"{name:34s}: FAIL {str(e)[:90]}")

bench(lambda **kw: body_force_pallas(s.pos, s.pos, **kw), "direct (512,2048)", tile_i=512, tile_j=2048)
for tile, ch in [(512, 262144), (512, 131072), (640, 131072), (768, 131072), (1024, 131072)]:
    bench(lambda **kw: body_force_symmetric(s.pos, **kw), f"sym t={tile} chunk={ch}", tile=tile, chunk=ch)
