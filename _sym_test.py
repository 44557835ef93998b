import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.symmetric_force import body_force_symmetric
from mini_nbody_tpu.ops.reference import body_force_jnp

for n, tile, ch in [(256, 64, 256), (300, 64, 128), (512, 128, 256), (1024, 128, 512), (960, 64, 320)]:
    s = init.uniform_random(jax.random.key(n), n)
    ref = np.asarray(body_force_jnp(s.pos, s.pos))
    f = np.asarray(body_force_symmetric(s.pos, tile=tile, chunk=ch, interpret=True))
    sc = np.abs(ref).max()
    print(f"N={n} tile={tile} chunk={ch}: rel err {np.abs(f-ref).max()/sc:.2e}")
