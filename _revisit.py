import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def k(in_ref, out_ref):
    i = pl.program_id(0)
    @pl.when(i == 0)
    def _(): out_ref[:] = jnp.ones_like(out_ref)
    @pl.when(i > 0)
    def _(): out_ref[:] = out_ref[:] + 1.0

f = pl.pallas_call(
    k, grid=(4, 4),
    in_specs=[pl.BlockSpec((8,128), lambda i,j:(0,0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8,128), lambda i,j:(j,0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((32,128), jnp.float32),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary","arbitrary")),
)
x = jnp.zeros((8,128))
out = np.asarray(jax.jit(f)(x))
print("unique values:", np.unique(out))  # all 4.0 iff revisits reload
