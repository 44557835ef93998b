from mini_nbody_tpu.ops.force import body_force, make_force_fn
from mini_nbody_tpu.ops.reference import body_force_jnp
from mini_nbody_tpu.ops.autodiff import make_differentiable_force

__all__ = [
    "body_force",
    "make_force_fn",
    "body_force_jnp",
    "make_differentiable_force",
]
