from mini_nbody_tpu.ops.force import body_force, make_force_fn
from mini_nbody_tpu.ops.reference import body_force_jnp

__all__ = ["body_force", "make_force_fn", "body_force_jnp"]
