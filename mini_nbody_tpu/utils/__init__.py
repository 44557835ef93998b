from mini_nbody_tpu.utils.config import SimConfig

__all__ = ["SimConfig"]
