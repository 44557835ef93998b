from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.models import init

__all__ = ["BodyState", "init"]
