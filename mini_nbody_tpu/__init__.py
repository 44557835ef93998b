"""mini_nbody_tpu — a TPU-native N-body simulation engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the onur-v/mini-nbody reference
(an FPGA accelerator for the softened all-pairs ``bodyForce`` gravity kernel,
``vec_add.srcs/sources_1/new/``, plus its host-side step loop):

* the O(N^2) softened-gravity interaction loop as a tiled Pallas TPU kernel
  (``ops.pallas_force``) and an MXU gram-matrix variant (``ops.mxu_force``),
* semi-implicit Euler (reference semantics) and leapfrog/KDK integrators,
* multi-step trajectories under ``jit`` + ``lax.scan`` (``sim``),
* mesh scale-out via ``shard_map`` with per-step position all-gather or a
  ``ppermute`` ring over ICI (``parallel``),
* a shmoo benchmark harness reporting GInteractions/s and %-of-roofline
  (``utils.harness``, ``cli``).

Physics fidelity mirrors the reference: SOFTENING = 1e-9 (fp32, baked at
``src/dzsoft.vhd:177``), self-interaction computed-not-skipped (zero
contribution; see ``src/fxyz.vhd:120-127``), dt = 0.01 Euler semantics.
"""

from mini_nbody_tpu.utils.config import SimConfig
from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.models import init
from mini_nbody_tpu.ops.force import body_force, make_force_fn
from mini_nbody_tpu.sim import (make_rollout_fn, make_step_fn, simulate,
                                simulate_ensemble, trajectory,
                                trajectory_ensemble)

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "BodyState",
    "init",
    "body_force",
    "make_force_fn",
    "make_rollout_fn",
    "make_step_fn",
    "simulate",
    "simulate_ensemble",
    "trajectory",
    "trajectory_ensemble",
]
