"""Trajectory checkpoint / resume.

The reference's implicit checkpointing is body state persisting in the shared
PS<->PL RAM between force passes (the ``waiting`` FSM state,
``src/top_level.vhd:180-186``) — the host can read or rewrite state between
invocations. Here the step is a pure function of BodyState, so checkpointing
is just saving the SoA arrays: npz (portable, zero-dep) with the step count
and config fingerprint for resume validation.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from mini_nbody_tpu.models.state import BodyState
from mini_nbody_tpu.utils.config import SimConfig


def _normalize(path) -> Path:
    # np.savez appends '.npz' when missing; normalize up front so save()
    # reports the file that actually exists and load() finds it.
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(
        path.suffix + ".npz")


def save(path, state: BodyState, step: int = 0,
         cfg: Optional[SimConfig] = None) -> Path:
    """Write a checkpoint; returns the actual path written (suffix
    normalized to .npz). Device arrays are fetched to host."""
    path = _normalize(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = {"step": int(step)}
    if cfg is not None:
        meta["config"] = dataclasses.asdict(cfg)
    np.savez(
        path,
        pos=np.asarray(jax.device_get(state.pos)),
        vel=np.asarray(jax.device_get(state.vel)),
        mass=np.asarray(jax.device_get(state.mass)),
        meta=json.dumps(meta),
    )
    return path


def load(path) -> Tuple[BodyState, int, Optional[dict]]:
    """Read a checkpoint -> (state, step, config_dict_or_None)."""
    with np.load(_normalize(path), allow_pickle=False) as z:
        state = BodyState.create(z["pos"], z["vel"], z["mass"])
        meta = json.loads(str(z["meta"]))
    return state, meta.get("step", 0), meta.get("config")


def restore_config(cfg_dict: dict) -> SimConfig:
    if cfg_dict.get("mesh_shape") is not None:
        cfg_dict = dict(cfg_dict, mesh_shape=tuple(cfg_dict["mesh_shape"]))
    return SimConfig(**cfg_dict)
