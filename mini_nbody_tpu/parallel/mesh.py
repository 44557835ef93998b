"""Device mesh construction.

The reference is a single-chip design; nothing in its tree crosses a chip
boundary (SURVEY.md §2 item 6). Scale-out is new, TPU-first work: a 1-D
``jax.sharding.Mesh`` over the body axis ("i"), XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

BODY_AXIS = "i"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the body-sharding axis.

    Bodies are data-parallel along "i" (each device owns an i-shard and, per
    step, sees every j-body via all-gather or a ppermute ring — the
    distributed generalization of the reference's j-target stream,
    ``src/top_level.vhd:233-254``).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BODY_AXIS,))
