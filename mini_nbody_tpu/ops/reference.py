"""Vectorized jnp force op — the correctness anchor and CPU/GPU fallback.

Physics is exactly the reference inner loop (``src/dxy.vhd:94-122``,
``src/dzsoft.vhd:186-202``, ``src/fxyz.vhd:101-127``):

    dx = x_j - x_i; ...
    distSqr = dx^2 + dy^2 + dz^2 + SOFTENING
    invDist3 = rsqrt(distSqr)^3
    F_i += m_j * d * invDist3        (m_j == 1 in the reference)

Self-interaction (j == i) is computed, not skipped: d = 0 so the contribution
is exactly zero and the softening keeps rsqrt finite (SURVEY.md §0).

The op is rectangular — forces on ``pos_i`` due to sources ``(pos_j, mass_j)``
— so the same function serves single-chip (i == j) and sharded use (local
i-shard against gathered/ring-passed j-shards).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mini_nbody_tpu.utils.config import SOFTENING


def _force_block(pos_i, pos_j, mass_j, softening):
    """(Ni,3) x (Nj,3) -> (Ni,3) forces, materializing the (Ni,Nj) pair block."""
    d = pos_j[None, :, :] - pos_i[:, None, :]  # (Ni, Nj, 3)
    dist_sqr = jnp.sum(d * d, axis=-1) + jnp.asarray(softening, d.dtype)
    inv = jax.lax.rsqrt(dist_sqr)
    w = inv * inv * inv * mass_j[None, :]
    return jnp.sum(d * w[:, :, None], axis=1)


@partial(jax.jit, static_argnames=("softening", "row_chunk"))
def body_force_jnp(pos_i, pos_j, mass_j=None, softening: float = SOFTENING,
                   row_chunk: int | None = None):
    """All-pairs softened gravity, pure jnp (XLA fuses; no Pallas).

    Args:
      pos_i: (Ni, 3) positions receiving force.
      pos_j: (Nj, 3) source positions.
      mass_j: (Nj,) source masses; None = unit masses (reference semantics).
      softening: Plummer softening added to each pair distance^2.
      row_chunk: if set, process i-rows in chunks of this size via lax.map to
        bound the (Ni, Nj) intermediate's memory (O(row_chunk * Nj)).

    Returns:
      (Ni, 3) forces (accelerations for unit masses).
    """
    if mass_j is None:
        mass_j = jnp.ones((pos_j.shape[0],), pos_j.dtype)
    if row_chunk is None or row_chunk >= pos_i.shape[0]:
        return _force_block(pos_i, pos_j, mass_j, softening)
    ni = pos_i.shape[0]
    if ni % row_chunk != 0:
        raise ValueError(f"row_chunk {row_chunk} must divide Ni {ni}")
    chunks = pos_i.reshape(ni // row_chunk, row_chunk, 3)
    out = jax.lax.map(lambda c: _force_block(c, pos_j, mass_j, softening), chunks)
    return out.reshape(ni, 3)
