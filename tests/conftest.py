"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device tests emulate the TPU mesh with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); Pallas kernels
run in interpret mode on CPU (SimConfig.resolve_interpret handles this).
Must set the env vars before the first jax import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU regardless of inherited env (the axon TPU tunnel sets
# JAX_PLATFORMS=axon, and jax is often imported by pytest plugins before this
# conftest runs — so set the config var, which wins as long as no backend has
# been initialized yet). Opt back into real-TPU testing with NBODY_TEST_TPU=1.
if not os.environ.get("NBODY_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    # fp64 oracle available in-jax on CPU; ops pin fp32 explicitly. (Keep x64
    # OFF for real-TPU runs: i64 index types break Mosaic lowering.)
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def oracle_force(pos, mass=None, softening=1e-9):
    """fp64 NumPy all-pairs softened gravity — the golden model the reference
    never had (its testbenches are value-blind, sim/tb_dxy.vhd:899-923)."""
    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    mass = np.ones(n) if mass is None else np.asarray(mass, np.float64)
    d = pos[None, :, :] - pos[:, None, :]
    r2 = (d * d).sum(-1) + softening
    w = r2 ** -1.5 * mass[None, :]
    return (d * w[:, :, None]).sum(1)


def oracle_force_rect(pos_i, pos_j, mass_j=None, softening=1e-9):
    pos_i = np.asarray(pos_i, np.float64)
    pos_j = np.asarray(pos_j, np.float64)
    mass_j = (
        np.ones(pos_j.shape[0]) if mass_j is None else np.asarray(mass_j, np.float64)
    )
    d = pos_j[None, :, :] - pos_i[:, None, :]
    r2 = (d * d).sum(-1) + softening
    w = r2 ** -1.5 * mass_j[None, :]
    return (d * w[:, :, None]).sum(1)


@pytest.fixture
def oracle():
    return oracle_force


@pytest.fixture
def oracle_rect():
    return oracle_force_rect
