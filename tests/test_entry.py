"""Driver-contract tests for __graft_entry__.

The round-1 driver artifact MULTICHIP_r01.json was red because
dryrun_multichip inherited JAX_PLATFORMS=axon and initialized the TPU tunnel
backend instead of the virtual CPU mesh (VERDICT.md "What's weak" #1). These
tests run the entry points in a fresh subprocess that mimics the driver
environment — axon pre-set, no conftest help — so a regression shows up here
before it shows up in the driver artifact.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_subprocess(code: str, env_overrides: dict) -> None:
    env = dict(os.environ)
    # Mimic the driver: the axon tunnel env pre-sets JAX_PLATFORMS=axon.
    # Strip the conftest's CPU forcing so only the entry's own robustness
    # is exercised.
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"subprocess failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )


@pytest.mark.parametrize("n_devices", [8, 5])
def test_dryrun_multichip_with_axon_platform_inherited(n_devices):
    """dryrun_multichip must force the virtual CPU mesh itself, even when
    JAX_PLATFORMS=axon is inherited from the driver environment."""
    code = (
        "import __graft_entry__ as e\n"
        f"e.dryrun_multichip({n_devices})\n"
        f"import jax; assert len(jax.devices()) >= {n_devices}\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "print('dryrun OK')\n"
    )
    _run_in_subprocess(code, {"JAX_PLATFORMS": "axon"})


def test_dryrun_multichip_in_process():
    """In-process smoke: callable directly from a CPU-forced test session."""
    import jax

    if jax.default_backend() == "tpu":
        # A real-TPU session has already initialized the axon backend, so
        # the in-process CPU-mesh force can't take effect; the driver (and
        # the subprocess test below) run the dryrun in a fresh process.
        pytest.skip("backend already initialized to TPU")
    import __graft_entry__ as e

    e.dryrun_multichip(8)
