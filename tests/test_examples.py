"""CI smoke runs for every demo in examples/.

The reference's own testbenches rotted after a refactor because nothing
executed them (sim/tb_dxyz_soft.vhd:386-387 binds ports that no longer
exist on the entity). These tests run each example end-to-end at tiny
sizes on CPU so the demos cannot silently drift from the package API.
(reference_envelope.py is covered in test_cli.py; multihost_cpu.py in
test_parallel.py.)
"""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"


def _run(script, *args, timeout=420):
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / script), "--cpu", *args],
        capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


def test_cold_collapse_quick():
    out = _run("cold_collapse.py", "--n", "128", "--steps", "20",
               "--interval", "10")
    assert '"drift"' in out and '"virial"' in out


def test_infer_masses_quick():
    pytest.importorskip("optax")
    # 120 Adam iters at n=16 converge well past the script's own 5% gate
    out = _run("infer_masses.py", "--n", "16", "--steps", "10",
               "--iters", "120")
    assert out.strip().endswith("OK")


def test_optimize_impact_quick():
    pytest.importorskip("optax")
    out = _run("optimize_impact.py", "--n", "48", "--steps", "10",
               "--iters", "25")
    assert '"miss_distance"' in out


def test_parameter_sweep_quick():
    # steps=200 kept (free-fall time needs t~0.4 for the contraction /
    # expansion trend the script itself asserts); n and B shrunk.
    out = _run("parameter_sweep.py", "--b", "4", "--n", "64",
               "--steps", "200")
    assert '"sweep_trend": "ok"' in out
