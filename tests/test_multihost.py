"""Multi-process collective smoke (spawns scripts/multihost_smoke.py).

The distributed-runtime test analog: real jax.distributed processes with
cross-process collectives, on one machine (SURVEY.md §4 config-matrix
mapping)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_multihost_smoke_two_processes():
    script = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "scripts", "multihost_smoke.py")
    r = subprocess.run([sys.executable, script, "2"], capture_output=True, timeout=570,
                       text=True)
    assert r.returncode == 0, r.stdout + r.stderr
