"""Multi-process mesh test (SURVEY §4(c)): the sharded odometry/TSDF
programs must survive a REAL process boundary (jax.distributed over two
OS processes — the DCN stand-in), not just a virtual single-process mesh.

The heavy lifting is scripts/multihost_sim.py (also runnable standalone);
this wrapper runs it as CI and checks cross-process agreement. The parent
process here never imports jax device state itself — workers get their own
interpreters, so the 8-virtual-device conftest setting doesn't leak in.
"""

import json
import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "multihost_sim.py")


@pytest.mark.slow
def test_two_process_mesh():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    proc = subprocess.run(
        [sys.executable, os.path.abspath(SCRIPT), "--procs", "2",
         "--local-devices", "4"],
        capture_output=True, text=True, timeout=580, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["ok"] and summary["global_devices"] == 8
    # cross-process agreement is asserted inside the script; here check the
    # registration/TSDF actually did real work over the 2-process mesh
    # (matches the single-process dryrun values, 509/230, at time of writing)
    assert summary["ncorr"] > 64
    assert summary["tsdf_blocks"] > 0
