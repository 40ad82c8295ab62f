"""Real multi-process (DCN-path) test: runs tools/multihost_demo.py, which
wires two separate python processes with jax.distributed via
parallel.mesh.multihost_init, spans the tile axis across them, and asserts
the gathered render is bit-identical to a single-process one.

This is the closest a single machine gets to a 2-host pod run (SURVEY.md
§2.4 "Multi-host runtime"); the demo script is also the runbook for real
pods.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_render_bit_identical():
    env = dict(os.environ)
    # the demo manages its own backend setup; drop this test harness's
    # virtual-device forcing so the parent reference render controls it
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_demo.py")],
        env=env, capture_output=True, text=True, timeout=400)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "MULTIHOST OK" in out.stdout
