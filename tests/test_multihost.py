"""Cross-process distributed boot smoke, wired into pytest (ROADMAP
item 10): runs tools/multihost_smoke.py — 2 OS processes x 2 CPU
devices, jax.distributed over a localhost coordinator, one sharded
pipeline step checked bit-exactly against the oracle per shard."""

import os
import socket
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "multihost_smoke.py")


@pytest.mark.multiprocess
def test_multihost_smoke():
    # A free port keeps parallel CI runs from colliding on the default.
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, TOOL, "--procs", "2", "--local-devices", "2",
         "--port", str(port)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "bit-identical to oracle" in proc.stdout
