"""Smoke the examples/ scripts end-to-end on the CPU mesh — they are
user-facing surface (the reference analogue: its four binaries run on
the bundled fixtures) and should never rot."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run(script, *args, env_extra=None, timeout=600):
    env = dict(os.environ)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


def test_classic_demo(tmp_path):
    r = _run("classic_demo.py", "--outdir", str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(p.suffix == ".ppm" for p in tmp_path.iterdir())


def test_modern_demo(tmp_path):
    r = _run("modern_demo.py", "--disparities", "8", "--outdir",
             str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]


def test_serving_demo():
    r = _run("serving_demo.py", "--size", "128", "--batch", "4",
             env_extra={"SERVING_DEMO_EMULATE": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "pad-and-slice" in r.stdout
