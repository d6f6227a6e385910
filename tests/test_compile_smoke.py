"""Mosaic lowering smoke as a pytest surface (docs/ROADMAP.md
robustness item): interpret mode accepts programs the Mosaic compiler
rejects (int16 min/reductions, sub-32-bit rotates, unprovable DMA
alignment), so every production kernel variant must also LOWER on a
real TPU backend.  Auto-skips off-TPU — the CPU CI tier cannot lower
Mosaic; run `pytest -m tpu_lowering` (or tools/compile_smoke.py
directly) on a TPU host after touching any kernel."""

import importlib.util
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools",
                     "compile_smoke.py")


@pytest.mark.tpu_lowering
def test_all_kernels_lower_on_tpu(monkeypatch):
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("Mosaic lowering needs a TPU backend")
    spec = importlib.util.spec_from_file_location("compile_smoke", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["compile_smoke"])
    assert mod.main() == 0  # exit status == number of failed lowerings
