# Top-level targets — the role of the reference's Makefile (build modes,
# graphs; Makefile:1-87) for a Python/JAX framework.
PY ?= python

.PHONY: all native test test-all test-tpu bench sweep graphs multihost golden clean

all: native

native:
	$(MAKE) -C native

# Fast correctness gate (~5 min on 4 CPUs): everything except the
# slow tier (Mosaic AOT legality, fuzz sweeps, probe surfaces).
test:
	$(PY) -m pytest tests/ -q -n 4 --dist loadgroup -m "not slow"

# Everything, including the Mosaic AOT kernel-legality gate (one
# hermetic subprocess over the whole inventory) and the fuzz sweeps
# (~10 min; run after touching ops/*.py kernels).
test-all:
	$(PY) -m pytest tests/ -q -n 4 --dist loadgroup

# Run the suite against the real TPU instead of the virtual CPU mesh.
test-tpu:
	STEREO_TEST_TPU=1 $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

sweep:
	$(PY) -m stereomatching_tpu.bench

graphs:
	$(PY) -m stereomatching_tpu.bench --graphs report

# Multi-process (multi-host emulation) correctness smoke.
multihost:
	python tools/multihost_smoke.py --procs 2 --local-devices 2

# Cross-repo golden diff against the compiled C reference (test/diff.sh).
golden:
	tools/diff_vs_reference.sh

clean:
	$(MAKE) -C native clean
	rm -rf report .pytest_cache
