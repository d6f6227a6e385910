"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests emulate an
8-device mesh on CPU (the analogue of the reference testing its CUDA
programs against serial C on one box, test/diff.sh).  Must run before any
jax import.
"""

import os

# Force CPU: the session may pin JAX to the (single, slow-first-compile)
# real TPU — and its site hook sets the platform via jax.config, which
# overrides env vars, so we must override the same way.  Set
# STEREO_TEST_TPU=1 to test on real hardware instead (sharded tests will
# skip there — one chip).
_FORCE_CPU = not os.environ.get("STEREO_TEST_TPU")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# f64 available for exact-vs-C-double oracle comparisons.
os.environ.setdefault("JAX_ENABLE_X64", "1")
# Persistent compilation cache: the differential tests compile many small
# pipelines; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if _FORCE_CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
