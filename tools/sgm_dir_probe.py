#!/usr/bin/env python
"""Ablation probe of the SGM directional kernel's per-column cost:
times sgm_directional_pallas on a prebuilt scan-major strip with parts
of the step math disabled (WRONG results — perf isolation only).

Usage: python tools/sgm_dir_probe.py [variants...]
Variants: full notree norolls nomask bare opt int32 opt32; append
"@N" (e.g. full@512) to force the chunk-major walk with N-lane chunks
("@0" forces full-plane).  Note chunk_lanes=None now auto-selects
chunk-major, so bare variant names measure the production default.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import stereomatching_tpu.ops.fused_sgm as fs

B, H, W, D = 8, 1024, 1024, 64
S, P = W, B * H
ITERS = 3
rng = np.random.default_rng(0)
vols16 = [
    jnp.asarray(rng.integers(0, 120, (S, D, P)).astype(np.int16))
    for _ in range(ITERS + 1)
]
jax.block_until_ready(vols16)

orig_step = fs._step_math
orig_tree = fs._min_over_d


def step_notree(prev, c, p1, p2, big):
    m = prev
    di = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    d = prev.shape[0]
    from jax.experimental.pallas import tpu as pltpu
    up = jnp.where(di == d - 1, big, pltpu.roll(prev, d - 1, 0))
    dn = jnp.where(di == 0, big, pltpu.roll(prev, 1, 0))
    best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1), m + p2)
    return c + best - m


def step_norolls(prev, c, p1, p2, big):
    m = orig_tree(prev)
    best = jnp.minimum(jnp.minimum(prev, prev + p1), m + p2)
    return c + best - m


def step_nomask(prev, c, p1, p2, big):
    from jax.experimental.pallas import tpu as pltpu
    d = prev.shape[0]
    m = orig_tree(prev)
    up = pltpu.roll(prev, d - 1, 0)
    dn = pltpu.roll(prev, 1, 0)
    best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1), m + p2)
    return c + best - m


def step_bare(prev, c, p1, p2, big):
    return c + jnp.minimum(prev, p2)


def step_opt(prev, c, p1, p2, big):
    """Combined boundary select (one where for both sentinel rows; the
    wrapped values participate in the min but are then overridden) +
    min(t - m, p2) restructure (p2 becomes a scalar operand)."""
    from jax.experimental.pallas import tpu as pltpu
    d = prev.shape[0]
    m = orig_tree(prev)
    di = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    nb = jnp.minimum(pltpu.roll(prev, d - 1, 0), pltpu.roll(prev, 1, 0))
    nb = jnp.where((di == 0) | (di == d - 1), big, nb)
    t = jnp.minimum(prev, nb + p1)
    return c + jnp.minimum(t - m, p2)


VARIANTS = {
    "full": orig_step,
    "notree": step_notree,
    "norolls": step_norolls,
    "nomask": step_nomask,
    "bare": step_bare,
    "opt": step_opt,
}

todo = sys.argv[1:] or ["full", "notree", "norolls", "nomask", "bare",
                        "int32"]
for label in todo:
    ins = vols16
    ck = None  # None = the production auto-chunking default
    name = label
    if "@" in label:  # e.g. full@128, opt32@256: chunk-major lanes
        name, ck = label.split("@")
        ck = int(ck)
    if name in ("int32", "opt32"):
        fs._step_math = orig_step if name == "int32" else step_opt
        ins = [v.astype(jnp.int32) for v in vols16]
        jax.block_until_ready(ins)
    else:
        fs._step_math = VARIANTS[name]
    # Checksum only one strip: pallas_call is opaque (no partial
    # elision), and a full-volume int16 reduction would dominate the
    # measurement.
    fn = jax.jit(lambda v: fs.sgm_directional_pallas(
        v, 8, 96, chunk_lanes=ck)[0].sum(dtype=jnp.int32))
    acc = int(jax.device_get(fn(ins[0])))
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        acc += int(jax.device_get(fn(ins[i])))
    t1 = time.perf_counter()
    us_col = (t1 - t0) / ITERS / S * 1e6
    print(f"{label}: {(t1 - t0) / ITERS / B * 1e3:.2f} ms/pair "
          f"({us_col:.1f} us/column for {B} pairs) checksum={acc}",
          flush=True)
fs._step_math = orig_step
