#!/usr/bin/env python
"""Per-component timing of the SGM argmin/LR tail on a pre-built
random [B, D, H, W] volume (isolates tail ops from the volume build).

Usage: python tools/sgm_tail_probe.py [components...]
Components: argmin rdisp lr fill all  (default: every component)
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

from stereomatching_tpu.config import ModernParams
from stereomatching_tpu.ops.costvolume import fill_invalid, lr_consistency
from stereomatching_tpu.ops.sgm import (
    right_disparity_from_left_volume,
    volume_argmin_subpixel,
)

B, H, W, D = 8, 1024, 1024, 64
params = ModernParams(num_disparities=D, aggregation="sgm")
rng = np.random.default_rng(0)
ITERS = 3
vols = [
    jnp.asarray(rng.integers(0, 2000, (B, D, H, W)).astype(np.int32))
    for _ in range(ITERS + 1)
]
jax.block_until_ready(vols)


def run(name, fn):
    f = jax.jit(fn)
    acc = float(jax.device_get(f(vols[0])))
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        acc += float(jax.device_get(f(vols[i])))
    t1 = time.perf_counter()
    print(f"{name}: {(t1 - t0) / ITERS / B * 1e3:.2f} ms/pair "
          f"checksum={acc:.0f}", flush=True)


def argmin_fn(v):
    out = jax.vmap(
        lambda a: volume_argmin_subpixel(a, layout="dhw", unroll=True)
    )(v)
    return sum(x.sum().astype(jnp.float32) for x in out)


def rdisp_fn(v):
    out = jax.vmap(
        lambda a: right_disparity_from_left_volume(
            a, layout="dhw", unroll=True)
    )(v)
    return out.sum().astype(jnp.float32)


def lrfill_fn(v):
    def one(a):
        disp, sub, _ = volume_argmin_subpixel(a, layout="dhw", unroll=True)
        dr = right_disparity_from_left_volume(a, layout="dhw", unroll=True)
        valid = lr_consistency(disp, dr, params.lr_max_diff, D)
        return fill_invalid(sub, valid, params.fill_iterations, unroll=True)

    return jax.vmap(one)(v).sum().astype(jnp.float32)


def fill_fn(v):
    # fill_invalid alone on a synthetic validity mask
    sub = v[:, 0].astype(jnp.float32)
    valid = (v[:, 1] & 1) == 0

    def one(s, m):
        return fill_invalid(s, m, params.fill_iterations, unroll=True)

    return jax.vmap(one)(sub, valid).sum().astype(jnp.float32)


COMPS = {"argmin": argmin_fn, "rdisp": rdisp_fn, "fill": fill_fn,
         "all": lrfill_fn}
todo = sys.argv[1:] or ["argmin", "rdisp", "fill", "all"]
for name in todo:
    run(name, COMPS[name])
