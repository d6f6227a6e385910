#!/usr/bin/env python
"""Standalone kernel-variant probe: times _invoke_kernel per row_mode
on the current backend (honest: distinct inputs + checksum readback).
Usage: python tools/kernel_probe.py [modes...]"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from stereomatching_tpu.config import BoundaryMode, StereoParams
from stereomatching_tpu.ops.fused import _auto_tile_rows, _invoke_kernel, _prepare, _round_up

BATCH, H, W, D = 128, 1024, 1024, 64
params = StereoParams(num_shifts=D, mode=BoundaryMode.GHOST, edge_rule="exact")
tr = _auto_tile_rows(W, params.half, D, batch=BATCH)
pad_half = _round_up(params.half, 4)
rng = np.random.default_rng(0)
ITERS = 3
ins = []
for _ in range(ITERS + 1):
    el = jnp.asarray(rng.integers(0, 2, (BATCH, H, W)).astype(np.int32))
    er = jnp.asarray(rng.integers(0, 2, (BATCH, H, W)).astype(np.int32))
    ins.append(_prepare(el, er, params, tr, pad_half)[:2])
jax.block_until_ready(ins)
modes = sys.argv[1:] or ["matmul", "chunked", "tree"]
for mode in modes:
    # ":u2" suffix selects the two-shifts-per-iteration loop; an inner
    # ":int8"/":bf16" suffix pins the matmul band dtype (e.g.
    # "chunked:bf16:u2" — see ops/fused._match_loop).
    rm = mode
    unroll = 1
    if rm.endswith(":u2"):
        rm, unroll = rm[:-3], 2
    fn = jax.jit(lambda lp, rp, m=rm, u=unroll: sum(
        x.sum() for x in _invoke_kernel(lp, rp, W, params, tr, pad_half,
                                        False, m, None, u)))
    acc = int(jax.device_get(fn(*ins[0])))
    t0 = time.perf_counter()
    for i in range(1, ITERS + 1):
        acc += int(jax.device_get(fn(*ins[i])))
    t1 = time.perf_counter()
    print(f"{mode}: {(t1-t0)/ITERS/BATCH*1e3:.3f} ms/pair tile={tr} checksum={acc}", flush=True)
