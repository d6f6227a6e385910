#!/usr/bin/env python
"""Separate the serving batch-1 latency into tunnel dispatch vs on-chip
work (round-4 verdict weak item: "no on-chip latency datum exists to
separate framework overhead from tunnel").

No local chip exists, so the decomposition is differential:

  * trivial-op round trip  t_triv  — a 1-element add, compiled and
    warmed: measures the PURE dispatch+readback floor of the remote
    tunnel (its on-chip time is nanoseconds).
  * pipeline round trip    t_pipe  — the batch-1 classic step with
    checksum readback (the serving latency posture).

  on-chip + framework time ~= t_pipe - t_triv; the tunnel floor t_triv
  is environmental and disappears on a local chip.

Each timing is the MINIMUM over reps (latency, not throughput).

Usage: python tools/latency_floor_probe.py [--size 1024] [--reps 7]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _min_time(fn, inputs, reps):
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        fn(inputs[i % len(inputs)])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--reps", type=int, default=7)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from stereomatching_tpu.config import BoundaryMode, StereoParams
    from stereomatching_tpu.models.classic import classic_forward_batched

    # Trivial op: distinct scalars per rep so nothing is cached away.
    triv = jax.jit(lambda x: x + 1)
    scalars = [jnp.float32(i) for i in range(args.reps + 1)]
    jax.block_until_ready(scalars)
    float(triv(scalars[-1]))  # warm compile
    t_triv = _min_time(lambda x: float(triv(x)), scalars, args.reps)

    params = StereoParams(
        num_shifts=args.disparities, mode=BoundaryMode.GHOST,
        edge_rule="exact",
    )

    def step(lr):
        out = classic_forward_batched(lr[0], lr[1], params, use_pallas=True)
        return (out["web-2"].sum() + out["output-0"].sum()).astype(jnp.int32)

    step = jax.jit(step)
    rng = np.random.default_rng(0)
    h = w = args.size
    ins = [
        jnp.asarray(
            rng.integers(0, 256, (2, 1, h, w)).astype(np.float32) / 256.0
        )
        for _ in range(args.reps + 1)
    ]
    jax.block_until_ready(ins)
    int(jax.device_get(step(ins[-1])))  # warm compile
    t_pipe = _min_time(lambda x: int(jax.device_get(step(x))), ins, args.reps)

    print(json.dumps({
        "size": f"{h}x{w}", "disparities": args.disparities,
        "tunnel_floor_ms": round(t_triv * 1e3, 3),
        "batch1_total_ms": round(t_pipe * 1e3, 3),
        "on_chip_plus_framework_ms": round((t_pipe - t_triv) * 1e3, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
