#!/usr/bin/env python
"""VPU issue-rate micro-probe — measures the vector-op retire rate the
roofline's instruction-census bound prices, instead of estimating it
from kernel ablations (round-3 verdict item: bench/roofline.Peaks.
vpu_single_issue_teraops was inferred from one SGM op-count ablation).

A Pallas kernel holds a [rows, 512] int32 value in registers and runs
``iters`` loop trips of ``unroll`` vector ops with no memory traffic in
the loop body; the op count is exact.  Each body is timed at ``iters``
AND ``4 * iters`` and the rate taken from the SLOPE — the ~20 ms fixed
tunnel dispatch and any per-call overhead cancel exactly (the same
reason bench.py cannot trust single-call timings).  Three bodies:

  * dep-add   — a single dependent add chain (pure op LATENCY);
  * ilp4-add  — four independent chains interleaved (ISSUE rate with
                ILP exposed — the ceiling the census bound should use);
  * sgm-mix   — a dependent min/add/roll mix shaped like one SGM
                recurrence step (what the walk actually retires).

Usage: python tools/vpu_probe.py [--rows 256] [--iters 2048]
       [--unroll 16] [--reps 3]
Prints one JSON line per body: element-ops/s, vreg-ops/cycle @940 MHz.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=256)
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--iters", type=int, default=2048)
    p.add_argument("--unroll", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--clock-ghz", type=float, default=0.94)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = args.rows, args.lanes
    interpret = jax.default_backend() not in ("tpu", "axon")

    def make_kernel(body_ops, n_chains, iters):
        def kernel(x_ref, out_ref):
            chains = [
                x_ref[...] + jnp.int32(i) for i in range(n_chains)
            ]

            def trip(_, carry):
                return body_ops(carry)

            chains = jax.lax.fori_loop(0, iters, trip, tuple(chains))
            acc = chains[0]
            for c in chains[1:]:
                acc = acc + c
            out_ref[...] = acc

        return kernel

    def dep_add(carry):
        (v,) = carry
        for i in range(args.unroll):
            v = v + jnp.int32(1 + (i & 3))
        return (v,)

    def ilp4_add(carry):
        a, b, c, d = carry
        for i in range(args.unroll // 4):
            k = jnp.int32(1 + (i & 3))
            a, b, c, d = a + k, b + k, c + k, d + k
        return (a, b, c, d)

    def sgm_mix(carry):
        # One SGM-step-shaped trip: sublane roll, two mins, two adds —
        # 5 ops per unrolled rep (args.unroll rounded down to reps).
        (v,) = carry
        for _ in range(max(args.unroll // 5, 1)):
            r = pltpu.roll(v, 1, 0)
            v = jnp.minimum(v, r + jnp.int32(8))
            v = jnp.minimum(v, jnp.int32(96)) + v
        return (v,)

    bodies = {
        "dep-add": (dep_add, 1, args.unroll),
        "ilp4-add": (ilp4_add, 4, (args.unroll // 4) * 4),
        "sgm-mix": (sgm_mix, 1, max(args.unroll // 5, 1) * 5),
    }

    def make_mem_kernel(iters):
        # sgm-mix with the walk kernel's per-column VMEM traffic: an
        # int8 load + widen before the mix, a narrow + int16 store
        # after — measures the IN-KERNEL retire rate (memory-access
        # issue slots included), the rate the roofline's census bound
        # should price.  Counted ops stay the 5 mix ops, so the
        # printed rate absorbs the load/store slots exactly as the
        # real kernel's step does.
        reps = max(args.unroll // 5, 1)

        def kernel(x_ref, out_ref, c8, o16):
            c8[...] = x_ref[...].astype(jnp.int8)
            o16[...] = x_ref[...].astype(jnp.int16)
            v0 = x_ref[...]

            def trip(_, carry):
                # The int8 load feeds the mix and the result is
                # narrowed back to the int16 scratch THAT THE NEXT
                # TRIP READS — a store->load dependency per trip, so
                # neither access hoists/sinks out of the loop (the
                # walk kernel's per-column c load + L store shape).
                (v,) = carry
                c = c8[...].astype(jnp.int32)
                prev = o16[...].astype(jnp.int32)
                for _i in range(reps):
                    r = pltpu.roll(v, 1, 0)
                    v = jnp.minimum(v, r + jnp.int32(8))
                    v = jnp.minimum(v, jnp.int32(96)) + c
                v = v + (prev & 1)
                o16[...] = v.astype(jnp.int16)
                return (v,)

            (v,) = jax.lax.fori_loop(0, iters, trip, (v0,))
            out_ref[...] = v + o16[...].astype(jnp.int32)

        return kernel, reps * 5

    rng = np.random.default_rng(0)
    ins = [
        jnp.asarray(rng.integers(0, 64, (rows, lanes)).astype(np.int32))
        for _ in range(args.reps + 1)
    ]
    jax.block_until_ready(ins)

    def timed(body, n_chains, iters):
        fn = pl.pallas_call(
            make_kernel(body, n_chains, iters),
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            interpret=interpret,
        )
        jfn = jax.jit(lambda x, fn=fn: fn(x).sum())
        acc = int(jax.device_get(jfn(ins[0])))  # compile + warm
        t0 = time.perf_counter()
        for i in range(1, args.reps + 1):
            acc += int(jax.device_get(jfn(ins[i])))
        return (time.perf_counter() - t0) / args.reps, acc

    def timed_mem(iters):
        kernel, _ = make_mem_kernel(iters)
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((rows, lanes), jnp.int8),
                pltpu.VMEM((rows, lanes), jnp.int16),
            ],
            interpret=interpret,
        )
        jfn = jax.jit(lambda x, fn=fn: fn(x).sum())
        acc = int(jax.device_get(jfn(ins[0])))
        t0 = time.perf_counter()
        for i in range(1, args.reps + 1):
            acc += int(jax.device_get(jfn(ins[i])))
        return (time.perf_counter() - t0) / args.reps, acc

    for name, (body, n_chains, ops_per_trip) in bodies.items():
        t1, a1 = timed(body, n_chains, args.iters)
        t4, a4 = timed(body, n_chains, 4 * args.iters)
        dt = max(t4 - t1, 1e-9)  # slope: dispatch overhead cancels
        # The roll in sgm-mix is one op; elementwise ops count 1 each.
        total_elem_ops = float(rows * lanes) * 3 * args.iters * ops_per_trip
        eops = total_elem_ops / dt
        vregs_per_cycle = (
            total_elem_ops / (8 * 128)
        ) / (dt * args.clock_ghz * 1e9)
        print(json.dumps({
            "body": name,
            "elem_ops_per_s": round(eops / 1e12, 4),
            "unit": "Tera-elementops/s",
            "vreg_ops_per_cycle": round(vregs_per_cycle, 3),
            "ms_slope": round(dt * 1e3, 3),
            "checksum": a1 + a4,
        }), flush=True)

    _, ops_per_trip = make_mem_kernel(1)
    t1, a1 = timed_mem(args.iters)
    t4, a4 = timed_mem(4 * args.iters)
    dt = max(t4 - t1, 1e-9)
    total_elem_ops = float(rows * lanes) * 3 * args.iters * ops_per_trip
    print(json.dumps({
        "body": "sgm-mem",
        "elem_ops_per_s": round(total_elem_ops / dt / 1e12, 4),
        "unit": "Tera-elementops/s (counted mix ops only; load/store "
                "slots absorbed)",
        "vreg_ops_per_cycle": round(
            (total_elem_ops / (8 * 128)) / (dt * args.clock_ghz * 1e9), 3),
        "ms_slope": round(dt * 1e3, 3),
        "checksum": a1 + a4,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
