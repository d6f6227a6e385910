#!/usr/bin/env python
"""SGM pipeline probe: times the Pallas SGM route end-to-end and its
aggregation alone on the current backend (honest methodology: distinct
inputs per iteration + checksum readback, as bench.py).

Usage: python tools/sgm_probe.py [--size 1024] [--disparities 64]
       [--batch 8] [--iters 3] [--stage full|agg|tail|all]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stage", default="all",
                   choices=["full", "agg", "tail", "all"])
    p.add_argument("--cost", default="census", choices=["census", "sad"])
    p.add_argument("--directions", type=int, default=4, choices=[4, 8])
    args = p.parse_args()

    from stereomatching_tpu.config import ModernParams
    from stereomatching_tpu.models.modern import (
        _sgm_forward_batched_pallas,
        _sgm_out_dtype,
        _sgm_scan_major_volumes,
        _sgm_storage_dtype,
        _sgm_tail_fused,
        _sgm_volume_auto,
    )
    from stereomatching_tpu.ops.fused_sgm import aggregate_from_scan_major

    params = ModernParams(
        num_disparities=args.disparities, aggregation="sgm", cost=args.cost,
        sgm_directions=args.directions,
    )
    B, H, W, D = args.batch, args.size, args.size, args.disparities
    rng = np.random.default_rng(0)
    ins = []
    for _ in range(args.iters + 1):
        l = jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.int32))
        r = jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.int32))
        ins.append((l, r))
    jax.block_until_ready(ins)

    def run(name, fn):
        f = jax.jit(fn)
        acc = float(jax.device_get(f(*ins[0])))
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            acc += float(jax.device_get(f(*ins[i])))
        t1 = time.perf_counter()
        print(f"{name}: {(t1 - t0) / args.iters / B * 1e3:.2f} ms/pair "
              f"(batch {B}, {H}x{W}x{D}d, {args.cost}) checksum={acc:.0f}",
              flush=True)

    sdt = _sgm_storage_dtype(params)
    print(f"storage dtype: {jnp.dtype(sdt).name}")

    def vol_fn(l, r):
        # The production volume route: v-major VMEM builder (vol_h's
        # transpose is timed inside the agg stage, as in production).
        return _sgm_scan_major_volumes(l, r, params, sdt)[0]

    def agg_fn(l, r):
        vol_v, vol_h = _sgm_scan_major_volumes(l, r, params, sdt)
        return aggregate_from_scan_major(
            vol_v, vol_h, l.shape[0], params.sgm_p1, params.sgm_p2,
            layout="dhw", directions=params.sgm_directions,
            out_dtype=_sgm_out_dtype(params), tail_padded=True,
        ).astype(jnp.float32).sum()

    def full_fn(l, r):
        out = _sgm_forward_batched_pallas(l, r, params)
        return sum(v.sum().astype(jnp.float32) for v in out.values())

    def tail_fn(l, r):
        # d-major volume + FUSED tail without aggregation: isolates the
        # argmin/LR/fill tail (sgm_tail_pallas + lr + fill_invalid_pallas)
        vol = _sgm_volume_auto(l, r, params, sdt)
        out = _sgm_tail_fused(vol, params)
        return sum(v.sum().astype(jnp.float32) for v in out.values())

    def volonly_fn(l, r):
        return vol_fn(l, r).sum()

    stages = {
        "vol": volonly_fn, "agg": agg_fn, "tail": tail_fn, "full": full_fn,
    }
    todo = ["vol", "agg", "tail", "full"] if args.stage == "all" else [args.stage]
    for name in todo:
        run(name, stages[name])


if __name__ == "__main__":
    main()
