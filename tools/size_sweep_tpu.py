#!/usr/bin/env python
"""The reference's full size sweep on TPU (report/data.txt rows 1-4,
test/time.sh): classic pipeline at the five fixture sizes plus the 8K
synthetic, production path (fused kernels, exact edge rule, ghost mode).

Honest timing: distinct inputs per iteration + checksum readback (see
bench.py).  Prints one JSON line per size.

Usage: python tools/size_sweep_tpu.py [--disparities 64] [--iters 3]
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

# (W, H) — the reference's fixture ladder (test/imgs/{1..5}-*) + 8K
# (report/data.txt columns).
SIZES = [(240, 135), (480, 270), (960, 540), (1920, 1080),
         (3840, 2160), (7680, 4320)]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--sizes", type=str, default=None,
                   help="comma list like 1920x1080,3840x2160")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from stereomatching_tpu.config import BoundaryMode, StereoParams
    from stereomatching_tpu.models.classic import classic_forward_batched

    params = StereoParams(
        num_shifts=args.disparities, mode=BoundaryMode.GHOST, edge_rule="exact"
    )
    sizes = SIZES
    if args.sizes:
        sizes = [tuple(map(int, s.split("x"))) for s in args.sizes.split(",")]

    rng = np.random.default_rng(0)
    for w, h in sizes:
        # Batch scaled to keep the per-iteration footprint ~0.5 GB.
        batch = max(1, min(128, int(2 ** np.floor(np.log2(
            128 * 1024 * 1024 / max(w * h, 1))))))
        step = jax.jit(lambda a, b: sum(
            v.sum() for key, v in classic_forward_batched(
                a, b, params, use_pallas=True
            ).items() if key in ("score_best", "web-2", "output-0", "edges-1")
        ))
        n = args.iters + 1
        ins = [
            (jnp.asarray(rng.integers(0, 256, (batch, h, w))
                         .astype(np.float32) / 256.0),
             jnp.asarray(rng.integers(0, 256, (batch, h, w))
                         .astype(np.float32) / 256.0))
            for _ in range(n)
        ]
        jax.block_until_ready(ins)
        acc = int(jax.device_get(step(*ins[0])))
        t0 = time.perf_counter()
        for i in range(1, n):
            acc += int(jax.device_get(step(*ins[i])))
        t1 = time.perf_counter()
        ms = (t1 - t0) / args.iters / batch * 1e3
        print(json.dumps({
            "size": f"{w}x{h}", "batch": batch, "d": args.disparities,
            "ms_per_pair": round(ms, 3),
            "pairs_per_sec": round(1e3 / ms, 2),
            "checksum": acc,
        }), flush=True)
        del ins
    return 0


if __name__ == "__main__":
    sys.exit(main())
