#!/usr/bin/env python
"""Per-phase roofline at the large sizes (round-5 verdict item 7): the
size ladder shows vs-baseline falling 94x (1920x1080, batch 64) -> 84x
(3840x2160, batch 16) -> 47x (7680x4320, batch 4).  This driver runs
bench/roofline.measure at exactly those (size, batch) points so the
droop decomposes into phases — batch amortization vs HBM traffic vs
tile geometry.

Usage: python tools/droop_probe.py [--sizes 1920x1080:64,3840x2160:16,7680x4320:4]
Prints one JSON line per phase per size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1920x1080:64,3840x2160:16,7680x4320:4")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--disparities", type=int, default=64)
    args = p.parse_args()

    from stereomatching_tpu.bench.roofline import measure

    for spec in args.sizes.split(","):
        size, batch = spec.split(":")
        w, h = (int(v) for v in size.split("x"))
        rows = measure(h=h, w=w, d=args.disparities, batch=int(batch),
                       iters=args.iters)
        for r in rows:
            print(json.dumps({"size": size, "batch": int(batch), **r}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
