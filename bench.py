"""Headline benchmark: stereo pairs/sec/chip at 1 MP, 64 disparities.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation (BASELINE.md): the reference's best configuration
(CUDA + ghost areas) runs a 1920x1080 pair in 0.2328 s (report/data.txt:4).
Rescaled to this benchmark's workload with the thesis's own pixel-pass
throughput model (test/make_graph.py:50-51: passes = 4*2 edge ops + D
matches + sw^2 box adds + 2D score/argmax + 1 winner + times diffusion +
3 finishing), i.e. from (2 073 600 px, D=30) to (1 048 576 px, D=64):

  t_base = 0.2328 * (1048576/2073600) * (677/575) = 0.13862 s
  baseline_fps = 7.214 pairs/s/GPU

Usage: python bench.py [--size 1024] [--disparities 64] [--batch 4]
                       [--iters 5] [--mode ghost]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def pixel_passes(d: int, sw: int, times: int) -> int:
    """The reference's per-pixel workload model (test/make_graph.py:51)."""
    return 4 * 2 + d + sw * sw + 2 * d + 1 + times + 3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--mode", choices=["wrap", "ghost"], default="ghost")
    args = p.parse_args()

    import jax

    from stereomatching_tpu.config import BoundaryMode, StereoParams
    from stereomatching_tpu.models.classic import build_classic_pipeline

    params = StereoParams(
        num_shifts=args.disparities,
        mode=BoundaryMode(args.mode),
        edge_rule="exact",
    )
    h = w = args.size
    rng = np.random.default_rng(0)
    left = jax.numpy.asarray(
        rng.integers(0, 256, size=(args.batch, h, w)).astype(np.float32) / 256.0
    )
    right = jax.numpy.asarray(
        rng.integers(0, 256, size=(args.batch, h, w)).astype(np.float32) / 256.0
    )

    fn = build_classic_pipeline(params, batched=True)
    for _ in range(args.warmup):
        jax.block_until_ready(fn(left, right))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(left, right)
    jax.block_until_ready(out)
    t1 = time.perf_counter()

    pairs = args.batch * args.iters
    fps = pairs / (t1 - t0)

    # Baseline: CUDA+ghost 1920x1080 @ D=30, sw=21, times=32 -> 0.2328 s
    # (report/data.txt:4), rescaled via the pixel-pass model.
    base_t = (
        0.2328
        * ((h * w) / (1920 * 1080))
        * (
            pixel_passes(args.disparities, params.square_width, params.times)
            / pixel_passes(30, 21, 32)
        )
    )
    baseline_fps = 1.0 / base_t

    dev = jax.devices()[0]
    print(
        f"device={dev.platform} n={len(jax.devices())} size={h}x{w} "
        f"D={args.disparities} batch={args.batch} iters={args.iters} "
        f"time/pair={1.0/fps*1e3:.2f}ms baseline={baseline_fps:.3f}fps",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"stereo_pairs_per_sec_per_chip_{h}x{w}_{args.disparities}d",
                "value": round(fps, 4),
                "unit": "pairs/s",
                "vs_baseline": round(fps / baseline_fps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
