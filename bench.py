"""Headline benchmark: stereo pairs/sec/chip at 1 MP, 64 disparities.

Prints the classic-pipeline headline as the FIRST JSON line on stdout
(the driver parses that one), then — by default — a second JSON line for
the modern SGM route, so the quality-stack path is regression-tracked in
the same BENCH artifact (the reference's time.sh measures every binary,
not just the fastest: test/time.sh:1-15).

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement discipline: the session's TPU is reached through a remote
tunnel whose async dispatch makes ``block_until_ready`` on repeated
identical dispatches unreliable (they can appear free).  So the timed
step (a) consumes a DIFFERENT input batch every iteration, (b) returns
only an int32 checksum (no large result buffers), and (c) is completed
by a host readback of that checksum each iteration — nothing can be
elided, deduplicated, or left in flight.

Baseline derivation (BASELINE.md): the reference's best configuration
(CUDA + ghost areas) runs a 1920x1080 pair in 0.2328 s (report/data.txt:4).
Rescaled to this benchmark's workload with the thesis's own pixel-pass
throughput model (test/make_graph.py:50-51: passes = 4*2 edge ops + D
matches + sw^2 box adds + 2D score/argmax + 1 winner + times diffusion +
3 finishing), i.e. from (2 073 600 px, D=30) to (1 048 576 px, D=64):

  t_base = 0.2328 * (1048576/2073600) * (677/575) = 0.13862 s
  baseline_fps = 7.214 pairs/s/GPU

Usage: python bench.py [--size 1024] [--disparities 64] [--batch 8]
                       [--iters 3] [--mode ghost] [--pallas]
                       [--pipeline classic|sgm] [--no-sgm-line]
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


def bench_pipeline(args, pipeline: str, batch: int) -> dict:
    """Build, run, and time one pipeline; returns the metric JSON dict.
    All device buffers are scoped here so the next bench starts with a
    clean HBM footprint."""
    import jax
    import jax.numpy as jnp

    from stereomatching_tpu.config import BoundaryMode, StereoParams
    from stereomatching_tpu.models.classic import classic_forward_batched

    params = StereoParams(
        num_shifts=args.disparities,
        mode=BoundaryMode(args.mode),
        edge_rule="exact",
    )
    h = w = args.size

    if pipeline == "sgm":
        from stereomatching_tpu.config import ModernParams
        from stereomatching_tpu.models.modern import modern_forward

        mparams = ModernParams(
            num_disparities=args.disparities, aggregation="sgm",
            cost="census", sgm_directions=args.sgm_directions,
        )

        def step(left, right):
            out = modern_forward(left, right, mparams,
                                 use_pallas=args.pallas)
            return sum(
                v.sum().astype(jnp.float32) for v in out.values()
            ).astype(jnp.int32)
    else:

        def step(left, right):
            out = classic_forward_batched(
                left, right, params, use_pallas=args.pallas,
                tile_rows=args.tile_rows,
            )
            # Small checksum only: forces full computation, avoids
            # shipping result planes through the device tunnel.
            return (
                out["web-2"].sum()
                + out["output-0"].sum()
                + out["score_best"].sum()
                + out["edges-1"].sum()
            )

    step = jax.jit(step, donate_argnums=(0, 1) if args.donate else ())

    # Distinct device-resident batches per timed iteration.
    rng = np.random.default_rng(0)
    n_batches = args.warmup + args.iters
    pix = rng.integers  # pixel batches; the SGM route takes int 0..255
    if pipeline == "sgm":
        def make():
            return jnp.asarray(
                pix(0, 256, (batch, h, w)).astype(np.int32))
    else:
        def make():
            return jnp.asarray(
                pix(0, 256, (batch, h, w)).astype(np.float32) / 256.0)
    lefts = [make() for _ in range(n_batches)]
    rights = [make() for _ in range(n_batches)]
    jax.block_until_ready((lefts, rights))

    acc = 0
    for i in range(args.warmup):
        acc += int(jax.device_get(step(lefts[i], rights[i])))

    t0 = time.perf_counter()
    for i in range(args.warmup, n_batches):
        acc += int(jax.device_get(step(lefts[i], rights[i])))
    t1 = time.perf_counter()

    pairs = batch * args.iters
    fps = pairs / (t1 - t0)

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
        f"pipeline={pipeline} device={dev.platform} n={len(jax.devices())} "
        f"size={h}x{w} D={args.disparities} batch={batch} "
        f"iters={args.iters} pallas={args.pallas} "
        f"time/pair={(t1 - t0) / pairs * 1e3:.2f}ms "
        f"checksum={acc} baseline={baseline_fps:.3f}fps",
        file=sys.stderr,
    )
    return {
        "metric": (
            f"stereo_pairs_per_sec_per_chip_{h}x{w}_"
            f"{args.disparities}d"
            + ("_sgm" if pipeline == "sgm" else "")
            + ("_8dir" if pipeline == "sgm"
               and args.sgm_directions == 8 else "")
        ),
        "value": round(fps, 4),
        "unit": "pairs/s",
        "vs_baseline": round(fps / baseline_fps, 4),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--batch", type=int, default=None,
                   help="default 256 for classic (the headline sweet "
                        "spot; 384+ exhausts HBM with the bench's 4 "
                        "resident input sets) and 32 for sgm (its int8 "
                        "HBM ceiling; 36 OOMs)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--mode", choices=["wrap", "ghost"], default="ghost")
    p.add_argument("--sgm-directions", type=int, default=4, choices=[4, 8],
                   help="sgm pipeline: aggregation path count")
    p.add_argument("--pipeline", choices=["classic", "sgm"], default="classic",
                   help="sgm benches the modern pipeline's Semi-Global "
                        "Matching route (census cost; --batch 16-28 is "
                        "its HBM-bound sweet spot at 1 MP x 64 d)")
    p.add_argument("--sgm-line", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="with --pipeline classic: also run the SGM route "
                        "and print its metric as a SECOND JSON line "
                        "(--no-sgm-line to skip; the driver parses the "
                        "first line either way)")
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=True,
                   help="route the hot phases through the Pallas kernels "
                        "(--no-pallas for the pure-XLA tier)")
    p.add_argument("--tile-rows", type=int, default=None,
                   help="override the kernel's batch-aware auto row tiling "
                        "(ops/fused._auto_tile_rows)")
    p.add_argument("--donate", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="donate the input batch buffers to the step "
                        "(jit donate_argnums) — each timed batch is "
                        "consumed exactly once, so aliasing is safe; "
                        "frees 2 input-batch buffers from peak HBM at "
                        "large batch and is the latency-mode default "
                        "posture (docs/BENCHMARKS.md latency table)")
    p.add_argument("--roofline", action="store_true",
                   help="additionally print one roofline JSON line per "
                        "phase (bytes/FLOPs/achieved BW/MXU+VPU "
                        "utilization vs speed-of-light) to stderr; "
                        "stdout stays the single headline line")
    args = p.parse_args()

    import os

    # Persistent compile cache: compiles through the remote TPU tunnel
    # take minutes; cache them across bench invocations.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    def default_batch(pipeline: str) -> int:
        if args.batch is not None:
            return args.batch
        return 32 if pipeline == "sgm" else 256

    lines = [bench_pipeline(args, args.pipeline, default_batch(args.pipeline))]
    if args.pipeline == "classic" and args.sgm_line:
        lines.append(bench_pipeline(args, "sgm", default_batch("sgm")))

    if args.roofline:
        h = w = args.size
        primary_batch = default_batch(args.pipeline)
        if args.pipeline == "sgm":
            from stereomatching_tpu.bench.roofline import measure_sgm

            rows = measure_sgm(h=h, w=w, d=args.disparities,
                               batch=primary_batch, iters=args.iters,
                               directions=args.sgm_directions)
        else:
            from stereomatching_tpu.bench.roofline import measure

            rows = measure(h=h, w=w, d=args.disparities,
                           batch=primary_batch,
                           iters=args.iters, tile_rows=args.tile_rows)
        for row in rows:
            print(json.dumps(row), file=sys.stderr)

    for line in lines:
        print(json.dumps(line))


if __name__ == "__main__":
    sys.exit(main())
