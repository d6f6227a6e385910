"""Probe: does an in-kernel 2-D transpose legalize on this backend, and
at what speed?

Motivation (docs/ROADMAP.md, SGM glue): the 4-direction merge
``agg = T(lr) + T(tb)`` plus the tail's read of ``agg`` costs two full
HBM volume passes that a two-input tail kernel could avoid — but only
if the horizontal sum's [W, hc] -> [hc, W] relayout can run inside the
kernel.  This probe times a kernel that transposes [S, P] int16/int32
tiles block-by-block against the XLA transpose of the same array, and
verifies bits in interpret mode first.

Usage: python tools/transpose_probe.py [--rows 1024] [--cols 4096]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1024)
    p.add_argument("--cols", type=int, default=4096)
    p.add_argument("--block", type=int, default=512, help="column block")
    p.add_argument("--dtype", default="int16")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() not in ("tpu", "axon")
    dt = jnp.dtype(args.dtype)
    r, c, blk = args.rows, args.cols, args.block

    b = args.batch

    def kernel(x_ref, o_ref):
        o_ref[0] = jnp.swapaxes(x_ref[0], 0, 1)

    def tp(x):
        return pl.pallas_call(
            kernel,
            grid=(b, c // blk),
            in_specs=[pl.BlockSpec((1, r, blk), lambda bi, i: (bi, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, blk, r), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, r), dt),
            interpret=interpret,
        )(x)

    def xla_tp(x):
        return jnp.transpose(x, (0, 2, 1))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1000, (b, r, c)).astype(dt))
    # Equality judged on-device (the remote tunnel chokes on >100 MB
    # device->host transfers, the same reason bench.py ships checksums).
    same = bool(jax.device_get(
        jax.jit(lambda v: (tp(v) == xla_tp(v)).all())(x)))
    assert same, "transpose kernel is WRONG"
    print(f"bit-exact ok ({b}x{r}x{c} {dt}, block {blk}, "
          f"interpret={interpret})")

    # The actual architectural A/B (elision-proof: a transpose feeding
    # an opaque pallas_call cannot be folded away, checksum readback,
    # REPS reps per dispatch so the ~20 ms tunnel dispatch amortizes):
    #   A (status quo): XLA transpose pass, then a pallas consumer
    #     reading the transposed buffer — the extra HBM round trip.
    #   B (candidate): ONE pallas consumer that transposes in-kernel.
    # A - B prices moving the relayout into the kernel.
    reps = 8

    def copy_kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0]

    def cp(y):
        return pl.pallas_call(
            copy_kernel,
            grid=(b, c // blk),
            in_specs=[pl.BlockSpec((1, blk, r), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, blk, r), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, r), dt),
            interpret=interpret,
        )(y)

    def mk(fn):
        def step(x):
            def body(i, acc):
                y = fn(x + i.astype(dt))
                return acc + y.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))
        return jax.jit(step)

    rows = (
        ("A xlaT+pallas copy", mk(lambda v: cp(xla_tp(v)))),
        ("B pallas in-kernel T", mk(tp)),
        # C feeds cp's (b, c, r) layout with an untransposed broadcast
        # of the right shape.  NOTE: the broadcast feeding an opaque
        # pallas_call materializes a full (b, c, r) buffer, so C pays
        # the same extra HBM pass as A — it is "A minus the transpose
        # arithmetic", NOT the copy-only traffic floor.
        ("C A-minus-transpose-arith (same extra HBM pass as A)",
         mk(lambda v: cp(jnp.broadcast_to(v[:, :1, :1], (b, c, r))))),
    )
    for name, step in rows:
        int(jax.device_get(step(x)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            int(jax.device_get(step(x)))
        dt_s = (time.perf_counter() - t0) / (args.iters * reps)
        gb = 2 * x.nbytes / 1e9
        print(f"{name}: {dt_s * 1e3:.3f} ms/rep  ({gb / dt_s:.0f} GB/s)")


if __name__ == "__main__":
    main()
