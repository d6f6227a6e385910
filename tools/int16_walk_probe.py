#!/usr/bin/env python
"""Close the 'per-column load/store width' SGM lever (round-5 verdict
item 6): the int8-widen / int16-narrow converts are ~4 of ~15
ops/element on the directional walk.  Eliminating them means running
the recurrence NATIVELY in 16-bit integers — this probe asks Mosaic
directly whether that program exists on this toolchain by
AOT-compiling (chipless) a minimal int16-native step:

  * int16 sublane roll (pltpu.roll on an int16 [D, P] lattice),
  * int16 minimum + adds,
  * int16 tree-min over the sublane axis.

If any piece is rejected, the convert-free walk cannot lower and the
lever is CLOSED as impossible-on-this-toolchain (the bf16 lattice —
the other 16-bit route — already measured slower end-to-end,
docs/BENCHMARKS.md round 3).  Run with no other libtpu client active.

Usage: python tools/int16_walk_probe.py
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "compile_smoke",
        os.path.join(os.path.dirname(__file__), "compile_smoke.py"),
    )
    cs = importlib.util.module_from_spec(spec)
    sys.modules["compile_smoke"] = cs
    spec.loader.exec_module(cs)
    dev = cs.chipless_device()
    if dev is None:
        print("no chipless device (another libtpu client is active?)")
        return 2

    D, P = 64, 1024

    def piece_roll(ref, o):
        o[...] = pltpu.roll(ref[...], 1, 0)

    def piece_minadd(ref, o):
        x = ref[...]
        o[...] = jnp.minimum(x, x + jnp.int16(8))

    def piece_treemin(ref, o):
        x = ref[...]
        n = x.shape[0]
        while n > 8:
            n //= 2
            x = jnp.minimum(x[:n], x[n:])
        for sh in (4, 2, 1):
            x = jnp.minimum(x, pltpu.roll(x, sh, 0))
        o[...] = x[:1]

    def build(piece, out_rows):
        def run():
            return pl.pallas_call(
                piece,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((out_rows, P), jnp.int16),
                interpret=False,
            )(jnp.zeros((D, P), jnp.int16))
        return run

    failures = 0
    for name, piece, rows in (
        ("int16-sublane-roll", piece_roll, D),
        ("int16-min-add", piece_minadd, D),
        ("int16-tree-min", piece_treemin, 1),
    ):
        try:
            cs.aot_compile(build(piece, rows), dev)
            print(f"LOWERS  {name}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            msg = str(e).split("\n")[0][:200]
            print(f"REJECTED {name}: {msg}")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
