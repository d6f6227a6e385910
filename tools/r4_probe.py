#!/usr/bin/env python
"""Round-4 SGM experiment probe — times isolated builder / walk / merge
variants on the current backend with the honest methodology (distinct
inputs per iteration + checksum readback; the ~20 ms tunnel dispatch is
constant across variants so RELATIVE numbers are trustworthy, and
winners get confirmed through bench.py end-to-end).

Usage: python tools/r4_probe.py --exp builders|walk|agg|all
       [--size 1024] [--disparities 64] [--batch 16] [--iters 3]
"""
import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, inputs, iters, batch):
    f = jax.jit(fn)
    sums = [float(jax.device_get(f(*inputs[0])))]
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        sums.append(float(jax.device_get(f(*inputs[i]))))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3 / batch:8.3f} ms/pair  checksum={sums[1]:.0f}",
          flush=True)
    return dt / batch, sums[1]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--exp", default="all")
    args = p.parse_args()

    from stereomatching_tpu.config import ModernParams
    from stereomatching_tpu.models.modern import (
        _maybe_census,
        _sgm_out_dtype,
        _sgm_scan_major_volumes,
        _sgm_storage_dtype,
        _sgm_volume_auto,
    )
    from stereomatching_tpu.ops.fused_sgm import (
        aggregate_from_scan_major,
        sgm_directional_pallas,
        sgm_volume_pallas,
        sgm_volume_vmajor_pallas,
        tail_lane_pad,
        _round_up,
    )

    B, H, W, D = args.batch, args.size, args.size, args.disparities
    params = ModernParams(num_disparities=D, aggregation="sgm",
                          cost="census")
    st = _sgm_storage_dtype(params)
    odt = _sgm_out_dtype(params)
    rng = np.random.default_rng(0)
    n = args.iters + 1
    ins = [
        (jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.int32)),
         jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.int32)))
        for _ in range(n)
    ]
    jax.block_until_ready(ins)
    tf = jax.vmap(lambda x: _maybe_census(x, params))

    if args.exp in ("builders", "all"):
        # Builder variants -> checksum over the v-major volume.
        def b_vmajor(l, r):
            v = sgm_volume_vmajor_pallas(tf(l), tf(r), D, cost="census",
                                         dtype=st)
            return v.astype(jnp.float32).sum()

        def b_dmajor_t(l, r):
            v = sgm_volume_pallas(tf(l), tf(r), D, cost="census", dtype=st)
            vv = jnp.transpose(v, (2, 1, 0, 3)).reshape(H, D, B * W)
            return vv.astype(jnp.float32).sum()

        def b_xla(l, r):
            v = _sgm_volume_auto(l, r, params, st)  # [B, D, H, W]
            vv = jnp.transpose(v, (2, 1, 0, 3)).reshape(H, D, B * W)
            return vv.astype(jnp.float32).sum()

        timeit("builder vmajor (prod)", b_vmajor, ins, args.iters, B)
        timeit("builder dmajor+T", b_dmajor_t, ins, args.iters, B)
        timeit("builder xla+T", b_xla, ins, args.iters, B)

    if args.exp in ("volroute", "all"):
        # Complete (vol_v, vol_h) stage: production (vmajor kernel +
        # one transpose) vs d-major kernel + two transposes, and
        # vmajor row_strip variants.
        def r_prod(l, r):
            vv, vh = _sgm_scan_major_volumes(l, r, params, st)
            return (vv.astype(jnp.float32).sum()
                    + vh.astype(jnp.float32).sum())

        def r_dmajor2t(l, r):
            v = sgm_volume_pallas(tf(l), tf(r), D, cost="census", dtype=st)
            vv = jnp.transpose(v, (2, 1, 0, 3)).reshape(H, D, B * W)
            vh = jnp.transpose(v, (3, 1, 0, 2)).reshape(W, D, B * H)
            return (vv.astype(jnp.float32).sum()
                    + vh.astype(jnp.float32).sum())

        def r_vmajor_strip(strip):
            def f(l, r):
                vv = sgm_volume_vmajor_pallas(
                    tf(l), tf(r), D, cost="census", dtype=st,
                    row_strip=strip)
                vh = jnp.transpose(
                    vv.reshape(H, D, B, W), (3, 1, 2, 0)
                ).reshape(W, D, B * H)
                return (vv.astype(jnp.float32).sum()
                        + vh.astype(jnp.float32).sum())
            return f

        timeit("volroute prod (vmajor+T)", r_prod, ins, args.iters, B)
        timeit("volroute dmajor+2T", r_dmajor2t, ins, args.iters, B)
        timeit("volroute vmajor strip=16", r_vmajor_strip(16), ins,
               args.iters, B)
        timeit("volroute vmajor strip=256", r_vmajor_strip(256), ins,
               args.iters, B)

    if args.exp in ("walk", "all"):
        # One forward pass over vol_v, by itself.
        vols = []
        for l, r in ins:
            vols.append(jax.block_until_ready(
                sgm_volume_vmajor_pallas(tf(l), tf(r), D, cost="census",
                                         dtype=st)))

        def w(chunk=None, strip=16, folded=False):
            def f(v):
                out = sgm_directional_pallas(
                    v, params.sgm_p1, params.sgm_p2, chunk_lanes=chunk,
                    strip=strip, folded_tree=folded)
                return out.astype(jnp.float32).sum()
            return f

        vins = [(v,) for v in vols]
        timeit("fwd pass (prod auto)", w(), vins, args.iters, B)
        timeit("fwd pass chunk=256", w(chunk=256), vins, args.iters, B)

    if args.exp in ("vol2", "all"):
        # d-major builder row_strip sweep + the transpose pair alone.
        def bld(strip):
            def f(l, r):
                v = sgm_volume_pallas(tf(l), tf(r), D, cost="census",
                                      dtype=st, row_strip=strip)
                return v.astype(jnp.float32).sum()
            return f

        timeit("dmajor strip=64 (prod)", bld(64), ins, args.iters, B)
        timeit("dmajor strip=32", bld(32), ins, args.iters, B)
        timeit("dmajor strip=128", bld(128), ins, args.iters, B)
        timeit("dmajor strip=256", bld(256), ins, args.iters, B)

        vols = []
        for l, r in ins:
            vols.append(jax.block_until_ready(
                sgm_volume_pallas(tf(l), tf(r), D, cost="census",
                                  dtype=st)))
        vins = [(v,) for v in vols]

        def transposes(v):
            vv = jnp.transpose(v, (2, 1, 0, 3)).reshape(H, D, B * W)
            vh = jnp.transpose(v, (3, 1, 0, 2)).reshape(W, D, B * H)
            return (vv.astype(jnp.float32).sum()
                    + vh.astype(jnp.float32).sum())

        timeit("2 transposes alone", transposes, vins, args.iters, B)

    if args.exp in ("bt", "all"):
        # int8 transpose vs int32-bitcast transpose (W stays minor in
        # vol_v, so grouping 4 consecutive W-bytes into one int32 word
        # before the transpose is byte-exact).
        vols = []
        for l, r in ins:
            vols.append(jax.block_until_ready(
                sgm_volume_pallas(tf(l), tf(r), D, cost="census",
                                  dtype=st)))
        vins = [(v,) for v in vols]

        def t_plain(v):
            vv = jnp.transpose(v, (2, 1, 0, 3)).reshape(H, D, B * W)
            return vv.astype(jnp.float32).sum()

        def t_bitcast(v):
            w4 = v.reshape(B, D, H, W // 4, 4)
            p = jax.lax.bitcast_convert_type(w4, jnp.int32)
            pt = jnp.transpose(p, (2, 1, 0, 3))
            vv = jax.lax.bitcast_convert_type(pt, jnp.int8).reshape(
                H, D, B * W)
            return vv.astype(jnp.float32).sum()

        timeit("vol_v T int8 plain", t_plain, vins, args.iters, B)
        timeit("vol_v T int32 bitcast", t_bitcast, vins, args.iters, B)

    if args.exp in ("diag", "all"):
        # One diagonal pass (lane_shift=1) at different chunk widths —
        # the handoff slivers are per chunk per column, so wider
        # chunks halve the boundary-lane traffic (at more VMEM
        # staging per chunk).
        vols = []
        for l, r in ins[: args.iters + 1]:
            vols.append(jax.block_until_ready(
                sgm_volume_vmajor_pallas(tf(l), tf(r), D, cost="census",
                                         dtype=st)))
        vins = [(v,) for v in vols]

        def dg(chunk):
            def f(v):
                out = sgm_directional_pallas(
                    v, params.sgm_p1, params.sgm_p2, lane_shift=1,
                    lane_period=W, chunk_lanes=chunk)
                return out.astype(jnp.float32).sum()
            return f

        timeit("diag chunk=512 (prod)", dg(None), vins, args.iters, B)
        timeit("diag chunk=1024", dg(1024), vins, args.iters, B)
        timeit("diag chunk=2048", dg(2048), vins, args.iters, B)

    if args.exp in ("agg", "all"):
        # Full aggregation from scan-major volumes: production fold vs
        # an XLA 4-term merge of unfused directional outputs.
        def a_base(l, r):
            vv, vh = _sgm_scan_major_volumes(l, r, params, st)
            out = aggregate_from_scan_major(
                vv, vh, B, params.sgm_p1, params.sgm_p2, out_dtype=odt,
                layout="dhw", tail_padded=True)
            return out.astype(jnp.float32).sum()

        def a_nofold(l, r):
            vv, vh = _sgm_scan_major_volumes(l, r, params, st)
            run = functools.partial(sgm_directional_pallas,
                                    p1=params.sgm_p1, p2=params.sgm_p2)
            hf = run(vh)
            hr = run(vh, reverse=True, donate_volume=True)
            vf = run(vv)
            vr = run(vv, reverse=True, donate_volume=True)
            acc = odt
            un_h = lambda x: jnp.transpose(  # noqa: E731
                x.reshape(W, D, B, H), (2, 1, 3, 0)).astype(acc)
            un_v = lambda x: jnp.transpose(  # noqa: E731
                x.reshape(H, D, B, W), (2, 1, 0, 3)).astype(acc)
            out = (un_h(hf) + un_h(hr)) + (un_v(vf) + un_v(vr))
            pad = _round_up(W, 128) + tail_lane_pad(D) - W
            out = jnp.concatenate(
                [out, jnp.broadcast_to(out[..., W - 1:], (B, D, H, pad))],
                axis=-1)
            return out.astype(jnp.float32).sum()

        timeit("agg fold (prod)", a_base, ins, args.iters, B)
        timeit("agg nofold XLA merge", a_nofold, ins, args.iters, B)


if __name__ == "__main__":
    main()
