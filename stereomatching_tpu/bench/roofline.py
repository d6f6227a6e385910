"""Roofline / speed-of-light accounting for the classic pipeline.

SURVEY §5's metrics row specs per-phase "bytes, FLOPs, achieved VMEM BW
vs speed-of-light"; BASELINE.md:38 demands "cost-volume kernels at
VMEM-bandwidth speed-of-light per chip".  This module provides

  * analytic per-phase traffic/compute models (bytes to/from HBM, MXU
    FLOPs, VPU element-ops) derived from the kernel structure,
  * honest on-device phase timings (distinct inputs per iteration +
    checksum readback — ``block_until_ready`` on repeated identical
    dispatches is unreliable through the remote TPU tunnel, see
    bench.py), and
  * the roofline verdict per phase: achieved HBM GB/s, MXU utilization,
    VPU utilization, and the speed-of-light time
    ``max(bytes/BW_peak, mxu/MXU_peak, vpu/VPU_peak)`` vs measured.

Peak numbers are the public TPU v5e datasheet values (197 bf16 TFLOP/s,
394 int8 TOP/s, 819 GB/s HBM); the VPU peak is an estimate (8x128 lanes
x ~4 ALUs x 940 MHz ~= 3.85 Tera-elementops/s) and is the softest
number here — treat VPU utilization as indicative, the HBM/MXU lines as
firm.  Override any of them via ``Peaks``.

Usage:  python -m stereomatching_tpu.bench.roofline [--batch 128] ...
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional

import numpy as np

from stereomatching_tpu.config import StereoParams


@dataclasses.dataclass(frozen=True)
class Peaks:
    hbm_gbps: float = 819.0
    mxu_bf16_tflops: float = 197.0
    mxu_int8_tops: float = 394.0
    vpu_teraops: float = 3.85
    # One (8, 128) vector lattice retired per cycle at 940 MHz — the
    # issue rate the compiled kernels demonstrably achieve (the SGM
    # ablation in tools/sgm_dir_probe.py: op-count cuts moved time
    # linearly at ~this rate, and ILP interleaves moved nothing).  The
    # instruction-census bound below uses it; the 4-ALU vpu_teraops
    # peak is the architectural ceiling.
    #
    # Round-4 measurements (tools/vpu_probe.py, slope-timed register-
    # resident kernels, 5 reps):
    #   dep-add   2.72 T elementops/s  (2.82 vreg-ops/cycle)
    #   sgm-mix   1.63 T               (pure-compute SGM-shaped chain)
    #   sgm-mem   1.05 T               (same chain + a store->load
    #                                   dependent VMEM access per trip
    #                                   — the walk kernel's per-column
    #                                   c load + L store shape)
    # The sgm-mem body REPRODUCES the rate the real kernels sustain
    # (the round-3 ablation inferred 0.963 from op-count cuts): memory
    # -access issue slots cost ~36% of the pure-compute rate, and the
    # production walk runs within ~10% of the memory-coupled ceiling.
    # The census bound below prices ops at the MEASURED sgm-mem rate;
    # the pure-compute ceiling quantifies what a Mosaic-level rewrite
    # that freed every load/store slot could still reach.
    vpu_single_issue_teraops: float = 1.05
    vpu_mix_compute_teraops: float = 1.63
    # ICI (inter-chip interconnect): v5e public one-way per-link
    # bandwidth ~4.5e10 B/s (the scaling-book number); a 1-D ring of
    # row shards uses one link per neighbor direction, both directions
    # concurrently.  Latency per ppermute hop is the softest number
    # here (~order 1 us on ICI); it dominates the diffusion loop's
    # tiny 1-row exchanges, so it is modeled explicitly.
    ici_gbps: float = 45.0
    ici_latency_us: float = 1.5


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def classic_phase_models(
    params: StereoParams, h: int, w: int, tile_rows: int = 192
) -> Dict[str, Dict[str, float]]:
    """Per-PAIR traffic/compute models for the batched Pallas pipeline.

    bytes: HBM traffic (reads + writes) the phase must perform.
    mxu: MXU multiply-add FLOPs (2 * M*N*K per matmul).
    vpu: element-ops on the VPU (counting each vectorized arithmetic /
    compare / select / roll over an [r, c] array as r*c ops).
    """
    half = params.half
    d = params.num_shifts
    k = 2 * half + 1
    sw2 = k * k
    del sw2
    pad_half = _round_up(half, 4)
    rows = tile_rows + 2 * pad_half
    hp = _round_up(h, tile_rows)
    n_tiles = hp // tile_rows
    # Padded lane widths follow the kernel's x-tiling above W=2048
    # (ops/fused._x_tiling) so the 4K/8K rows model the real layouts.
    from stereomatching_tpu.ops.fused import _x_tiling

    _, _, _, _, lw_l, lw_r = _x_tiling(w, half, d, None)
    hw = h * w

    # --- edges: read 2 f32 brightness planes, write 2 int32 edge maps;
    # 3x3 stencil, ~16 element-ops per pixel per image.
    edges = dict(bytes=16.0 * hw, mxu=0.0, vpu=2 * 16.0 * hw)

    # --- kernel prep (XLA): pad/gather the edge maps into the aligned
    # layouts — read 8 B/px, write the padded planes.
    prep_out = 4.0 * (hp + 2 * pad_half) * (lw_l + lw_r)
    prep = dict(bytes=8.0 * hw + prep_out, mxu=0.0, vpu=2.0 * hw)

    # --- fused match kernel: DMA the padded planes in, write two int32
    # result planes; per tile per shift, the column banded matmul
    # (col [tile, rows] @ [rows, lw_l]) plus the chunked row pass
    # (n_chunks matmuls [tile, kw] @ [kw, chunk]) plus the match/score/
    # argmax element work.
    chunk = 256 if w % 256 == 0 else 128
    kw = _round_up(chunk + k - 1, 128)
    n_chunks = -(-w // chunk)
    mxu_per_shift = (
        2.0 * tile_rows * rows * lw_l + n_chunks * 2.0 * tile_rows * kw * chunk
    )
    vpu_per_shift = (
        rows * lw_l  # match compare
        + rows * lw_l  # cast to band dtype
        + 6.0 * tile_rows * w  # score select, >=, where, max
        + rows * lw_r  # the slide roll
    )
    kernel = dict(
        bytes=prep_out + 8.0 * hp * w,
        mxu=n_tiles * d * mxu_per_shift,
        vpu=n_tiles * d * vpu_per_shift,
    )

    # --- diffusion (fused): 1 read + 1 write of the int32 plane (plus
    # halo rows); (times-1) Jacobi steps of ~12 element-ops per cell in
    # VMEM.
    steps = max(params.times - 1, 0)
    dt = _round_up(min(256, max(8, h)), 8)
    diff = dict(
        bytes=4.0 * (hp + 2 * steps) * w + 4.0 * hw,
        mxu=0.0,
        vpu=steps * 12.0 * (dt + 2 * steps) * w * (hp / max(dt, 1)),
    )

    # --- contour: read web, min/max reduce, write output.
    contour = dict(bytes=8.0 * hw, mxu=0.0, vpu=6.0 * hw)

    # --- single-kernel path (exact rule): k-plane prep (XLA pad) +
    # in-VMEM edges + match loop + 4 output planes.
    fused = dict(
        bytes=8.0 * hw + 2.0 * prep_out + 16.0 * hp * w,
        mxu=kernel["mxu"],
        vpu=kernel["vpu"] + n_tiles * 50.0 * rows * lw_l,
    )

    total = {
        key: fused[key] + diff[key] + contour[key]
        for key in ("bytes", "mxu", "vpu")
    }
    return {
        "edges": edges,
        "kernel_prep": prep,
        "match_kernel": kernel,
        "fused_kernel": fused,
        "diffusion": diff,
        "contour": contour,
        "end_to_end": total,
    }


def sgm_phase_models(params, h: int, w: int) -> Dict[str, Dict[str, float]]:
    """Per-PAIR traffic/compute models for the Pallas SGM route
    (models/modern._sgm_forward_batched_pallas) — census cost, int8/16
    volume storage, 4 or 8 directions, fused tail.

    The walk's vpu census uses the chunk-major step's ~14 vector ops
    per [D, chunk] column (tools/sgm_dir_probe.py); diagonals run the
    full-plane walk whose per-step staging roughly doubles that.
    """
    from stereomatching_tpu.models.modern import (
        _sgm_out_dtype,
        _sgm_storage_dtype,
    )

    hw = float(h * w)
    d = params.num_disparities
    vol_e = d * hw  # volume elements
    sz_v = np.dtype(_sgm_storage_dtype(params)).itemsize
    sz_s = np.dtype(_sgm_out_dtype(params)).itemsize
    # Tail-padded lane factor of the merged volume (fused_sgm.tail_lane_pad).
    wp = (_round_up(w, 128) + _round_up(d, 128)) / w

    # --- volume: census transform x2 (image in, codes out) + the
    # d-major VMEM builder (ops/fused_sgm.sgm_volume_pallas): each
    # code plane is DMA'd once per row strip (~8 B/px total) and the
    # d-major volume written once with CONTIGUOUS per-disparity
    # stores (the v-major builder's d-indexed stores are single-
    # sublane scatters that measured 0.5 ms/pair slower, round 4).
    # Census is ~40 element-ops/px (window compares + shifts + ors);
    # the cost is xor + SWAR popcount ~16 ops per element.
    volume = dict(
        bytes=16.0 * hw + 8.0 * hw + sz_v * vol_e,
        mxu=0.0,
        vpu=2 * 40.0 * hw + 16.0 * vol_e,
    )

    # --- aggregation.  4 directions: TWO scan-major relayouts (vol_v
    # and vol_h are both XLA transposes of the d-major volume), per
    # axis a forward pass (read vol, write L) and a folded reverse
    # pass (read vol + read L, write the int16 axis sum — biased-int8
    # fold stores measured slower end-to-end, ops/fused_sgm
    # wide_fold), then the merge (read the per-axis sums, write the
    # tail-padded dhw volume at the out dtype).  8 directions: the
    # v-major builder + ONE relayout (the d-major route's third live
    # volume OOMs 8-dir at batch 24), and the three v-major sums
    # (vertical axis + both diagonal pairs) CHAIN through the folded
    # passes' add_wide operand (one donated int16 buffer): each
    # chained pass reads the running sum once, and the merge reads
    # only two sums regardless of direction count.
    dirs = params.sgm_directions
    n_axes = 2 + (2 if dirs == 8 else 0)  # diagonal pairs ride vol_v
    sz_f = max(sz_v, 2.0)  # fold-store width
    relayout = (2.0 if dirs == 8 else 4.0) * sz_v * vol_e
    walk_bytes = n_axes * (sz_v * vol_e + sz_v * vol_e  # fwd r+w
                           + 2.0 * sz_v * vol_e + sz_f * vol_e)  # rev
    if dirs == 8:
        walk_bytes += 2.0 * sz_f * vol_e  # chained add_wide reads
    merge = 2.0 * sz_f * vol_e + sz_s * vol_e * wp
    walk_vpu = 14.0 * vol_e * (2 + (2 * 2.0 if dirs == 8 else 0))
    aggregation = dict(
        bytes=relayout + walk_bytes + merge,
        mxu=0.0,
        vpu=walk_vpu + (dirs // 2) * vol_e,
    )

    # --- tail: one read of the tail-padded int16 volume, four [H, W]
    # output planes, the LR mask, and fill_iterations Jacobi sweeps on
    # a VMEM tile (1 read + 1 write of two f32 planes).
    tail = dict(
        bytes=sz_s * vol_e * wp + 16.0 * hw + 16.0 * hw,
        mxu=0.0,
        vpu=12.0 * vol_e + params.fill_iterations * 14.0 * hw,
    )

    total = {
        key: volume[key] + aggregation[key] + tail[key]
        for key in ("bytes", "mxu", "vpu")
    }
    return {
        "volume": volume,
        "aggregation": aggregation,
        "tail": tail,
        "end_to_end": total,
    }


def measure_sgm(
    h: int = 1024,
    w: int = 1024,
    d: int = 64,
    batch: int = 32,
    iters: int = 3,
    peaks: Peaks = Peaks(),
    seed: int = 0,
    directions: int = 4,
) -> List[Dict[str, float]]:
    """Honest per-phase SGM roofline on the current backend."""
    import jax
    import jax.numpy as jnp

    from stereomatching_tpu.config import ModernParams
    from stereomatching_tpu.models.modern import (
        _maybe_census,
        _sgm_cost_bound,
        _sgm_forward_batched_pallas,
        _sgm_out_dtype,
        _sgm_scan_major_volumes,
        _sgm_storage_dtype,
    )
    from stereomatching_tpu.ops.fused_sgm import (
        aggregate_from_scan_major,
        sgm_volume_pallas,
        sgm_volume_vmajor_pallas,
    )

    params = ModernParams(
        num_disparities=d, aggregation="sgm", cost="census",
        sgm_directions=directions,
    )
    models = sgm_phase_models(params, h, w)
    sdt = _sgm_storage_dtype(params)
    rng = np.random.default_rng(seed)
    n = iters + 1
    ins = [
        (
            jnp.asarray(rng.integers(0, 256, (batch, h, w)).astype(np.int32)),
            jnp.asarray(rng.integers(0, 256, (batch, h, w)).astype(np.int32)),
        )
        for _ in range(n)
    ]
    jax.block_until_ready(ins)

    # The volume phase is the production route's builder alone (the
    # scan-major transposes are part of the aggregation stage, as in
    # sgm_phase_models): d-major VMEM builder at 4 directions, v-major
    # builder at 8 (models/modern._sgm_scan_major_volumes picks the
    # v-major route there for its lower peak-HBM footprint).
    def vol_v_fn(l, r):
        tf = jax.vmap(
            lambda x: _maybe_census(x.astype(jnp.int32), params)
        )
        if directions == 8:
            return sgm_volume_vmajor_pallas(
                tf(l), tf(r), d, cost=params.cost, dtype=sdt
            )
        return sgm_volume_pallas(
            tf(l), tf(r), d, cost=params.cost, dtype=sdt
        )

    rows: List[Dict[str, float]] = []
    t = _time_checksum(
        jax.jit(lambda l, r: vol_v_fn(l, r).astype(jnp.float32).sum()),
        ins, iters,
    )
    rows.append(verdict("volume", t / batch, models["volume"], peaks))

    def agg_fn(l, r):
        vol_v, vol_h = _sgm_scan_major_volumes(l, r, params, sdt)
        return aggregate_from_scan_major(
            vol_v, vol_h, l.shape[0], params.sgm_p1, params.sgm_p2,
            out_dtype=_sgm_out_dtype(params), layout="dhw",
            tail_padded=True, directions=directions,
            cost_bound=_sgm_cost_bound(params),
        )

    t = _time_checksum(
        jax.jit(
            lambda l, r: agg_fn(l, r).astype(jnp.float32).sum()
        ),
        ins, iters,
    )
    agg_t = t / batch - rows[-1]["ms_per_pair"] / 1e3
    rows.append(verdict("aggregation", agg_t, models["aggregation"], peaks))

    t = _time_checksum(
        jax.jit(lambda l, r: sum(
            v.sum().astype(jnp.float32)
            for v in _sgm_forward_batched_pallas(l, r, params).values()
        )),
        ins, iters,
    )
    e2e = t / batch
    rows.append(verdict(
        "tail",
        max(e2e - rows[0]["ms_per_pair"] / 1e3 - agg_t, 1e-9),
        models["tail"], peaks,
    ))
    rows.append(verdict("end_to_end", e2e, models["end_to_end"], peaks))
    return rows


def _time_checksum(fn, inputs: List, iters: int) -> float:
    """Seconds per call: jitted ``fn`` mapped over distinct device
    inputs, checksum readback per iteration."""
    import time

    import jax

    acc = 0
    acc += int(jax.device_get(fn(*inputs[0])))  # warmup/compile
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        acc += int(jax.device_get(fn(*inputs[i])))
    t1 = time.perf_counter()
    del acc
    return (t1 - t0) / iters


def verdict(
    name: str,
    seconds_per_pair: float,
    model: Dict[str, float],
    peaks: Peaks,
) -> Dict[str, float]:
    t_hbm = model["bytes"] / (peaks.hbm_gbps * 1e9)
    # int8 matmuls whenever square_width <= 127 (the kernel's rule).
    t_mxu = model["mxu"] / (peaks.mxu_int8_tops * 1e12)
    t_vpu = model["vpu"] / (peaks.vpu_teraops * 1e12)
    sol = max(t_hbm, t_mxu, t_vpu)
    # Instruction-census bound: the same op counts at the single-issue
    # vector rate the compiled kernels demonstrably sustain (Peaks).
    # The architectural SOL above says what the silicon could do; this
    # says what THIS op census costs at the achieved issue rate — the
    # honest target for "are more op-count cuts worth hunting".
    t_vpu1 = model["vpu"] / (peaks.vpu_single_issue_teraops * 1e12)
    instr = max(t_hbm, t_mxu, t_vpu1)
    # The same census at the MEASURED pure-compute retire rate
    # (tools/vpu_probe.py sgm-mix): what a Mosaic-level rewrite that
    # freed every memory-access issue slot could still reach.
    t_vpuc = model["vpu"] / (peaks.vpu_mix_compute_teraops * 1e12)
    ceil = max(t_hbm, t_mxu, t_vpuc)
    return {
        "phase": name,
        "ms_per_pair": round(seconds_per_pair * 1e3, 4),
        "hbm_mb": round(model["bytes"] / 1e6, 2),
        "mxu_gflop": round(model["mxu"] / 1e9, 2),
        "vpu_gop": round(model["vpu"] / 1e9, 2),
        "achieved_gbps": round(model["bytes"] / seconds_per_pair / 1e9, 1),
        "mxu_util_pct": round(t_mxu / seconds_per_pair * 100, 1),
        "vpu_util_pct": round(t_vpu / seconds_per_pair * 100, 1),
        "speed_of_light_ms": round(sol * 1e3, 4),
        "sol_bound": ("hbm" if sol == t_hbm else "mxu" if sol == t_mxu else "vpu"),
        "x_from_sol": round(seconds_per_pair / sol, 2) if sol > 0 else 0.0,
        "instr_bound_ms": round(instr * 1e3, 4),
        "x_from_instr": (
            round(seconds_per_pair / instr, 2) if instr > 0 else 0.0
        ),
        "compute_ceiling_ms": round(ceil * 1e3, 4),
        "x_from_compute_ceiling": (
            round(seconds_per_pair / ceil, 2) if ceil > 0 else 0.0
        ),
    }


def measure(
    h: int = 1024,
    w: int = 1024,
    d: int = 64,
    batch: int = 128,
    iters: int = 3,
    tile_rows: Optional[int] = None,
    peaks: Peaks = Peaks(),
    seed: int = 0,
) -> List[Dict[str, float]]:
    """Honest per-phase roofline measurement on the current backend."""
    import jax
    import jax.numpy as jnp

    from stereomatching_tpu.config import BoundaryMode
    from stereomatching_tpu.models.classic import classic_forward_batched
    from stereomatching_tpu.ops.edges import find_edges
    from stereomatching_tpu.ops.fused import (
        _auto_tile_rows,
        _invoke_kernel,
        _prepare,
        match_and_score_pallas,
    )
    from stereomatching_tpu.ops.fused_diffusion import fill_web_holes_pallas

    params = StereoParams(num_shifts=d, mode=BoundaryMode.GHOST, edge_rule="exact")
    tr = tile_rows or _auto_tile_rows(w, params.half, d, batch=batch)
    models = classic_phase_models(params, h, w, tile_rows=tr)
    rng = np.random.default_rng(seed)
    n = iters + 1

    def batches(maker):
        return [maker(i) for i in range(n)]

    def bright(_):
        return (
            jnp.asarray(rng.integers(0, 256, (batch, h, w)).astype(np.float32) / 256.0),
            jnp.asarray(rng.integers(0, 256, (batch, h, w)).astype(np.float32) / 256.0),
        )

    ins = batches(bright)
    jax.block_until_ready(ins)

    ef = jax.jit(
        jax.vmap(lambda x: find_edges(x, params.threshold, params.mode, params.edge_rule))
    )
    rows: List[Dict[str, float]] = []

    # Phase order is arranged to bound peak HBM footprint (batch 128 at
    # 1 MP is 0.5 GB per plane batch): inputs are dropped as soon as the
    # derived planes for the next phase exist.
    t = _time_checksum(jax.jit(lambda a, b: ef(a).sum() + ef(b).sum()), ins, iters)
    rows.append(verdict("edges", t / batch, models["edges"], peaks))

    e2e = jax.jit(
        lambda a, b: sum(
            v.sum()
            for key, v in classic_forward_batched(
                a, b, params, use_pallas=True, tile_rows=tr
            ).items()
            if key in ("score_best", "web-2", "output-0", "edges-1")
        )
    )
    t = _time_checksum(e2e, ins, iters)
    e2e_verdict = verdict("end_to_end", t / batch, models["end_to_end"], peaks)

    from stereomatching_tpu.ops.fused import match_score_edges_pallas

    fe_fn = jax.jit(
        lambda a, b: sum(
            x.sum()
            for x in match_score_edges_pallas(a, b, params, tile_rows=tr)[:2]
        )
    )
    t = _time_checksum(fe_fn, ins, iters)
    fe_verdict = verdict("fused_kernel", t / batch, models["fused_kernel"], peaks)

    edge_ins = [(ef(a), ef(b)) for a, b in ins]
    jax.block_until_ready(edge_ins)
    del ins

    pad_half = _round_up(params.half, 4)
    # The kernel x-tiles above W=2048; the isolated prep/kernel phases
    # must use the SAME padded lane geometry the production call does.
    from stereomatching_tpu.ops.fused import _x_tiling

    _, _, _, _, lw_l, lw_r = _x_tiling(w, params.half, d, None)
    prep_fn = jax.jit(
        lambda a, b: sum(
            x.sum()
            for x in _prepare(a, b, params, tr, pad_half, lw_l, lw_r)[:2]
        )
    )
    t = _time_checksum(prep_fn, edge_ins, iters)
    rows.append(verdict("kernel_prep", t / batch, models["kernel_prep"], peaks))

    pad_ins = [
        _prepare(a, b, params, tr, pad_half, lw_l, lw_r)[:2]
        for a, b in edge_ins
    ]
    jax.block_until_ready(pad_ins)
    interp = jax.default_backend() not in ("tpu", "axon")
    kern_fn = jax.jit(
        lambda lp, rp: sum(
            x.sum()
            for x in _invoke_kernel(lp, rp, w, params, tr, pad_half, interp)
        )
    )
    t = _time_checksum(kern_fn, pad_ins, iters)
    rows.append(verdict("match_kernel", t / batch, models["match_kernel"], peaks))
    del pad_ins

    ms_fn = jax.jit(lambda a, b: match_and_score_pallas(a, b, params, tile_rows=tr))
    winner_ins = [(ms_fn(a, b)[1],) for a, b in edge_ins]
    jax.block_until_ready(winner_ins)
    del edge_ins

    # value_bound enables the production two-images-per-int32 packing
    # (models/classic._fill_web_holes_auto) — the phase must measure the
    # path the pipeline actually runs.
    diff_fn = jax.jit(
        lambda wn: fill_web_holes_pallas(
            wn, params.times, value_bound=params.num_shifts + 1
        ).sum()
    )
    t = _time_checksum(diff_fn, winner_ins, iters)
    rows.append(verdict("diffusion", t / batch, models["diffusion"], peaks))

    # Production contour = banding only; the min/max reduction is folded
    # into the diffusion kernel's epilogue (with_range).
    web_fn = jax.jit(
        lambda wn: fill_web_holes_pallas(
            wn, params.times, value_bound=params.num_shifts + 1, with_range=True
        )
    )
    web_ins = [web_fn(wn) for (wn,) in winner_ins]
    jax.block_until_ready(web_ins)
    del winner_ins
    from stereomatching_tpu.ops.contour import contour_bands

    cont_fn = jax.jit(
        lambda wb, mn, mx: jax.vmap(
            lambda x, a, b: contour_bands(x, params.lines, a, b)
        )(wb, mn, mx).sum()
    )
    t = _time_checksum(cont_fn, web_ins, iters)
    rows.append(verdict("contour", t / batch, models["contour"], peaks))

    rows.append(fe_verdict)
    rows.append(e2e_verdict)
    return rows


def ici_phase_model(
    params: StereoParams,
    rows_per_shard: int,
    w: int,
    batch: int = 1,
    peaks: Peaks = Peaks(),
) -> Dict[str, Dict[str, float]]:
    """Per-SHARD halo-exchange traffic and predicted ICI time for the
    row-sharded classic pipeline (parallel/pipeline.py's exchange
    table).  Halo width == dependency reach (the reference's rule,
    src/stereo-ghost.c:11-12); each shard exchanges with its two ring
    neighbors on separate links, both directions concurrent, so the
    per-shard cost is INDEPENDENT of the shard count — the analytic
    reason weak scaling is flat for N >= 2 (BASELINE.md's >= 90%
    target), with the only step at N=1 -> 2 (no exchange at N=1).

    bytes: payload per neighbor direction (the concurrent-link max).
    exchanges: sequential ppermute rounds in the phase.
    us: predicted time = exchanges * (latency + bytes / ici_bw).
    """
    f32 = 4
    i32 = 4
    reach_box = params.square_width // 2
    phases = {
        # 1 halo row of x-extended brightness, once (f32).
        "edges_halo": {
            "bytes": float(1 * (w + 2) * f32 * batch),
            "exchanges": 1.0,
        },
        # sw//2 halo rows of BOTH binary edge maps, once (int32 maps).
        "boxfilter_halo": {
            "bytes": float(reach_box * w * i32 * batch * 2),
            "exchanges": 1.0,
        },
        # One 1-row web exchange per Jacobi step, times-1 steps,
        # SEQUENTIAL (each step needs the previous step's neighbors) —
        # tiny payloads, so the latency term dominates.
        "diffusion_halo": {
            "bytes": float(1 * w * i32 * batch),
            "exchanges": float(max(params.times - 1, 0)),
        },
        # Global min/max: 2 scalar all-reduces, latency-only (modeled
        # as one ring round each).
        "contour_reduce": {"bytes": float(8 * batch), "exchanges": 2.0},
    }
    bw = peaks.ici_gbps * 1e9
    for m in phases.values():
        m["us"] = m["exchanges"] * (
            peaks.ici_latency_us + m["bytes"] / bw * 1e6
        )
    return phases


def weak_scaling_prediction(
    params: StereoParams,
    rows_per_shard: int,
    w: int,
    batch: int = 1,
    shard_counts: tuple = (1, 2, 4, 8, 16, 32, 64, 128, 256),
    peaks: Peaks = Peaks(),
) -> List[Dict[str, float]]:
    """Pre-registered weak-scaling efficiency curve: per-shard compute
    is constant (rows_per_shard fixed, H = N * rows_per_shard), the
    halo cost per shard is O(1) in N, so

        eff(N) = t_compute / (t_compute + t_ici)   for N >= 2,  eff(1) = 1

    with t_compute the single-shard speed-of-light time of the per-
    shard slab (classic_phase_models) — the HARDEST efficiency bar:
    real compute is slower than speed-of-light, which only dilutes the
    ICI share.  Recorded in docs/BENCHMARKS.md next to the CPU-mesh
    harness measurements (tools/scaling_bench.py) so a future pod run
    has a falsifiable target."""
    comp = classic_phase_models(params, rows_per_shard, w)
    bw = peaks.hbm_gbps * 1e9
    t_comp_us = sum(
        max(
            m["bytes"] / bw,
            m.get("mxu", 0.0) / (peaks.mxu_int8_tops * 1e12),
            m.get("vpu", 0.0) / (peaks.vpu_teraops * 1e12),
        )
        for m in comp.values()
    ) * 1e6 * batch
    ici = ici_phase_model(params, rows_per_shard, w, batch, peaks)
    t_ici_us = sum(m["us"] for m in ici.values())
    out = []
    for n in shard_counts:
        eff = 1.0 if n == 1 else t_comp_us / (t_comp_us + t_ici_us)
        out.append(
            {
                "shards": n,
                "height": n * rows_per_shard,
                "t_compute_us_sol": round(t_comp_us, 2),
                "t_ici_us": round(t_ici_us, 2),
                "predicted_efficiency": round(eff, 4),
            }
        )
    return out


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--disparities", type=int, default=64)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--tile-rows", type=int, default=None)
    p.add_argument("--pipeline", choices=["classic", "sgm"], default="classic")
    p.add_argument("--directions", type=int, default=4, choices=[4, 8])
    p.add_argument("--json", action="store_true", help="one JSON line per phase")
    p.add_argument("--ici", action="store_true",
                   help="print the analytic halo-exchange model and the "
                        "pre-registered weak-scaling efficiency curve "
                        "(no device needed) instead of measuring")
    p.add_argument("--rows-per-shard", type=int, default=256)
    args = p.parse_args()

    if args.ici:
        params = StereoParams(num_shifts=args.disparities, edge_rule="exact")
        ici = ici_phase_model(params, args.rows_per_shard, args.size,
                              batch=args.batch or 1)
        for name, m in ici.items():
            print(json.dumps({"phase": name, **{k: round(v, 3) for k, v in m.items()}}))
        for row in weak_scaling_prediction(
            params, args.rows_per_shard, args.size, batch=args.batch or 1
        ):
            print(json.dumps(row))
        return

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    if args.pipeline == "sgm":
        rows = measure_sgm(
            h=args.size, w=args.size, d=args.disparities,
            batch=args.batch or 32, iters=args.iters,
            directions=args.directions,
        )
    else:
        rows = measure(
            h=args.size, w=args.size, d=args.disparities,
            batch=args.batch or 128,
            iters=args.iters, tile_rows=args.tile_rows,
        )
    if args.json:
        for r in rows:
            print(json.dumps(r))
        return
    cols = ("phase", "ms_per_pair", "hbm_mb", "achieved_gbps", "mxu_util_pct",
            "vpu_util_pct", "speed_of_light_ms", "sol_bound", "x_from_sol",
            "instr_bound_ms", "x_from_instr", "compute_ceiling_ms",
            "x_from_compute_ceiling")
    print("  ".join(f"{c:>17}" for c in cols))
    for r in rows:
        print("  ".join(f"{str(r[c]):>17}" for c in cols))


if __name__ == "__main__":
    main()
