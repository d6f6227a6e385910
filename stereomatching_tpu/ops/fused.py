"""Pallas TPU kernel: fused shift-match + box-filter + disparity argmax.

This is the VMEM-resident replacement for the reference's hot loop — the
CUDA ``addup_pixels_in_square`` kernel does square_width² (441) global
memory reads per pixel per shift (src/stereo.cu:146-155), plus separate
``fillup_matches`` / ``record_score`` / ``find_highest_scoring_shifts``
kernel launches each re-touching HBM (src/stereo.cu:194-207,323).  Here
one kernel invocation per row tile:

  * DMAs the edge-map tile (plus its dependency halo) HBM -> VMEM once,
  * loops over all shifts on-chip: match plane, separable box sum
    (2*(sw) vector adds instead of sw² reads), score, running
    (best, winner) argmax with the last-wins tie rule,
  * writes only the two [TH, W] result planes back.

HBM traffic: ~2 reads + 2 writes of the image — independent of the
number of shifts and of square_width.

Mosaic alignment: DMA slices must be (8, 128)-tile aligned, so the host
prep pads the sublane halo to a multiple of 4 per side and the lane
width to a multiple of 128; the kernel's value-level slices (lane/
sublane shifts for the box filter) have no such constraint.  The shift
slide itself is realized as one static lane-rotation per step
(``pltpu.roll``) because Mosaic cannot load at dynamic lane offsets.

Boundary semantics are baked into the padded inputs by ``_prepare`` so
the kernel itself is mode-agnostic:

  * wrap mode — x and y wrap-padding reproduces the modulo indexing of
    src/util.h:42-47.
  * ghost mode — the left edge map's halo is filled with the sentinel 2
    (edges are {0,1}, so any match against halo cells is 0 == the
    reference's zero-filled match halo, src/stereo-ghost.c:93-97), while
    the right map's x extension keeps the reference's real zero fill for
    the shift reads (src/stereo-ghost.c:119-121: matches against the
    zero edge halo are genuine ``left == 0`` comparisons).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereomatching_tpu.config import BoundaryMode, StereoParams

_LEFT_SENTINEL = 2  # never equal to an edge value {0, 1}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lane_box_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """In-kernel k-wide forward box sum along lanes:
    ``out[.., j] = sum_{t=0..k-1} x[.., j+t]`` via a log-tree of lane
    rotations (``pltpu.roll`` is a full-lattice rotate — cheap, unlike
    unaligned lane slices, and 32-bit dtypes only).

    Doubling partials P_c cover c consecutive lanes; k's binary
    decomposition stitches them with one extra roll per set bit.  The
    rotation wraparound only pollutes output lanes j > lanes - k, so
    callers must keep their useful outputs within lanes - k + 1 (the
    kernels' lane widths are >= width + k - 1 by construction).
    ~2*ceil(log2(k)) rolls+adds, vs the k-wide banded matmul whose
    operand is ~(lanes/k)x redundant."""
    lanes = x.shape[-1]
    if k == 1:
        return x
    if k > lanes:
        raise ValueError(f"window {k} exceeds lane width {lanes}")
    partials = {1: x}
    cover = 1
    p = x
    while cover * 2 <= k:
        # Left-rotate by `cover` == right-rotate by lanes - cover.
        p = p + pltpu.roll(p, lanes - cover, 1)
        cover *= 2
        partials[cover] = p
    out = partials[cover]
    off = cover
    rem = k - cover
    while rem > 0:
        c = 1 << (rem.bit_length() - 1)
        out = out + pltpu.roll(partials[c], lanes - off, 1)
        off += c
        rem -= c
    return out


def make_row_box_sum(width, lanes, k, band_dtype, acc_dtype, row_mode="chunked"):
    """Factory for the in-kernel row (lane) box sum: fn(cs [.., lanes])
    -> int32 [.., width] with out[x] = sum_{t<k} cs[x+t].  Three
    realizations (see _kernel's comment); ``chunked`` measured fastest
    at the 1 MP bench shape (1.02 vs 1.28 ms/pair full-matmul vs 1.99
    tree, tools/kernel_probe.py).  Falls back to the full band when the
    chunk geometry does not fit the lane width."""
    if row_mode == "chunked":
        chunk = 256 if width % 256 == 0 else 128
        kw = _round_up(chunk + k - 1, 128)
        n_chunks = -(-width // chunk)
        if (n_chunks - 1) * chunk + kw > lanes:
            row_mode = "matmul"

    if row_mode == "matmul":
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (lanes, width), 0)
        xx2 = jax.lax.broadcasted_iota(jnp.int32, (lanes, width), 1)
        row_band = ((jj2 - xx2 >= 0) & (jj2 - xx2 < k)).astype(band_dtype)

        def row_sum(cs):
            return jnp.matmul(
                cs.astype(band_dtype), row_band,
                preferred_element_type=acc_dtype,
            ).astype(jnp.int32)

    elif row_mode == "chunked":
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (kw, chunk), 0)
        xx2 = jax.lax.broadcasted_iota(jnp.int32, (kw, chunk), 1)
        chunk_band = ((jj2 - xx2 >= 0) & (jj2 - xx2 < k)).astype(band_dtype)

        def row_sum(cs):
            outs = [
                jnp.matmul(
                    cs[:, c * chunk : c * chunk + kw].astype(band_dtype),
                    chunk_band,
                    preferred_element_type=acc_dtype,
                )
                for c in range(n_chunks)
            ]
            return jnp.concatenate(outs, axis=1)[:, :width].astype(jnp.int32)

    elif row_mode == "tree":
        def row_sum(cs):
            return lane_box_sum(cs, k)[:, 0:width].astype(jnp.int32)

    else:
        raise ValueError(row_mode)
    return row_sum


def _x_tiling(w: int, half: int, d: int, x_tile: int | None):
    """Choose the lane (x) tiling: -> (n_x, wt, bw_l, bw_r, lw_l, lw_r).

    n_x x-tiles of wt output columns each; every tile's left block spans
    bw_l lanes (wt + the box halo, 128-rounded) and its right block
    bw_r (+ the shift slide's D extra lanes); lw_* are the total padded
    lane widths ((n_x-1)*wt + bw_*).  Single-tile (n_x=1) keeps the
    whole width in lanes — the fastest layout while it fits VMEM; wider
    images tile at 1024 columns so row tiles stay tall (docs/ROADMAP
    round-1 item 3)."""
    if x_tile is None:
        x_tile = 1024 if w > 2048 else w
    wt = min(w, max(128, x_tile))
    if wt < w and wt % 128:
        wt = _round_up(wt, 128)
    n_x = -(-w // wt)
    bw_l = _round_up(wt + 2 * half, 128)
    bw_r = _round_up(wt + 2 * half + d, 128)
    return n_x, wt, bw_l, bw_r, (n_x - 1) * wt + bw_l, (n_x - 1) * wt + bw_r


def _prepare(
    left_edges: jnp.ndarray,
    right_edges: jnp.ndarray,
    params: StereoParams,
    tile_rows: int,
    pad_half: int,
    lw_l: int | None = None,
    lw_r: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad edge maps so every tile DMA is a tiling-aligned plain slice.

    -> (l_pad [Hp+2p, Lw], r_pad [Hp+2p, Lwr], Hp) where Hp is H rounded
    up to tile_rows, p = pad_half >= half rounds the sublane halo to
    DMA alignment, Lw/Lwr are lane widths (the x-tiling totals, or the
    single-tile 128-rounded widths by default).  Row y of the image
    lands at padded row y + p; column x at lane x + half.
    """
    h, w = left_edges.shape[-2:]
    half = params.half
    d = params.num_shifts
    hp = _round_up(h, tile_rows)
    if lw_l is None:
        lw_l = _round_up(w + 2 * half, 128)
    if lw_r is None:
        lw_r = _round_up(w + 2 * half + d, 128)
    mode = params.mode
    nb = left_edges.ndim - 2  # leading batch dims

    if mode == BoundaryMode.WRAP:
        # Wrap everywhere: the extra alignment rows/lanes keep wrapping —
        # they are never read by an output window, values don't matter.
        ys = jnp.arange(-pad_half, hp + pad_half) % h
        xs_l = jnp.arange(-half, -half + lw_l) % w
        xs_r = jnp.arange(-half, -half + lw_r) % w
        l_pad = left_edges[..., ys, :][..., :, xs_l]
        r_pad = right_edges[..., ys, :][..., :, xs_r]
    else:
        bpad = [(0, 0)] * nb
        l_pad = jnp.pad(
            left_edges,
            bpad + [(pad_half, hp - h + pad_half), (half, lw_l - w - half)],
            constant_values=_LEFT_SENTINEL,
        )
        # Right map: halo rows/left columns never produce matches (the
        # left sentinel handles that); the right x extension is the
        # reference's zero-filled edge halo read by x+shift.
        r_pad = jnp.pad(
            right_edges,
            bpad + [(pad_half, hp - h + pad_half), (half, lw_r - w - half)],
        )
    return l_pad.astype(jnp.int32), r_pad.astype(jnp.int32), hp


def _match_loop_chunkmajor(
    l,
    r0,
    *,
    tile_rows: int,
    width: int,
    half: int,
    pad_half: int,
    num_shifts: int,
    chunk: int,
    shift_unroll: int = 2,
    subpixel: bool = False,
):
    """Chunk-major realization of _match_loop: the OUTER loop walks
    lane chunks of ``chunk`` output columns, the inner loop the shifts,
    so the compare/score/argmax chain and its (best, winner) carries
    live on small [tile_rows, chunk] values instead of staging full
    [rows, lanes] planes through VMEM per shift (the same movement-
    floor argument as ops/fused_sgm's chunk-major strip walk).  The
    per-chunk slide carry spans chunk + box + D lanes, so the shift
    rolls rotate ~3 lane tiles instead of the full width.  Semantics
    and results are bit-identical to _match_loop.

    MEASURED DEAD END at the 1 MP bench shape (tools/kernel_probe.py:
    cm256 1.115 / cm128 1.455 vs 0.942 ms/pair chunked): unlike the
    SGM recurrence this loop is matmul-anchored — per-chunk col-band
    matmuls run narrower (worse MXU utilization) and the overlapping
    chunk windows redo ~20% of the compare work, which outweighs the
    staging saving.  Kept selectable (row_mode="cm256") for probing
    other geometries; not the default."""
    k = 2 * half + 1
    d = num_shifts
    lanes_l = l.shape[1]
    lanes_r = r0.shape[1]
    cwl = _round_up(chunk + 2 * half, 128)  # l window + row-sum reach
    cwr = _round_up(chunk + 2 * half + d, 128)  # + slide reach
    n_ch = width // chunk
    assert width % chunk == 0
    assert (n_ch - 1) * chunk + cwl <= lanes_l, (n_ch, chunk, cwl, lanes_l)
    assert (n_ch - 1) * chunk + cwr <= lanes_r

    use_int8 = k <= 127
    band_dtype = jnp.int8 if use_int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if use_int8 else jnp.float32
    from stereomatching_tpu.ops.aggregate import make_col_band

    y0 = pad_half - half
    col_band = make_col_band(tile_rows, l.shape[0], k, y0, band_dtype)
    kw = _round_up(chunk + k - 1, 128)
    jj2 = jax.lax.broadcasted_iota(jnp.int32, (kw, chunk), 0)
    xx2 = jax.lax.broadcasted_iota(jnp.int32, (kw, chunk), 1)
    chunk_band = ((jj2 - xx2 >= 0) & (jj2 - xx2 < k)).astype(band_dtype)

    zeros = jnp.zeros((tile_rows, chunk), jnp.int32)
    missing = jnp.full((tile_rows, chunk), -1, jnp.int32)

    def score_of(l_c, r_c):
        mi = l_c == r_c[:, 0:cwl]
        cs = jnp.matmul(
            col_band, mi.astype(band_dtype), preferred_element_type=acc_dtype
        )
        sums = jnp.matmul(
            cs[:, 0:kw].astype(band_dtype), chunk_band,
            preferred_element_type=acc_dtype,
        ).astype(jnp.int32)
        match = mi[pad_half : pad_half + tile_rows, half : half + chunk]
        return jnp.where(match, sums, 0)

    if subpixel:
        def update(acc, score, dd):
            best, winner, s_left, s_right, s_prev, was_new = acc
            s_right = jnp.where(was_new == 1, score, s_right)
            is_new = score >= best
            return (
                jnp.maximum(best, score),
                jnp.where(is_new, dd + 1, winner),
                jnp.where(is_new, s_prev, s_left),
                jnp.where(is_new, missing, s_right),
                score,
                is_new.astype(jnp.int32),
            )

        init = (zeros, zeros, missing, missing, missing, zeros)
    else:
        def update(acc, score, dd):
            best, winner = acc
            winner = jnp.where(score >= best, dd + 1, winner)
            return jnp.maximum(best, score), winner

        init = (zeros, zeros)

    n_acc = len(init)
    chunks = []
    for c in range(n_ch):
        c0 = c * chunk
        l_c = l[:, c0 : c0 + cwl]
        r_c0 = r0[:, c0 : c0 + cwr]
        if shift_unroll == 2 and d % 2 == 0:
            def pair_step(i, carry, l_c=l_c):
                acc, r_even, r_odd = carry[:-2], carry[-2], carry[-1]
                acc = update(acc, score_of(l_c, r_even), 2 * i)
                acc = update(acc, score_of(l_c, r_odd), 2 * i + 1)
                return acc + (
                    pltpu.roll(r_even, cwr - 2, 1),
                    pltpu.roll(r_odd, cwr - 2, 1),
                )

            out = jax.lax.fori_loop(
                0, d // 2, pair_step,
                init + (r_c0, pltpu.roll(r_c0, cwr - 1, 1)),
            )[:-2]
        else:
            def shift_step(dd, carry, l_c=l_c):
                acc, r_cur = carry[:-1], carry[-1]
                acc = update(acc, score_of(l_c, r_cur), dd)
                return acc + (pltpu.roll(r_cur, cwr - 1, 1),)

            out = jax.lax.fori_loop(
                0, d, shift_step, init + (r_c0,)
            )[:-1]
        chunks.append(out[:n_acc])

    cat = lambda i: jnp.concatenate([ch[i] for ch in chunks], axis=1)  # noqa: E731
    best, winner = cat(0), cat(1)
    if not subpixel:
        return best, winner
    s_left, s_right = cat(2), cat(3)
    return best, winner, _parabola_refine(best, winner, s_left, s_right)


def _match_loop(
    l,
    r0,
    *,
    tile_rows: int,
    width: int,
    half: int,
    pad_half: int,
    num_shifts: int,
    row_mode: str = "chunked",
    shift_unroll: int = 2,
    subpixel: bool = False,
    band: str | None = None,
):
    """The fused shift-match / box-filter / argmax loop on VMEM-resident
    edge planes ``l`` [rows, lw_l] / ``r0`` [rows, lw_r] (lane x + half
    == image column x, padded row y + pad_half == image row y).  Shared
    by the edge-map kernel (_kernel) and the brightness-input kernel
    (_kernel_from_brightness).  -> (best, winner) [tile_rows, width].

    ``shift_unroll=2`` processes two shifts per loop iteration on two
    slide carries one lane apart (each advancing two lanes per step):
    the matmul pairs and rolls are independent, halving the
    loop-carried chain; the in-iteration updates stay ordered so the
    last-wins tie rule is untouched (bit-identical).

    ``subpixel`` also carries the winner's neighbor scores and appends
    a parabola-refined float32 plane (winner + offset, the semantics of
    ops/argmax.match_and_score_subpixel) to the return tuple; best and
    winner stay bit-identical.
    """
    rows = tile_rows + 2 * pad_half
    del rows
    # "<row_mode>:<band>" selects the matmul band dtype explicitly
    # (perf probing; tools/kernel_probe.py).
    if band is None and ":" in row_mode:
        row_mode, _, band = row_mode.partition(":")
    if row_mode.startswith("cm"):  # chunk-major: "cm256", "cm128"
        chunk = int(row_mode[2:] or 256)
        cwl = _round_up(chunk + 2 * half, 128)
        cwr = _round_up(chunk + 2 * half + num_shifts, 128)
        n_ch = -(-width // chunk)
        if (
            width % chunk == 0
            and (n_ch - 1) * chunk + cwl <= l.shape[1]
            and (n_ch - 1) * chunk + cwr <= r0.shape[1]
        ):
            return _match_loop_chunkmajor(
                l, r0, tile_rows=tile_rows, width=width, half=half,
                pad_half=pad_half, num_shifts=num_shifts, chunk=chunk,
                shift_unroll=shift_unroll, subpixel=subpixel,
            )
        row_mode = "chunked"  # geometry unfit: fall back
    y0 = pad_half - half  # first row the box filter reaches
    k = 2 * half + 1
    lanes = l.shape[1]  # lw_l, a multiple of 128 and >= width + k - 1

    # The separable box filter.  The COLUMN (sublane) sum is one
    # banded-ones matmul on the MXU (idle in this integer pipeline; the
    # band absorbs the halo offset so no sublane relayouts).  The ROW
    # (lane) sum is make_row_box_sum's selectable pass — "chunked"
    # (block-diagonal band matmul) measured fastest at 1 MP
    # (tools/kernel_probe.py: 1.02 vs 1.28 full-band vs 1.99 tree
    # ms/pair).  int8 x int8 -> int32 runs at the doubled MXU rate and
    # is exact whenever the int8 INPUTS fit: matches are {0,1}; the
    # chunked/matmul row pass re-enters column sums <= k, so k <= 127
    # selects int8 (bf16/f32 is exact to k <= 255 — the entry bound).
    # ``band`` overrides the dtype choice (perf probing via
    # tools/kernel_probe.py "<row_mode>:bf16"); both are exact here —
    # int8 needs k <= 127 (operand values <= k), bf16 k <= 255 (all
    # integer operands <= 441 < 2^24 under f32 accumulation).
    use_int8 = k <= 127 if band is None else band == "int8"
    band_dtype = jnp.int8 if use_int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if use_int8 else jnp.float32
    from stereomatching_tpu.ops.aggregate import make_col_band

    col_band = make_col_band(tile_rows, l.shape[0], k, y0, band_dtype)
    row_sum = make_row_box_sum(width, lanes, k, band_dtype, acc_dtype, row_mode)

    def score_of(r_cur):
        # The shift slide is incremental: r_cur is the full right tile
        # pre-rotated left by the shift amount (static-amount lane
        # rolls).  The window read stays at offset 0; the extra D lanes
        # on the right absorb the rotation so wraparound never enters
        # the window.
        mi = l == r_cur[:, 0:lanes]  # full width: lanes past width+k-1
        # never reach an output's window (and roll wraparound in the
        # tree mode only pollutes x > lanes - k >= width).
        cs = jnp.matmul(
            col_band, mi.astype(band_dtype), preferred_element_type=acc_dtype
        )
        sums = row_sum(cs)
        match = mi[pad_half : pad_half + tile_rows, half : half + width]
        return jnp.where(match, sums, 0)

    zeros = jnp.zeros((tile_rows, width), jnp.int32)
    missing = jnp.full((tile_rows, width), -1, jnp.int32)  # scores >= 0

    if subpixel:
        # Carry the winner's neighbor scores (s_left, s_right, the
        # previous score, and a took-the-max flag) exactly like
        # ops/argmax.match_and_score_subpixel's scan.
        def update(acc, score, d):
            best, winner, s_left, s_right, s_prev, was_new = acc
            s_right = jnp.where(was_new == 1, score, s_right)
            is_new = score >= best
            return (
                jnp.maximum(best, score),
                jnp.where(is_new, d + 1, winner),
                jnp.where(is_new, s_prev, s_left),
                jnp.where(is_new, missing, s_right),
                score,
                is_new.astype(jnp.int32),
            )

        init = (zeros, zeros, missing, missing, missing, zeros)
    else:

        def update(acc, score, d):
            best, winner = acc
            # Last-wins tie rule (src/stereo.c:211-219) via >= running
            # max.
            winner = jnp.where(score >= best, d + 1, winner)
            return jnp.maximum(best, score), winner

        init = (zeros, zeros)

    lanes_r = r0.shape[1]
    if shift_unroll == 2 and num_shifts % 2 == 0:

        def pair_step(i, carry):
            acc, r_even, r_odd = carry[:-2], carry[-2], carry[-1]
            s0 = score_of(r_even)
            s1 = score_of(r_odd)
            acc = update(acc, s0, 2 * i)
            acc = update(acc, s1, 2 * i + 1)
            # Both carries advance two lanes; rotate left 2 == rotate
            # right lanes-2.
            return acc + (
                pltpu.roll(r_even, lanes_r - 2, 1),
                pltpu.roll(r_odd, lanes_r - 2, 1),
            )

        out = jax.lax.fori_loop(
            0, num_shifts // 2, pair_step,
            init + (r0, pltpu.roll(r0, lanes_r - 1, 1)),
        )[:-2]
    else:

        def shift_step(d, carry):
            acc, r_cur = carry[:-1], carry[-1]
            acc = update(acc, score_of(r_cur), d)
            # Rotate left 1 lane == rotate right (lanes - 1);
            # pltpu.roll requires a non-negative shift.
            return acc + (pltpu.roll(r_cur, lanes_r - 1, 1),)

        out = jax.lax.fori_loop(
            0, num_shifts, shift_step, init + (r0,)
        )[:-1]

    if not subpixel:
        return out
    best, winner, s_left, s_right, _, _ = out
    return best, winner, _parabola_refine(best, winner, s_left, s_right)


def _parabola_refine(best, winner, s_left, s_right):
    """winner + parabola offset from the neighbor scores; offset 0
    where a neighbor is missing (-1 sentinel) or the triple is not
    strictly concave (ops/argmax.match_and_score_subpixel)."""
    sl = s_left.astype(jnp.float32)
    sm = best.astype(jnp.float32)
    sr = s_right.astype(jnp.float32)
    denom = sl - 2.0 * sm + sr
    valid = (s_left >= 0) & (s_right >= 0) & (denom < 0)
    offset = jnp.where(
        valid, (sl - sr) / jnp.where(valid, 2.0 * denom, 1.0), 0.0
    )
    offset = jnp.clip(offset, -0.5, 0.5)
    return winner.astype(jnp.float32) + offset


def _kernel(
    l_hbm,
    r_hbm,
    best_ref,
    winner_ref,
    *rest,
    tile_rows: int,
    width: int,
    half: int,
    pad_half: int,
    num_shifts: int,
    row_mode: str = "chunked",
    x_stride: int = 0,
    shift_unroll: int = 2,
    subpixel: bool = False,
):
    if subpixel:
        sub_ref, l_vmem, r_vmem, sems = rest
    else:
        sub_ref, (l_vmem, r_vmem, sems) = None, rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    rows = tile_rows + 2 * pad_half
    k = 2 * half + 1

    def src(hbm, vmem):
        # x_stride == 0 <=> single x-tile: a full lane slice keeps the
        # offset trivially tile-aligned for any (non-128-multiple)
        # width; tiled offsets j*x_stride are 128-aligned by
        # construction (x_stride is a 128 multiple when n_x > 1).
        if x_stride:
            return hbm.at[
                b, pl.ds(i * tile_rows, rows),
                pl.ds(j * x_stride, vmem.shape[1]),
            ]
        return hbm.at[b, pl.ds(i * tile_rows, rows), :]

    cp_l = pltpu.make_async_copy(src(l_hbm, l_vmem), l_vmem, sems.at[0])
    cp_r = pltpu.make_async_copy(src(r_hbm, r_vmem), r_vmem, sems.at[1])
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    out = _match_loop(
        l_vmem[:], r_vmem[:],
        tile_rows=tile_rows, width=width, half=half, pad_half=pad_half,
        num_shifts=num_shifts, row_mode=row_mode, shift_unroll=shift_unroll,
        subpixel=subpixel,
    )
    best_ref[0] = out[0]
    winner_ref[0] = out[1]
    if subpixel:
        sub_ref[0] = out[2]


def _invoke_kernel(
    l_pad: jnp.ndarray,
    r_pad: jnp.ndarray,
    w: int,
    params: StereoParams,
    tile_rows: int,
    pad_half: int,
    interpret: bool,
    row_mode: str = "chunked",
    x_tile: int | None = None,
    shift_unroll: int = 2,
    subpixel: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Launch the kernel on fully padded inputs
    (l_pad [B, Hp+2p, Lw], r_pad [B, Hp+2p, Lwr]) -> ([B, Hp, W] x2,
    plus a float32 sub-pixel plane when ``subpixel``).  The caller's
    padding must match this w/x_tile geometry (_x_tiling + _prepare)."""
    bsz = l_pad.shape[0]
    hp = l_pad.shape[1] - 2 * pad_half
    n_tiles = hp // tile_rows
    n_x, wt, bw_l, bw_r, lw_l, lw_r = _x_tiling(
        w, params.half, params.num_shifts, x_tile
    )
    assert l_pad.shape[-1] == lw_l and r_pad.shape[-1] == lw_r, (
        l_pad.shape, r_pad.shape, lw_l, lw_r)
    kernel = functools.partial(
        _kernel,
        tile_rows=tile_rows,
        width=wt,
        half=params.half,
        pad_half=pad_half,
        num_shifts=params.num_shifts,
        row_mode=row_mode,
        x_stride=wt if n_x > 1 else 0,
        shift_unroll=shift_unroll,
        subpixel=subpixel,
    )
    rows = tile_rows + 2 * pad_half
    n_out = 3 if subpixel else 2
    out_dtypes = [jnp.int32, jnp.int32, jnp.float32][:n_out]
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles, n_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_rows, wt), lambda b, i, j: (b, i, j),
                memory_space=pltpu.VMEM,
            )
        ] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, n_x * wt), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, bw_l), l_pad.dtype),
            pltpu.VMEM((rows, bw_r), r_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(l_pad, r_pad)
    if n_x * wt != w:
        outs = [o[..., :w] for o in outs]
    return tuple(outs)


def _auto_tile_rows(
    w: int,
    half: int,
    num_shifts: int,
    batch: int = 1,
    budget_bytes: int = 12 * 2**20,
) -> int:
    """Largest tile height (multiple of 8) whose working set fits the
    VMEM budget, capped by batch-grid pressure.

    256 measured fastest at 1 MP for small grids (better MXU M-dim
    utilization than 128), but large batch grids raise Mosaic's scoped
    VMEM high-water mark (output-window double buffering across grid
    steps): 256-row tiles at W=1024, D=64 abort at batch >= 32, while
    224-row tiles run the full batch-256 bench and measured fastest
    there (late round 2 A/B at batch 256: 1.10 ms/pair vs 1.12 at 192
    and worse at 160; batch 128 at 224: 1.20).  So the cap is 256 for
    small grids, 224 once the batch dimension is >= 32.  Callers
    needing a specific tiling pass ``tile_rows`` explicitly (plumbed
    through classic_forward / build_classic_pipeline / bench.py
    --tile-rows)."""
    pad_half = _round_up(half, 4)
    lw_l = _round_up(w + 2 * half, 128)
    lw_r = _round_up(w + 2 * half + num_shifts, 128)
    tile = 224 if batch >= 32 else 256
    while tile > 8:
        rows = tile + 2 * pad_half
        est = (
            rows * (lw_l + lw_r) * 4  # l/r scratch (int32)
            + rows * lw_l * (2 + 4 + 4)  # match bf16 + col_sum f32 + match i32
            + tile * w * 4 * 2  # best/winner carries
        )
        if est <= budget_bytes:
            return tile
        tile -= 8
    return 8


def match_and_score_pallas(
    left_edges: jnp.ndarray,
    right_edges: jnp.ndarray,
    params: StereoParams,
    tile_rows: int | None = None,
    interpret: bool | None = None,
    row_mode: str = "chunked",
    x_tile: int | None = None,
    shift_unroll: int = 2,
    subpixel: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused phases 2a-2c -> (best_scores, winning_shifts), int32 with
    the input's shape ([H, W] or batched [B, H, W] — the batch becomes
    the leading grid dimension, NOT a vmap, because Mosaic's ANY-space
    inputs cannot be block-partitioned by a batcher).

    Semantically identical to ops.argmax.match_and_score (and therefore
    to the serial oracle) in both boundary modes; ``interpret`` defaults
    to True off-TPU so tests run on CPU.

    ``subpixel`` appends the parabola-refined float32 plane of
    ops/argmax.match_and_score_subpixel (carried through the fused
    loop; best and winner stay bit-identical).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if params.square_width > 255:
        # Column sums reach square_width; beyond 255 even the bf16
        # matmul path loses exactness.  The XLA tier's SAT path has no
        # such bound.
        raise ValueError(
            "match_and_score_pallas requires square_width <= 255 "
            "(use the XLA tier for larger windows)"
        )
    squeeze = left_edges.ndim == 2
    if squeeze:
        left_edges = left_edges[None]
        right_edges = right_edges[None]
    bsz, h, w = left_edges.shape
    half = params.half
    d = params.num_shifts
    n_x, wt, _bw_l, _bw_r, lw_l, lw_r = _x_tiling(w, half, d, x_tile)
    if tile_rows is None:
        # Budget row tiles by the x-tile width, not the full image width
        # — with x tiling, wide images keep tall row tiles.
        tile_rows = _auto_tile_rows(wt, half, d, batch=bsz)
    tile_rows = max(8, min(_round_up(tile_rows, 8), _round_up(h, 8)))
    pad_half = _round_up(half, 4)  # DMA sublane alignment (2*pad_half % 8 == 0)
    l_pad, r_pad, _hp = _prepare(
        left_edges, right_edges, params, tile_rows, pad_half, lw_l, lw_r
    )
    outs = _invoke_kernel(
        l_pad, r_pad, w, params, tile_rows, pad_half, interpret, row_mode,
        x_tile, shift_unroll, subpixel,
    )
    outs = tuple(o[:, :h] for o in outs)
    if squeeze:
        outs = tuple(o[0] for o in outs)
    return outs


def match_and_score_pallas_prehalo(
    l_halo: jnp.ndarray,
    r_halo: jnp.ndarray,
    params: StereoParams,
    halo: int,
    tile_rows: int | None = None,
    interpret: bool | None = None,
    pre_extended: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel entry for row shards whose y-halo rows were already
    exchanged from neighbor shards (parallel/pipeline.py).

    ``l_halo`` [B, hs + 2*halo, W] is the left edge map with ``halo``
    neighbor rows on each side; in ghost mode the caller must have
    overwritten rows outside the GLOBAL image with a non-edge sentinel
    (e.g. 2) so their matches vanish.  ``r_halo`` [B, hs + 2*halo,
    W + num_shifts] is the right map extended in x per the boundary
    mode (ops/matching.extend semantics), with the same y-halo.

    x padding for the box filter and all alignment padding are applied
    here; halo must be >= square_width // 2.
    -> (best, winner) int32 [B, hs, W].

    ``pre_extended``: the caller already built the x extension into the
    maps (2-D col-sharded tier: the x halos arrived by col exchange, so
    wrap values are REAL neighbor columns, not a local modulo) — skip
    the wrap re-derivation and treat the maps as ghost-style
    pre-extended blocks whose out-of-block x pads only ever reach
    discarded halo outputs.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    half = params.half
    d = params.num_shifts
    if halo < half:
        raise ValueError(f"halo {halo} < square_width//2 {half}")
    bsz, rows_in, w = l_halo.shape
    hs = rows_in - 2 * halo
    n_x, wt, _bw_l, _bw_r, lw_l, lw_r = _x_tiling(w, half, d, None)
    if tile_rows is None:
        tile_rows = _auto_tile_rows(wt, half, d, batch=bsz)
    tile_rows = max(8, min(_round_up(tile_rows, 8), _round_up(hs, 8)))
    pad_half = _round_up(half, 4)
    hp = _round_up(hs, tile_rows)

    # Trim/grow the y-halo to exactly pad_half rows per side, then grow
    # the bottom to the hp rounding.  Fill rows never reach an interior
    # output's box window (they are > half away), any value works.
    l_mid = l_halo[:, halo - half : rows_in - (halo - half), :]
    r_mid = r_halo[:, halo - half : rows_in - (halo - half), :]
    grow = pad_half - half
    wrap = params.mode == BoundaryMode.WRAP and not pre_extended

    if wrap:
        # x pads wrap modulo W (columns 0..W-1 of the given maps are the
        # raw edge maps in both l and r layouts).
        xs_l = jnp.arange(-half, -half + lw_l) % w
        xs_r_src = jnp.arange(-half, -half + lw_r) % w
        l_x = l_mid[..., xs_l]
        r_x = r_mid[..., xs_r_src]
    else:
        l_x = jnp.pad(
            l_mid, ((0, 0), (0, 0), (half, lw_l - w - half)),
            constant_values=_LEFT_SENTINEL,
        )
        r_x = jnp.pad(
            r_mid, ((0, 0), (0, 0), (half, lw_r - (w + d) - half))
        )
    del n_x
    l_pad = jnp.pad(
        l_x, ((0, 0), (grow, grow + hp - hs), (0, 0)),
        constant_values=_LEFT_SENTINEL,
    )
    r_pad = jnp.pad(r_x, ((0, 0), (grow, grow + hp - hs), (0, 0)))

    best, winner = _invoke_kernel(
        l_pad.astype(jnp.int32), r_pad.astype(jnp.int32),
        w, params, tile_rows, pad_half, interpret,
    )
    return best[:, :hs], winner[:, :hs]


# ---------------------------------------------------------------------------
# Fully fused variant: edges computed in-VMEM from brightness (the
# single-kernel classic pipeline, docs/ROADMAP round-1 item 4).  Removes
# the separate XLA edges pass and its 4 HBM plane round-trips; only the
# bit-deterministic "exact" edge rule is supported in-kernel (the
# "reference" float rule keeps the two-pass path).


def _edges_exact_tile(kk: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """The 'exact' edge rule (ops/edges._find_edges_padded_exact) on a
    VMEM-resident integer brightness tile ``kk`` [rows, lanes]
    (k = round(brightness * 256)).  Neighbor taps are full-lattice
    rolls, so the first/last row and lane hold wrapped garbage — the
    caller's padding margins (pad >= half+1 rows, lane widths >= used
    region + 2) keep them out of every consumer's reach.

    Each operator's 3-tap side sums are built from the shared partials
    L = shift_x(kk, -1), R = shift_x(kk, +1) and their row shifts —
    integer adds commute, so the sums equal the tap-by-tap order of
    EDGE_OPERATORS (src/stereo.c:16-70) exactly while only ~6 arrays
    are ever live (the Mosaic scoped-VMEM budget matters here).
    -> int32 {0,1} [rows, lanes]."""
    rows, lanes = kk.shape

    def sy(x, dy):  # result[r] = x[r + dy]
        return pltpu.roll(x, 1, 0) if dy == -1 else pltpu.roll(x, rows - 1, 0)

    left = pltpu.roll(kk, 1, 1)  # [r, j] = kk[r, j-1]
    right = pltpu.roll(kk, lanes - 1, 1)  # [r, j] = kk[r, j+1]
    t32 = jnp.float32(threshold)

    def decide(ka, kb):
        lhs = (2 * jnp.abs(ka - kb)).astype(jnp.float32)
        rhs = jnp.minimum(t32 * (ka + kb).astype(jnp.float32),
                          jnp.float32(1536.0))
        return (lhs > rhs).astype(jnp.int32)

    # left_right: columns dx=-1 vs dx=+1 (3 row taps each).
    edges = decide(
        sy(left, -1) + left + sy(left, 1),
        sy(right, -1) + right + sy(right, 1),
    )
    # top_bottom: rows dy=-1 vs dy=+1 of the horizontal triple sum.
    hsum = left + kk + right
    edges = edges | decide(sy(hsum, -1), sy(hsum, 1))
    # upleft_downright: {(-1,-1),(0,-1),(-1,0)} vs {(1,0),(0,1),(1,1)}.
    sl = left + kk
    sr = kk + right
    edges = edges | decide(sy(sl, -1) + left, right + sy(sr, 1))
    # downleft_upright: {(-1,1),(0,1),(-1,0)} vs {(0,-1),(1,-1),(1,0)}.
    edges = edges | decide(sy(sl, 1) + left, sy(sr, -1) + right)
    return edges


def _kernel_from_brightness(
    kl_hbm,
    kr_hbm,
    best_ref,
    winner_ref,
    el_ref,
    er_ref,
    *rest,
    tile_rows: int,
    width: int,
    half: int,
    pad_half: int,
    num_shifts: int,
    row_mode: str,
    x_stride: int,
    threshold: float,
    height: int,
    img_width: int,
    ghost: bool,
    shift_unroll: int = 2,
    subpixel: bool = False,
):
    if subpixel:
        sub_ref, l_vmem, r_vmem, sems = rest
    else:
        sub_ref, (l_vmem, r_vmem, sems) = None, rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    x0 = j * x_stride
    rows = tile_rows + 2 * pad_half

    def src(hbm, vmem):
        if x_stride:  # see _kernel.src: alignment provability
            return hbm.at[
                b, pl.ds(i * tile_rows, rows),
                pl.ds(j * x_stride, vmem.shape[1]),
            ]
        return hbm.at[b, pl.ds(i * tile_rows, rows), :]

    cp_l = pltpu.make_async_copy(src(kl_hbm, l_vmem), l_vmem, sems.at[0])
    cp_r = pltpu.make_async_copy(src(kr_hbm, r_vmem), r_vmem, sems.at[1])
    cp_l.start()
    cp_r.start()
    cp_l.wait()
    cp_r.wait()

    def widen(tile):
        # int16 is a STORAGE format: widen once per tile; the ghost
        # fill sentinel -32768 maps back to the reference's k = 32768
        # (128.0 halo brightness) — real k values are never negative.
        if tile.dtype == jnp.int32:
            return tile
        t = tile.astype(jnp.int32)
        return jnp.where(t < 0, jnp.int32(32768), t)

    # Lane j holds image column x0 + j - half - 1; padded row r holds
    # image row i*tile_rows + r - pad_half.
    el_full = _edges_exact_tile(widen(l_vmem[:]), threshold)
    er_full = _edges_exact_tile(widen(r_vmem[:]), threshold)

    if ghost:
        # Ghost boundary semantics at the EDGE level (matching _prepare):
        # out-of-image left cells carry the never-matching sentinel,
        # right cells the reference's zero edge fill
        # (src/stereo-ghost.c:93-97, 119-121).
        def mask(e_full, fill):
            r_, l_ = e_full.shape
            g = i * tile_rows + jax.lax.broadcasted_iota(
                jnp.int32, (r_, l_), 0
            ) - pad_half
            c = x0 + jax.lax.broadcasted_iota(jnp.int32, (r_, l_), 1) - half - 1
            ok = (g >= 0) & (g < height) & (c >= 0) & (c < img_width)
            return jnp.where(ok, e_full, fill)

        el_full = mask(el_full, _LEFT_SENTINEL)
        er_full = mask(er_full, 0)

    # Re-align lanes to the match-loop layout (lane j == column j-half):
    # one left-rotation; the garbage entering at the top lane is beyond
    # every consumer's reach (lane widths have 2 spare lanes).
    el = pltpu.roll(el_full, el_full.shape[1] - 1, 1)
    er = pltpu.roll(er_full, er_full.shape[1] - 1, 1)

    out = _match_loop(
        el, er,
        tile_rows=tile_rows, width=width, half=half, pad_half=pad_half,
        num_shifts=num_shifts, row_mode=row_mode, shift_unroll=shift_unroll,
        subpixel=subpixel,
    )
    best_ref[0] = out[0]
    winner_ref[0] = out[1]
    el_ref[0] = el[pad_half : pad_half + tile_rows, half : half + width]
    er_ref[0] = er[pad_half : pad_half + tile_rows, half : half + width]
    if subpixel:
        sub_ref[0] = out[2]


def _prepare_k(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoParams,
    tile_rows: int,
    pad_half: int,
    lw_l: int,
    lw_r: int,
    narrow: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Pad integer brightness planes (k = round(b*256)) for the fused-
    edges kernel: row y at padded row y + pad_half, column x at lane
    x + half + 1 (one extra lane per side for the edge stencil).  Wrap
    mode wraps; ghost mode fills with the reference's 128.0 halo
    brightness == k 32768 (src/stereo-ghost.c:384-385).

    ``narrow`` stores int16 (half the pad pass's HBM traffic and half
    the kernel's input DMA).  Real k values are 0..255; the ghost fill
    32768 does not fit int16, so it is stored as the sentinel -32768
    and mapped back to 32768 by the kernel after widening — bit-exact."""
    h, w = left.shape[-2:]
    half = params.half
    hp = _round_up(h, tile_rows)
    nb = left.ndim - 2
    dt = jnp.int16 if narrow else jnp.int32
    kl = jnp.round(left * jnp.asarray(256.0, left.dtype)).astype(dt)
    kr = jnp.round(right * jnp.asarray(256.0, right.dtype)).astype(dt)
    if params.mode == BoundaryMode.WRAP:
        ys = jnp.arange(-pad_half, hp + pad_half) % h
        xs_l = jnp.arange(-half - 1, -half - 1 + lw_l) % w
        xs_r = jnp.arange(-half - 1, -half - 1 + lw_r) % w
        l_pad = kl[..., ys, :][..., :, xs_l]
        r_pad = kr[..., ys, :][..., :, xs_r]
    else:
        # round(GHOST_BRIGHTNESS_FILL * 256); int16 sentinel widens to
        # -32768 < 0, which _kernel_from_brightness maps back.
        fill = -32768 if narrow else 128 * 256
        bpad = [(0, 0)] * nb
        l_pad = jnp.pad(
            kl,
            bpad + [(pad_half, hp - h + pad_half),
                    (half + 1, lw_l - w - half - 1)],
            constant_values=fill,
        )
        r_pad = jnp.pad(
            kr,
            bpad + [(pad_half, hp - h + pad_half),
                    (half + 1, lw_r - w - half - 1)],
            constant_values=fill,
        )
    return l_pad, r_pad, hp


def match_score_edges_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoParams,
    tile_rows: int | None = None,
    interpret: bool | None = None,
    row_mode: str = "chunked",
    x_tile: int | None = None,
    shift_unroll: int = 2,
    input_storage: str = "int16",
    subpixel: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Single-kernel classic phases 1-2: brightness in, (best_scores,
    winning_shifts, edges_l, edges_r) out — the edge stencil runs
    in-VMEM on the brightness tile (compound halo half+1), so the edge
    maps never round-trip HBM between phases.  Requires
    edge_rule="exact" (the bit-deterministic integer rule; the
    "reference" float rule keeps the two-pass path).  [H, W] or
    [B, H, W] brightness in [0, 1).

    ``input_storage``: "int16" (default) stores the padded brightness
    planes narrow — half the prep pass's HBM writes and half the
    kernel's input DMA; arithmetic widens to int32 in VMEM, bit-exact
    (see _prepare_k).  "int32" keeps the round-1 layout."""
    if params.edge_rule != "exact":
        raise ValueError(
            "match_score_edges_pallas requires edge_rule='exact'"
        )
    if params.square_width > 255:
        raise ValueError(
            "match_score_edges_pallas requires square_width <= 255 "
            "(use the XLA tier for larger windows)"
        )
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = left.ndim == 2
    if squeeze:
        left, right = left[None], right[None]
    bsz, h, w = left.shape
    half = params.half
    d = params.num_shifts

    # Lane geometry: the edge stencil needs one extra lane per side on
    # top of the match loop's box/slide reach.
    if x_tile is None:
        x_tile = 1024 if w > 2048 else w
    wt = min(w, max(128, x_tile))
    if wt < w and wt % 128:
        wt = _round_up(wt, 128)
    n_x = -(-w // wt)
    bw_l = _round_up(wt + 2 * half + 2, 128)
    bw_r = _round_up(wt + 2 * half + d + 2, 128)
    lw_l = (n_x - 1) * wt + bw_l
    lw_r = (n_x - 1) * wt + bw_r

    if input_storage not in ("int16", "int32"):
        raise ValueError(f"input_storage must be int16 or int32, got "
                         f"{input_storage!r}")
    narrow = input_storage == "int16"
    # int16 DMA slices need (16, 128)-tile alignment (vs (8, 128) for
    # int32): round the row-tile geometry up accordingly.
    align = 16 if narrow else 8
    if tile_rows is None:
        tile_rows = _auto_tile_rows(wt, half, d, batch=bsz)
    tile_rows = max(align,
                    min(_round_up(tile_rows, align), _round_up(h, align)))
    # Edge stencil adds 1 row of reach on top of the box halo.
    pad_half = _round_up(half + 1, align // 2)
    l_pad, r_pad, hp = _prepare_k(
        left, right, params, tile_rows, pad_half, lw_l, lw_r, narrow=narrow
    )
    n_tiles = hp // tile_rows
    kernel = functools.partial(
        _kernel_from_brightness,
        tile_rows=tile_rows,
        width=wt,
        half=half,
        pad_half=pad_half,
        num_shifts=d,
        row_mode=row_mode,
        x_stride=wt if n_x > 1 else 0,
        threshold=float(params.threshold),
        height=h,
        img_width=w,
        ghost=params.mode == BoundaryMode.GHOST,
        shift_unroll=shift_unroll,
        subpixel=subpixel,
    )
    rows = tile_rows + 2 * pad_half
    out_spec = pl.BlockSpec(
        (1, tile_rows, wt), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
    )
    out_dtypes = [jnp.int32] * 4 + ([jnp.float32] if subpixel else [])
    outs = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles, n_x),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec] * len(out_dtypes),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, n_x * wt), dt)
            for dt in out_dtypes
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, bw_l), l_pad.dtype),
            pltpu.VMEM((rows, bw_r), r_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # The default 16 MB scoped-vmem limit is a compiler default, not
        # the 128 MB physical VMEM; the edge taps + match loop peak just
        # above it at 192-row tiles.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(l_pad, r_pad)
    outs = [o[:, :h, :w] for o in outs]
    if squeeze:
        outs = [o[0] for o in outs]
    return tuple(outs)
