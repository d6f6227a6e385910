"""Pallas TPU kernel: fused modern cost volume (SAD or census) with
argmin, neighbor tracking, and sub-pixel parabola refine.

Same architecture as the classic kernel (ops/fused.py): one invocation
per row tile, DMA in once, slide the matching view one lane per step
(static rolls), aggregate windows with one banded-ones column matmul on
the MXU plus the chunked row box sum (ops/fused.make_row_box_sum), keep
only the running argmin state — the [D, H, W] volume never exists.
HBM traffic: 2 image reads + 3 small plane writes per view.

Exactness: only the column matmul's INPUTS must fit the MXU operand
dtype (the row sums are integer adds on the accumulator dtype).

* census: per-pixel costs are Hamming distances <= census bits (24) —
  int8 operands, int32 accumulation, exact for any window.
* sad: per-pixel |a-b| <= 255 — bf16 operands (integers <= 256 are
  bf16-exact), f32 accumulation; window sums <= 255 * window^2 stay
  below 2^24 for every window <= 255.  (Round 1 split SAD costs into
  base-8 digits across three int8 matmuls because the row sums
  re-entered the MXU as inputs; the lane tree removes that bound.)

Out-of-frame semantics match models/modern.py: the matching view is
edge-replicated in x (host pre-extension); cost contributions from
out-of-frame REFERENCE pixels are zeroed by a static validity mask
(the zero-padded aggregation of ops/costvolume._aggregate).

Argmin carries (best, best_d, c_left, c_right, c_prev, was_new) follow
ops/costvolume.argmin_subpixel_scan exactly — first-minimum tie rule —
and the parabola runs in-kernel after the loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereomatching_tpu.config import ModernParams
from stereomatching_tpu.ops.costvolume import DisparityResult

_BIG = 2**30  # matches ops.costvolume._BIG; plain int so the kernel
# does not close over a traced constant


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    ref_hbm,
    oth_hbm,
    disp_ref,
    sub_ref,
    cost_ref,
    ref_vmem,
    oth_vmem,
    sems,
    *,
    tile_rows: int,
    width: int,
    height: int,
    half: int,
    pad_half: int,
    num_disp: int,
    slide_from_high: bool,
    sad_split: bool,
    cost_max: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile_rows + 2 * pad_half
    k = 2 * half + 1
    w2h = width + 2 * half

    cp_r = pltpu.make_async_copy(
        ref_hbm.at[b, pl.ds(i * tile_rows, rows), :], ref_vmem, sems.at[0]
    )
    cp_o = pltpu.make_async_copy(
        oth_hbm.at[b, pl.ds(i * tile_rows, rows), :], oth_vmem, sems.at[1]
    )
    cp_r.start()
    cp_o.start()
    cp_r.wait()
    cp_o.wait()

    ref = ref_vmem[:]  # full [rows, lanes_ref]
    lanes_ref = ref.shape[1]
    y0 = pad_half - half
    del w2h

    # Validity mask: cost contributions from out-of-frame reference
    # pixels are zero (rows outside the global image, lanes in the
    # x halo and the alignment padding).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes_ref), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes_ref), 1)
    g = i * tile_rows + row_ids - pad_half
    in_frame = (
        (g >= 0) & (g < height) & (lane_ids >= half) & (lane_ids < half + width)
    ).astype(jnp.int32)

    # Box aggregation: column (sublane) sums as one banded-ones matmul
    # on the MXU, row (lane) sums via ops/fused.make_row_box_sum — the
    # same structure (and same measured-fastest "chunked" block-
    # diagonal band) as the classic kernel.  int8 MXU dots (2x bf16
    # rate) whenever per-pixel costs fit int8 (census Hamming distances
    # <= 24); SAD |a-b| <= 255 uses bf16 — exact since bf16 holds
    # integers <= 256 and the f32 row sums stay <= 255 * window^2
    # < 2^24 for window <= 255.  (Round 1 split costs into base-8
    # digits across THREE full-band matmul pairs; now at most one hi/lo
    # split of the much cheaper row pass is needed — see below.)
    from stereomatching_tpu.ops.aggregate import make_col_band
    from stereomatching_tpu.ops.fused import make_row_box_sum

    use_int8 = cost_max <= 127
    band_dtype = jnp.int8 if use_int8 else jnp.bfloat16
    acc_dtype = jnp.int32 if use_int8 else jnp.float32
    col_band = make_col_band(tile_rows, rows, k, y0, band_dtype)
    base_row = make_row_box_sum(width, lanes_ref, k, band_dtype, acc_dtype)
    # The row pass feeds the column sums (<= cost_max * k) back through
    # the MXU operand dtype, whose exact-integer range is 127 (int8) /
    # 255 (bf16).  Beyond it, one hi/lo digit split keeps both passes
    # exact: digits <= 2^bits - 1 <= the operand range (cs <= 255*255 <
    # 2^16, so two digits always suffice), and the f32/int32
    # accumulators hold the recombined sums exactly.
    digit_bits = 7 if use_int8 else 8
    if cost_max * k <= (127 if use_int8 else 255):
        row_sum = base_row
    else:
        def row_sum(cs):
            ci = cs.astype(jnp.int32)
            hi = ci >> digit_bits
            lo = ci & ((1 << digit_bits) - 1)
            return (base_row(hi) << digit_bits) + base_row(lo)

    def agg_cost(pc):
        cs = jnp.matmul(
            col_band, pc.astype(band_dtype), preferred_element_type=acc_dtype
        )
        return row_sum(cs)

    big_plane = jnp.full((tile_rows, width), _BIG, jnp.int32)

    def cost_of(o_cur):
        window = o_cur[:, 0:lanes_ref]
        if sad_split:
            pcost = jnp.abs(ref - window) * in_frame
        else:
            # census: Hamming distance (popcount is pure jnp, usable
            # in-kernel).
            from stereomatching_tpu.ops.costvolume import popcount32

            pcost = popcount32(ref ^ window) * in_frame
        return agg_cost(pcost)

    def argmin_update(state, c, d):
        best, best_d, c_left, c_right, c_prev, was_new = state
        # was_new is carried as int32 {0,1}: an i1 vector in the loop
        # carry fails Mosaic's scf.for legalization.
        c_right = jnp.where(was_new == 1, c, c_right)
        is_new = c < best
        return (
            jnp.where(is_new, c, best),
            jnp.where(is_new, d, best_d),
            jnp.where(is_new, c_prev, c_left),
            jnp.where(is_new, big_plane, c_right),
            c,
            is_new.astype(jnp.int32),
        )

    lanes = oth_vmem.shape[1]
    o_init = oth_vmem[:]
    if slide_from_high:
        # Left reference reads offset (D - d): pre-rotate left by D so
        # the first window is at offset D, then rotate right 1/step.
        o_init = pltpu.roll(o_init, lanes - num_disp, 1)
    state0 = (
        big_plane,
        jnp.zeros((tile_rows, width), jnp.int32),
        big_plane,
        big_plane,
        big_plane,
        jnp.zeros((tile_rows, width), jnp.int32),
    )

    def advance(o_cur, n):
        # n slide steps at once; direction per the reference view.
        shift = n if slide_from_high else lanes - n
        return pltpu.roll(o_cur, shift, 1)

    if num_disp % 2 == 0:
        # Two disparities per iteration on two slide carries one step
        # apart — independent cost pipelines, ordered argmin updates
        # (first-minimum rule untouched); measured ~9% on the classic
        # twin (tools/kernel_probe.py).
        def pair_step(i, carry):
            state, o_even, o_odd = carry
            c0 = cost_of(o_even)
            c1 = cost_of(o_odd)
            state = argmin_update(state, c0, 2 * i)
            state = argmin_update(state, c1, 2 * i + 1)
            return state, advance(o_even, 2), advance(o_odd, 2)

        state, _, _ = jax.lax.fori_loop(
            0, num_disp // 2, pair_step, (state0, o_init, advance(o_init, 1))
        )
    else:
        def step(d, carry):
            state, o_cur = carry
            state = argmin_update(state, cost_of(o_cur), d)
            return state, advance(o_cur, 1)

        state, _ = jax.lax.fori_loop(0, num_disp, step, (state0, o_init))
    best, best_d, c_left, c_right, _, _ = state

    cl = c_left.astype(jnp.float32)
    cm = best.astype(jnp.float32)
    cr = c_right.astype(jnp.float32)
    denom = cl - 2.0 * cm + cr
    valid = (c_left < _BIG) & (c_right < _BIG) & (denom > 0)
    offset = jnp.where(valid, (cl - cr) / jnp.where(valid, 2.0 * denom, 1.0), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)

    disp_ref[0] = best_d
    sub_ref[0] = best_d.astype(jnp.float32) + offset
    cost_ref[0] = best


def disparity_pallas(
    ref: jnp.ndarray,
    other: jnp.ndarray,
    params: ModernParams,
    reference: str = "left",
    tile_rows: int = 128,
    interpret: bool | None = None,
) -> DisparityResult:
    """Fused modern disparity for one view.  ``ref``/``other`` are the
    raw planes for the kernel's cost: intensities (0..255) for SAD,
    census codes for census (callers use models/modern helpers).
    [H, W] or [B, H, W].  scales=1 only; exactness constraint for
    census: census bits * window <= 255.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if params.scales != 1:
        raise ValueError("disparity_pallas supports scales=1 (XLA tier for 2)")
    if params.window > 255:
        # SAD costs <= 255 aggregate in one bf16 matmul + f32 lane tree,
        # exact while 255 * window^2 < 2^24; census (int8/int32) has no
        # bound of its own, but shares the classic kernels' documented
        # window limit.
        raise ValueError(
            f"window must be <= 255 (got {params.window}; use the XLA tier)"
        )
    squeeze = ref.ndim == 2
    if squeeze:
        ref = ref[None]
        other = other[None]
    bsz, h, w = ref.shape
    half = params.window // 2
    d = params.num_disparities
    tile_rows = max(8, min(_round_up(tile_rows, 8), _round_up(h, 8)))
    pad_half = _round_up(max(half, 1), 4)
    hp = _round_up(h, tile_rows)
    lw_r = _round_up(w + 2 * half, 128)
    lw_o = _round_up(w + 2 * half + d, 128)

    # Reference plane: value in halo irrelevant (masked); matching view:
    # edge-replicate x (the clamp semantics of ops/costvolume), any y.
    ref_pad = jnp.pad(
        ref.astype(jnp.int32), ((0, 0), (pad_half, hp - h + pad_half), (half, lw_r - w - half))
    )
    # x coordinate of lane j in the slide layout: left-ref lane j reads
    # other[x] for x = j - half - D .. ; simplest exact construction via
    # clamped gather (host-side, one-time).
    if reference == "left":
        xs = jnp.clip(jnp.arange(lw_o) - half - d, 0, w - 1)
        slide_from_high = True
    elif reference == "right":
        xs = jnp.clip(jnp.arange(lw_o) - half, 0, w - 1)
        slide_from_high = False
    else:
        raise ValueError(reference)
    oth_x = other.astype(jnp.int32)[..., xs]
    oth_pad = jnp.pad(oth_x, ((0, 0), (pad_half, hp - h + pad_half), (0, 0)))

    kernel = functools.partial(
        _kernel,
        tile_rows=tile_rows,
        width=w,
        height=h,
        half=half,
        pad_half=pad_half,
        num_disp=d,
        slide_from_high=slide_from_high,
        sad_split=params.cost == "sad",
        cost_max=255 if params.cost == "sad" else params.census_window**2 - 1,
    )
    rows = tile_rows + 2 * pad_half
    n_tiles = hp // tile_rows
    out_spec = pl.BlockSpec(
        (1, tile_rows, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    disp, sub, cost = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, w), jnp.int32),
            jax.ShapeDtypeStruct((bsz, hp, w), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, lw_r), jnp.int32),
            pltpu.VMEM((rows, lw_o), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ref_pad, oth_pad)
    disp, sub, cost = disp[:, :h], sub[:, :h], cost[:, :h]
    if squeeze:
        disp, sub, cost = disp[0], sub[0], cost[0]
    return DisparityResult(disparity=disp, subpixel=sub, cost=cost)
