"""Pallas TPU kernel: the web hole-filling diffusion, all iterations
fused in VMEM.

The reference runs `times` separate kernel launches, each a full HBM
round trip of the web plane (src/stereo.cu:247-256); the XLA tier's
scan does the same through HBM.  Here each row tile is DMA'd to VMEM
once with a halo of `steps` rows (halo width == dependency reach: the
influence front moves one row per Jacobi step) and all steps run
on-chip: HBM traffic is 1 read + 1 write of the plane regardless of
`times`.

Semantics are the reference's exactly (see ops/diffusion.py):
  X[t+1][p] = (X[t][p] == 0) ? floor(avg4(X[t])[p]) : X[t-1][p]
with raw flat-index neighbors p±1 / p±W (x neighbors cross row
boundaries; out-of-buffer reads are 0) and X[times-1] returned.  The
flat p±1 semantics are realized with circular lane rolls plus a lane-
boundary fix-up from the adjacent row; rows outside the global image
are re-zeroed every step (out-of-buffer cells are 0 *forever*, they do
not evolve).

Any width is supported: lanes pad to the 128 tile and the two
boundary-crossing fixups source the REAL boundary columns via dedicated
hop rotations, so pad lanes never contaminate a real cell.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_tile(x, op):
    """Reduce a [rows, width] plane (rows % 8 == 0, width % 128 == 0)
    to one [8, 128] tile with ``op`` over whole-tile static slices —
    no sub-tile offsets, no cross-lane reductions."""
    acc = x[0:8]
    for k in range(1, x.shape[0] // 8):
        acc = op(acc, x[8 * k : 8 * (k + 1)])
    out = acc[:, 0:128]
    for k in range(1, acc.shape[1] // 128):
        out = op(out, acc[:, 128 * k : 128 * (k + 1)])
    return out


def _kernel(
    w_hbm,
    out_ref,
    w_vmem,
    sems,
    *,
    tile_rows: int,
    halo: int,
    width: int,       # padded lane count (128 multiple)
    img_w: int,       # real image width (flat-index row stride)
    height: int,
    steps: int,
    chains: int,
    packed: bool,
    min_ref=None,     # with_range: [1, 8, 128] per-image min fold
    max_ref=None,
    min_acc=None,     # [2, 8, 128] scratch (field 0 = hi/full, 1 = lo)
    max_acc=None,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    span = chains * tile_rows + 2 * halo

    # One contiguous DMA covers all chains' tiles plus halos; each chain
    # is an overlapping row window of the same buffer.  The chains are
    # data-independent Jacobi recurrences — interleaving them in one
    # loop body doubles the ILP of this latency-bound step chain.
    cp = pltpu.make_async_copy(
        w_hbm.at[b, pl.ds(i * chains * tile_rows, span), :], w_vmem,
        sems.at[0],
    )
    cp.start()
    cp.wait()

    x_full = w_vmem[:]
    rows = tile_rows + 2 * halo
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)

    x0s, masks = [], []
    for c in range(chains):
        xc = x_full[c * tile_rows : c * tile_rows + rows]
        # Rows outside the global image stay 0 forever (out-of-buffer
        # reads are 0 and do not evolve).
        g = (i * chains + c) * tile_rows + row - halo
        in_img = ((g >= 0) & (g < height)).astype(jnp.int32)
        masks.append(in_img)
        x0s.append(xc * in_img)

    def advance(cur, prev, in_img):
        # Flat p+1: lane l+1, except lane img_w-1 takes lane 0 of the
        # row below.  Rolls are circular with non-negative shifts; when
        # width > img_w (lane padding to the 128 tile), the pad lanes
        # evolve garbage but the only real lane reading across the
        # boundary (img_w-1's right / 0's left) is always overridden by
        # these fixups, so lanes [0, img_w) stay exact.
        #
        # The fixups touch ONE lane each, so they are built from
        # [rows, 1] slivers (aligned lane-0 slices, sublane-rolled,
        # lane-broadcast) instead of full-tile sublane rotations — the
        # kernel is roll-throughput-bound and the sliver ops are ~free
        # next to a full lattice rotation.
        right_c = pltpu.roll(cur, width - 1, 1)
        left_c = pltpu.roll(cur, 1, 1)
        # cur[r+1, 0] at lane img_w-1:
        col0 = cur[:, 0:1]
        right_fix = jnp.broadcast_to(
            pltpu.roll(col0, rows - 1, 0), (rows, width)
        )
        right = jnp.where(lane == img_w - 1, right_fix, right_c)
        # cur[r-1, img_w-1] at lane 0.  left_c's lane 0 is cur's lane
        # width-1 == img_w-1 when unpadded; padded widths hop the real
        # boundary column to lane 0 first.
        if img_w == width:
            colw = left_c[:, 0:1]
        else:
            colw = pltpu.roll(cur, (width - img_w + 1) % width, 1)[:, 0:1]
        left_fix = jnp.broadcast_to(pltpu.roll(colw, 1, 0), (rows, width))
        left = jnp.where(lane == 0, left_fix, left_c)
        up = pltpu.roll(cur, 1, 0)  # row y-1
        down = pltpu.roll(cur, rows - 1, 0)  # row y+1
        if not packed:
            avg = (right + down + left + up) // 4
            return jnp.where(cur == 0, avg, prev) * in_img
        # Packed: two images per int32 (16+16 bits).  Field values are
        # < 2^14 (caller-proven bound), so the 4-way sum stays < 2^16
        # per field — one 32-bit add never carries across fields — and
        # //4 is a shift with the leaked high-field bits masked off.
        # The zero test / keep-prev select act per field via bit masks.
        s = right + down + left + up
        avg = (s >> 2) & jnp.int32(0x3FFF3FFF)
        m_lo = jnp.where((cur & 0xFFFF) == 0, jnp.int32(0xFFFF), 0)
        m_hi = jnp.where((cur >> 16) == 0, jnp.int32(-65536), 0)
        mask = m_lo | m_hi
        return ((avg & mask) | (prev & ~mask)) * in_img

    def one_step(_, carry):
        return tuple(
            (cur, advance(cur, prev, mask))
            for (prev, cur), mask in zip(carry, masks)
        )

    init = tuple((x0, x0) for x0 in x0s)
    final = jax.lax.fori_loop(0, steps, one_step, init)
    with_range = min_ref is not None
    if with_range:
        # Fill values: for packed 16-bit fields the min fill must stay
        # below the field boundary (values < 2^14 <= 0x3FFF; max fill 0
        # is safe, fields are non-negative); unpacked uses +-2^30.
        fill_min = jnp.int32(0x3FFF if packed else 2**30)
        fill_max = jnp.int32(0 if packed else -(2**30))

        @pl.when(i == 0)
        def _():
            min_acc[...] = jnp.full(min_acc.shape, fill_min, jnp.int32)
            max_acc[...] = jnp.full(max_acc.shape, fill_max, jnp.int32)

        rt = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 0)
        lt = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, width), 1)
    for c in range(chains):
        y = final[c][1][halo : halo + tile_rows, :]
        out_ref[0, c * tile_rows : (c + 1) * tile_rows, :] = y
        if with_range:
            # Per-image min/max folded into an [8, 128] accumulator —
            # contour rendering then needs only the elementwise banding
            # pass (the per-plane reduction was 27x off its HBM bound
            # as a standalone XLA phase).
            g0 = (i * chains + c) * tile_rows
            valid = ((rt + g0) < height) & (lt < img_w)
            fields = [(y >> 16), (y & 0xFFFF)] if packed else [y]
            for fi, f in enumerate(fields):
                min_acc[fi] = jnp.minimum(
                    min_acc[fi], _fold_tile(jnp.where(valid, f, fill_min), jnp.minimum)
                )
                max_acc[fi] = jnp.maximum(
                    max_acc[fi], _fold_tile(jnp.where(valid, f, fill_max), jnp.maximum)
                )
    if with_range:
        if packed:
            min_ref[0] = (min_acc[0] << 16) | min_acc[1]
            max_ref[0] = (max_acc[0] << 16) | max_acc[1]
        else:
            min_ref[0] = min_acc[0]
            max_ref[0] = max_acc[0]


def _kernel_range(w_hbm, out_ref, min_ref, max_ref, w_vmem, sems, min_acc,
                  max_acc, **kw):
    """Ref-order adapter: pallas passes outputs then scratches
    positionally; _kernel takes the range refs as keywords."""
    _kernel(w_hbm, out_ref, w_vmem, sems, min_ref=min_ref, max_ref=max_ref,
            min_acc=min_acc, max_acc=max_acc, **kw)


def _fill_invalid_kernel(
    d_hbm,
    v_hbm,
    out_ref,
    d_vmem,
    v_vmem,
    sems,
    *,
    tile_rows: int,
    halo: int,
    width: int,  # padded lane count
    img_w: int,
    height: int,
    steps: int,
):
    """All ``steps`` validity-aware Jacobi sweeps on one row tile in
    VMEM (ops/costvolume.fill_invalid semantics: invalid pixels take the
    float32 mean of their VALID 4-neighbors, zero-padded edges; halo
    width == steps, the influence reach)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile_rows + 2 * halo

    cp_d = pltpu.make_async_copy(
        d_hbm.at[b, pl.ds(i * tile_rows, rows), :], d_vmem, sems.at[0]
    )
    cp_v = pltpu.make_async_copy(
        v_hbm.at[b, pl.ds(i * tile_rows, rows), :], v_vmem, sems.at[1]
    )
    cp_d.start()
    cp_v.start()
    cp_d.wait()
    cp_v.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    g = i * tile_rows + row - halo
    # Out-of-image rows/lanes are pinned invalid every step: their
    # validity must not evolve (a zero-pad edge in the XLA form), and
    # invalid cells contribute nothing (dv = d*v = 0).
    in_img = ((g >= 0) & (g < height) & (lane < img_w)).astype(jnp.float32)
    zero = jnp.zeros((rows, width), jnp.float32)

    def nb_sum(x):
        # right + left + down + up, in ops/costvolume.fill_invalid's
        # float addition order.  Circular-roll wraparound: the left
        # neighbor of lane 0 must be the zero pad (mask); the right
        # neighbor of lane img_w-1 reads a pad lane, which in_img
        # pinning already holds at 0 — except when img_w == width (no
        # pad lanes), where the wrap reads REAL lane 0 and must be
        # masked.  Row wraparound only pollutes the outermost halo rows
        # (> steps from every output row).
        right = pltpu.roll(x, width - 1, 1)
        if img_w == width:
            right = jnp.where(lane == img_w - 1, zero, right)
        left = jnp.where(lane == 0, zero, pltpu.roll(x, 1, 1))
        down = pltpu.roll(x, rows - 1, 0)
        up = pltpu.roll(x, 1, 0)
        return right + left + down + up

    def one_step(_, state):
        d, v = state
        v = v * in_img
        dv = d * v
        num = nb_sum(dv)
        den = nb_sum(v)
        avg = num / jnp.maximum(den, 1.0)
        newly = (v == 0.0) & (den > 0.0)
        return (
            jnp.where(newly, avg, d),
            jnp.where(newly, jnp.float32(1.0), v),
        )

    init = (d_vmem[:], v_vmem[:] * in_img)
    final_d, _ = jax.lax.fori_loop(0, steps, one_step, init)
    out_ref[0] = final_d[halo : halo + tile_rows]


def fill_invalid_pallas(
    disparity: jnp.ndarray,
    valid: jnp.ndarray,
    iterations: int = 16,
    tile_rows: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused ops/costvolume.fill_invalid: float32, same shape as
    ``disparity`` ([H, W] or [B, H, W]); bit-identical to the XLA form
    (same neighbor-sum order, same IEEE divide).  One HBM read of the
    (disparity, validity) planes and one write of the result replace
    the XLA form's per-sweep traffic."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = disparity.ndim == 2
    if squeeze:
        disparity, valid = disparity[None], valid[None]
    if iterations == 0:
        out = disparity.astype(jnp.float32)
        return out[0] if squeeze else out
    bsz, h, w = disparity.shape
    wp = _round_up(w, 128)
    halo = _round_up(iterations, 4)
    tile_rows = max(8, min(_round_up(tile_rows, 8), _round_up(h, 8)))
    hp = _round_up(h, tile_rows)
    pad = ((0, 0), (halo, hp - h + halo), (0, wp - w))
    d_pad = jnp.pad(disparity.astype(jnp.float32), pad)
    v_pad = jnp.pad(valid.astype(jnp.float32), pad)
    kernel = functools.partial(
        _fill_invalid_kernel,
        tile_rows=tile_rows,
        halo=halo,
        width=wp,
        img_w=w,
        height=h,
        steps=iterations,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, hp // tile_rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(
            (1, tile_rows, wp), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_rows + 2 * halo, wp), jnp.float32),
            pltpu.VMEM((tile_rows + 2 * halo, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(d_pad, v_pad)
    out = out[:, :h, :w]
    return out[0] if squeeze else out


def fill_web_holes_pallas(
    web: jnp.ndarray,
    times: int,
    tile_rows: int = 256,
    interpret: Optional[bool] = None,
    value_bound: Optional[int] = None,
    _packed_fields: bool = False,
    with_range: bool = False,
):
    """Fused diffusion -> int32, same shape as ``web`` ([H, W] or
    [B, H, W]).  Any width (lanes pad to the 128 tile internally).

    ``value_bound``: caller-proven exclusive upper bound on the web's
    values (the classic pipeline's winner plane is bounded by
    num_shifts).  When it fits 14 bits, batched inputs pack TWO images
    into each int32 plane (16+16 bit fields) so every roll and DMA of
    this roll-throughput-bound kernel serves two images — bit-exact,
    because per-field sums stay below the field boundary.

    ``with_range``: also return (min, max) of each output image
    ([bsz] int32, scalars for 2-D input) — the global reduction the
    contour phase needs, folded in the kernel's epilogue while the web
    tile is still in VMEM."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    steps = max(times - 1, 0)
    squeeze = web.ndim == 2
    if squeeze:
        web = web[None]
    bsz, h, w = web.shape
    wp = _round_up(w, 128)
    if steps == 0:
        out = web.astype(jnp.int32)
        if with_range:
            mn, mx = out.min(axis=(1, 2)), out.max(axis=(1, 2))
            return (out[0], mn[0], mx[0]) if squeeze else (out, mn, mx)
        return out[0] if squeeze else out

    packed = (
        value_bound is not None
        and 0 <= value_bound < (1 << 14)
        and not squeeze
        and bsz >= 2
    )
    if packed:
        web32 = web.astype(jnp.int32)
        if bsz % 2:
            web32 = jnp.concatenate([web32, web32[-1:]], axis=0)
        hi, lo = web32[0::2], web32[1::2]
        inner = fill_web_holes_pallas(
            (hi << 16) | lo, times, tile_rows, interpret, value_bound=None,
            _packed_fields=True, with_range=with_range,
        )
        if with_range:
            inner, mnp, mxp = inner
        out = jnp.stack([inner >> 16, inner & 0xFFFF], axis=1)
        out = out.reshape(-1, h, w)[:bsz]
        if with_range:
            # Field-wise tile reductions, interleaved back to batch
            # order (image 2k rode the hi field of plane k).
            mn = jnp.stack(
                [(mnp >> 16).min(axis=(1, 2)), (mnp & 0xFFFF).min(axis=(1, 2))],
                axis=1,
            ).reshape(-1)[:bsz]
            mx = jnp.stack(
                [(mxp >> 16).max(axis=(1, 2)), (mxp & 0xFFFF).max(axis=(1, 2))],
                axis=1,
            ).reshape(-1)[:bsz]
            return out, mn, mx
        return out

    halo = _round_up(steps, 4)
    # Shrink row tiles until the two chains' working set (~8 live
    # [tile+2*halo, wp] arrays per chain + the shared input block) fits
    # the VMEM budget — wide images would otherwise blow the scoped
    # allocation (observed 29.7 MB at W=1920, tile 256).
    vmem_limit = 64 << 20

    def _fit(budget: int) -> int:
        t = max(8, min(_round_up(tile_rows, 8), _round_up(h, 8)))
        while t > 8:
            est = wp * 4 * (
                2 * (t + 2 * halo) * 8 + (2 * t + 2 * halo) * 3
            )
            if est <= budget:
                break
            t -= 8
        return t

    tile_rows_fit = _fit(44 << 20)
    if tile_rows_fit < 2 * halo:
        # Halo-dominated tiles: every tile recomputes (tile+2*halo)/tile
        # x its payload across all `steps` — at 8K the 44 MB budget
        # forced 8-row tiles under a 62-row halo (8.75x recompute,
        # measured 45 ms/pair, 62% of the end-to-end — the round-4 size
        # ladder's 94x -> 47x droop).  Escalate toward the 128 MB
        # physical VMEM before paying that redundancy.
        vmem_limit = 100 << 20
        tile_rows_fit = _fit(80 << 20)
    tile_rows = tile_rows_fit
    # Two interleaved chains per grid step when the image has at least
    # two tiles (ILP for the latency-bound step chain).
    chains = 2 if h > tile_rows else 1
    super_rows = chains * tile_rows
    hp = _round_up(h, super_rows)
    w_pad = jnp.pad(
        web.astype(jnp.int32), ((0, 0), (halo, hp - h + halo), (0, wp - w))
    )
    n_super = hp // super_rows

    static = dict(
        tile_rows=tile_rows,
        halo=halo,
        width=wp,
        img_w=w,
        height=h,
        steps=steps,
        chains=chains,
        packed=_packed_fields,
    )
    web_spec = pl.BlockSpec(
        (1, super_rows, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((super_rows + 2 * halo, wp), jnp.int32),
        pltpu.SemaphoreType.DMA((1,)),
    ]
    common = dict(
        grid=(bsz, n_super),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )
    if with_range:
        acc_spec = pl.BlockSpec(
            (1, 8, 128), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
        out, mn, mx = pl.pallas_call(
            functools.partial(_kernel_range, **static),
            out_specs=(web_spec, acc_spec, acc_spec),
            out_shape=(
                jax.ShapeDtypeStruct((bsz, hp, wp), jnp.int32),
                jax.ShapeDtypeStruct((bsz, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((bsz, 8, 128), jnp.int32),
            ),
            scratch_shapes=scratch
            + [
                pltpu.VMEM((2, 8, 128), jnp.int32),
                pltpu.VMEM((2, 8, 128), jnp.int32),
            ],
            **common,
        )(w_pad)
        out = out[:, :h, :w]
        if _packed_fields:
            return out, mn, mx  # field tiles; the packed caller unpacks
        mn = mn.min(axis=(1, 2))
        mx = mx.max(axis=(1, 2))
        return (out[0], mn[0], mx[0]) if squeeze else (out, mn, mx)
    out = pl.pallas_call(
        functools.partial(_kernel, **static),
        out_specs=web_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.int32),
        scratch_shapes=scratch,
        **common,
    )(w_pad)
    out = out[:, :h, :w]
    return out[0] if squeeze else out
