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
        right_c = pltpu.roll(cur, width - 1, 1)
        if img_w == width:
            right_hop = right_c  # [r, img_w-1] is already cur[r, 0]
        else:
            right_hop = pltpu.roll(cur, img_w - 1, 1)
        right = jnp.where(
            lane == img_w - 1, pltpu.roll(right_hop, rows - 1, 0), right_c
        )
        # Flat p-1: lane l-1, except lane 0 takes lane img_w-1 of the
        # row above.
        left_c = pltpu.roll(cur, 1, 1)
        if img_w == width:
            left_hop = left_c  # [r, 0] is already cur[r, img_w-1]
        else:
            left_hop = pltpu.roll(cur, (1 + width - img_w) % width, 1)
        left = jnp.where(lane == 0, pltpu.roll(left_hop, 1, 0), left_c)
        up = pltpu.roll(cur, 1, 0)  # row y-1
        down = pltpu.roll(cur, rows - 1, 0)  # row y+1
        avg = (right + down + left + up) // 4
        return jnp.where(cur == 0, avg, prev) * in_img

    def one_step(_, carry):
        return tuple(
            (cur, advance(cur, prev, mask))
            for (prev, cur), mask in zip(carry, masks)
        )

    init = tuple((x0, x0) for x0 in x0s)
    final = jax.lax.fori_loop(0, steps, one_step, init)
    for c in range(chains):
        out_ref[0, c * tile_rows : (c + 1) * tile_rows, :] = final[c][1][
            halo : halo + tile_rows, :
        ]


def fill_web_holes_pallas(
    web: jnp.ndarray,
    times: int,
    tile_rows: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused diffusion -> int32, same shape as ``web`` ([H, W] or
    [B, H, W]).  Any width (lanes pad to the 128 tile internally)."""
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
        return out[0] if squeeze else out

    halo = _round_up(steps, 4)
    # Shrink row tiles until the two chains' working set (~8 live
    # [tile+2*halo, wp] arrays per chain + the shared input block) fits
    # the VMEM budget — wide images would otherwise blow the scoped
    # allocation (observed 29.7 MB at W=1920, tile 256).
    budget = 44 << 20
    tile_rows = max(8, min(_round_up(tile_rows, 8), _round_up(h, 8)))
    while tile_rows > 8:
        est = wp * 4 * (
            2 * (tile_rows + 2 * halo) * 8 + (2 * tile_rows + 2 * halo) * 3
        )
        if est <= budget:
            break
        tile_rows -= 8
    # Two interleaved chains per grid step when the image has at least
    # two tiles (ILP for the latency-bound step chain).
    chains = 2 if h > tile_rows else 1
    super_rows = chains * tile_rows
    hp = _round_up(h, super_rows)
    w_pad = jnp.pad(
        web.astype(jnp.int32), ((0, 0), (halo, hp - h + halo), (0, wp - w))
    )
    n_super = hp // super_rows

    kernel = functools.partial(
        _kernel,
        tile_rows=tile_rows,
        halo=halo,
        width=wp,
        img_w=w,
        height=h,
        steps=steps,
        chains=chains,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_super),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, super_rows, wp), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hp, wp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((super_rows + 2 * halo, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(w_pad)
    out = out[:, :h, :w]
    return out[0] if squeeze else out
