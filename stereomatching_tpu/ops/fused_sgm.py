"""Pallas TPU kernel: the SGM directional recurrence, VMEM-resident.

The XLA formulation (ops/sgm.py) is a ``lax.scan`` of W sequential steps
of small [H, D] work — each step is its own dispatched fusion, and at
1 MP x 64 d the four directions cost ~97 ms/pair on a v5e chip.  Here
each direction is ONE kernel: the cost volume is laid out scan-major
[S, D, P] (scan dim leading, disparities on sublanes, the perpendicular
axis on lanes), the grid walks column strips with Pallas's automatic
double-buffered HBM->VMEM pipelining, and the carry L[s-1] — a [D, P]
plane — lives in scratch that persists across grid steps.  Per step:

    m        = min_d' L[s-1]                  (sublane reduction)
    best     = min(L, min(L_up, L_dn) + P1, m + P2)
    L[s]     = C[s] + best - m

exactly ops/sgm._directional's step (same _BIG padding, int32), so the
results are bit-identical (tests/test_sgm.py).  Both scan directions
come from the same kernel: the reverse pass maps grid step s to strip
n-1-s and walks the strip backwards.

The vertical directions are the same kernel on the [H, D, W] layout;
the horizontal ones on [W, D, H] (one XLA transpose of the volume).
Padding: D pads to the sublane tile with _BIG (never wins a min),
P to the lane tile (independent scan lanes, sliced away); S is never
padded — the strip size always divides S (a non-divisor strip made the
host-side pad materialize full volume copies, the round-3 OOM find).

Late-round-2 structure (measured on chip, see docs/DESIGN.md "The VMEM
staging floor"): the strip walk runs CHUNK-MAJOR by default — lane
chunks in the outer loop, columns inside, carries as register-class
values (1.7-2.2x the full-plane walk, which staged every step op's
[D, P] plane through VMEM); the reverse pass folds the forward pass's
output into its stores (no XLA add pass); and the argmin/sub-pixel/
right-view tail is its own one-pass kernel (sgm_tail_pallas) instead
of three XLA volume passes.

Round-3 additions: int8 STORAGE (quarter DMA traffic; census-class
bounds, power-of-2 D), an opt-in bf16 lattice (measured end-to-end
slower than int16 — see models/modern._sgm_storage_dtype), and
DIAGONAL directions (``lane_shift``): an 8-path aggregation's four
diagonals ride the same vertical scan-major volume with a one-lane
carry roll per step, image boundaries injecting the all-sentinel
column so the recurrence collapses to L = C exactly at path starts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**28  # matches ops/sgm._BIG
# int8 folded-sum bias: a per-axis direction sum is bounded by
# 2 * (max_cost + p2) <= 252 under the tiny_values contract
# (max_cost + p2 < 127), so sum - 128 spans [-128, 124] — exactly
# representable in int8.  Consumers add the bias back (exact).
_FOLD_BIAS = 128
# bf16 padding sentinel: any value > the caller-asserted 256 bound works
# (it only needs ORDER, not exactness: padded D rows must never win a
# min).  512 and 512 +- p1/p2 neighborhoods stay > 256 under bf16
# rounding, and pad-row L values only grow (L_pad = 512 + best - m with
# best >= m), so the sentinel can never leak into real rows.
_SOFT_BIG = 512


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll_lanes(x, shift):
    """Lane roll that also legalizes for bf16: Mosaic has no sub-32-bit
    lane rotates, so 16-bit lattices round-trip through f32 (exact for
    the <= 512 integer values these kernels carry)."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift, 1)
    return pltpu.roll(x.astype(jnp.float32), shift, 1).astype(x.dtype)


def _kernel(
    vol_ref,  # [xc, Dp, Pp] VMEM block (current strip)
    *rest,  # ([add_ref,] out_ref, carry)
    xc: int,
    p1: int,
    p2: int,
    reverse: bool,
    fold: bool = False,
    fold_bias: int = 0,
    chunk_lanes: int | None = None,
    lane_shift: int = 0,
    lane_period: int = 0,
    seeded: bool = False,
    with_carry: bool = False,
    folded_tree: bool = False,
    wide_add: bool = False,
):
    """The strip walk is Python-unrolled with the carry as a VALUE —
    scratch is read once and written once per strip (not per column).
    The strip count always divides S (the caller picks a divisor, which
    also keeps the host-side pad a no-op), so the recurrence init is
    simply the first column of the first processed strip — a
    strip-level branch, and the steady-state column loop has no
    conditionals at all.

    ``fold``: a second input block (the opposite direction's already-
    computed pass) is ADDED to each stored column, so the kernel writes
    the per-axis direction sum directly — the XLA add pass (two reads +
    one write of the full volume) disappears.

    ``wide_add``: a THIRD input block in the fold-output dtype (an
    already-summed direction-pair total, e.g. the vertical axis sum)
    is also added per stored column — same-scan-major direction sums
    CHAIN through the passes instead of meeting in the XLA merge, and
    the caller aliases this operand to the output
    (donate_wide), so the chain runs in ONE int16 buffer.  Sum bound:
    the caller asserts directions * (max_cost + p2) fits the fold
    dtype (models/modern._sgm_out_dtype's rule).

    ``chunk_lanes``: process the strip CHUNK-MAJOR — each chunk of
    lanes runs the whole strip's column chain with its carry and every
    intermediate as a small register-class value, touching VMEM only
    for the per-column c load and L store.  The full-plane form stages
    each of the ~14 step ops through VMEM (ablation: trivial step math
    still costs ~60% of the full step, tools/sgm_dir_probe.py), so the
    movement floor, not arithmetic, dominates; chunking removes it.

    ``lane_shift`` (+-1, diagonal paths): the carry rolls by one lane
    before each step — predecessor (s-1, x - lane_shift) — and lanes
    whose predecessor crosses an image boundary (x % lane_period wraps)
    take the all-sentinel column, collapsing the step to L = C exactly
    (m = best = sentinel).

    Diagonals still run CHUNK-MAJOR: chunks are processed sequentially
    in shift order (+1: left to right, so the left neighbour chunk is
    already done; -1: mirrored), each chunk's boundary-lane L
    trajectory is handed to the next chunk through a [D, xc] scratch
    column buffer, and a one-register pipeline (read slot j before
    overwriting it) resolves the read-after-overwrite hazard at column
    j vs j-1.  At a strip's first column the whole shifted carry is a
    direct offset slice of the cross-strip carry scratch."""
    rest = list(rest)
    add_ref = rest.pop(0) if fold else None
    addw_ref = rest.pop(0) if wide_add else None
    seed_ref = rest.pop(0) if seeded else None
    out_ref = rest.pop(0)
    carry_out_ref = rest.pop(0) if with_carry else None
    scratch = rest
    carry = scratch[0]
    btraj = scratch[1] if len(scratch) > 1 else None
    s = pl.program_id(0)
    idx = (lambda j: xc - 1 - j) if reverse else (lambda j: j)
    io_dt = out_ref.dtype  # stored L (or folded-sum) dtype
    st_dt = vol_ref.dtype  # strip/carry STORAGE dtype (int8/int16/bf16/int32)
    soft = st_dt == jnp.bfloat16
    narrow = st_dt != jnp.int32 and not soft
    # bf16 lattice: half the vector footprint per step op of the 16-bit
    # integer storage AND no widen/narrow converts — exact by the
    # caller's 2*(max_cost+p2) <= 256 contract (_step_math_bf16).
    step_math = _step_math_bf16 if soft else (
        _step_math_folded if folded_tree else _step_math)
    big = _SOFT_BIG if soft else _BIG

    pp = out_ref.shape[-1]
    dp_dim = out_ref.shape[1]
    wide_dt = jnp.bfloat16 if soft else jnp.int32
    bigv = jnp.asarray(big, wide_dt)

    if lane_shift:
        assert lane_shift in (-1, 1) and lane_period > 0

    def shift_carry(cv):
        # Full-plane form of the diagonal carry shift.  Lanes whose
        # predecessor x - lane_shift leaves the image (the lane roll
        # would wrap into the previous/next pair or the lane pad) take
        # the all-sentinel column: m = best = sentinel makes the step
        # degenerate to exactly L = C (path start).
        li = jax.lax.broadcasted_iota(
            jnp.int32, (dp_dim, pp), 1
        ) % lane_period
        bnd = li == (0 if lane_shift == 1 else lane_period - 1)
        rolled = _roll_lanes(cv, lane_shift % pp)
        return jnp.where(bnd, bigv, rolled)

    def run_chunks(init_at, chunk):
        n_chunks = pp // chunk
        if lane_shift:
            # Chunk-local shift machinery: `edge` is the local lane
            # receiving the neighbour chunk's boundary value, `own_bnd`
            # the lane this chunk hands to the NEXT one.
            li_loc = jax.lax.broadcasted_iota(jnp.int32, (dp_dim, chunk), 1)
            edge_mask = li_loc == (0 if lane_shift == 1 else chunk - 1)
            roll_by = 1 if lane_shift == 1 else chunk - 1
            own_bnd = (
                slice(chunk - 1, chunk) if lane_shift == 1 else slice(0, 1)
            )
            bnd_at = 0 if lane_shift == 1 else lane_period - 1

        def body(pc_raw, _):
            # Diagonal chunks run in shift order (+1: left to right, so
            # the left neighbour's trajectory is already in btraj; -1:
            # mirrored).  Plain passes are chunk-order-independent.
            pc = n_chunks - 1 - pc_raw if lane_shift == -1 else pc_raw
            base = pc * chunk
            sl = pl.ds(base, chunk)
            cv = carry[:, sl]
            if narrow:
                cv = cv.astype(jnp.int32)
            if lane_shift:
                bmask = (li_loc + base) % lane_period == bnd_at
                # The strip's first processed column shifts the
                # PREVIOUS strip's carry, whose boundary lane belongs
                # to the neighbour chunk — which has already overwritten
                # its carry slot this strip.  Each chunk therefore
                # stashes its OLD boundary into slot xc at body start;
                # the next chunk reads it before writing its own.
                # (The first chunk in processing order reads a stale
                # value, but its edge lane is always sentinel-masked:
                # lane 0 has x == 0 for +1; for -1 the edge is a pad
                # lane or x == period-1.)
                bnd_strip = btraj[:, xc : xc + 1]
                btraj[:, xc : xc + 1] = cv[:, own_bnd]
                bnd_cur = bnd_strip

                def shifted(prev, bnd):
                    rolled = _roll_lanes(prev, roll_by)
                    rolled = jnp.where(edge_mask, bnd, rolled)
                    return jnp.where(bmask, bigv, rolled)

            for j in range(xc):
                c = vol_ref[idx(j), :, sl]
                if narrow:
                    c = c.astype(jnp.int32)
                if lane_shift:
                    # One-register pipeline: slot j (the neighbour
                    # chunk's L[j] boundary) must be read before this
                    # chunk overwrites it with its own L[j].
                    bnd_next = btraj[:, j : j + 1]
                if init_at is not None and j == init_at:
                    cv = c
                elif lane_shift:
                    cv = step_math(shifted(cv, bnd_cur), c, p1, p2, big)
                else:
                    cv = step_math(cv, c, p1, p2, big)
                if lane_shift:
                    btraj[:, j : j + 1] = cv[:, own_bnd]
                    bnd_cur = bnd_next
                if fold:
                    # Sum in the wide domain, store in the fold dtype:
                    # int8 storage stores the per-axis sum BIASED by
                    # _FOLD_BIAS (sum <= 2*(max_cost+p2) <= 252, so
                    # sum - 128 is exact int8); wider storages hold the
                    # raw sum.
                    a = add_ref[idx(j), :, sl]
                    if narrow:
                        a = a.astype(jnp.int32)
                    s_val = cv + a - fold_bias if fold_bias else cv + a
                    if wide_add:
                        s_val = s_val + addw_ref[idx(j), :, sl].astype(
                            jnp.int32)
                    stored = s_val.astype(io_dt) if narrow else s_val
                else:
                    stored = cv.astype(io_dt) if narrow else cv
                out_ref[idx(j), :, sl] = stored
            carry[:, sl] = cv.astype(st_dt) if narrow else cv
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def run_full(init_at):
        # init_at: the column (processing order) whose carry just
        # copies the input (the recurrence init); None = pure
        # recurrence.  int16/int8 are STORAGE formats: strips and the
        # cross-strip carry narrow losslessly (caller contract); the
        # in-strip recurrence value stays int32.  bf16 IS the
        # arithmetic format (no converts at all).
        cv = carry[...].astype(jnp.int32) if narrow else carry[...]
        for j in range(xc):
            c = vol_ref[idx(j)]
            if narrow:
                c = c.astype(jnp.int32)
            if init_at is not None and j == init_at:
                cv = c
            else:
                prev = shift_carry(cv) if lane_shift else cv
                cv = step_math(prev, c, p1, p2, big)
            if fold:
                a = add_ref[idx(j)]
                if narrow:
                    a = a.astype(jnp.int32)
                s_val = cv + a - fold_bias if fold_bias else cv + a
                if wide_add:
                    s_val = s_val + addw_ref[idx(j)].astype(jnp.int32)
                stored = s_val.astype(io_dt) if narrow else s_val
            else:
                stored = cv.astype(io_dt) if narrow else cv
            out_ref[idx(j)] = stored
        carry[...] = cv.astype(st_dt) if narrow else cv

    if chunk_lanes is None:  # auto: widest dividing chunk (512 tops)
        chunk_lanes = next(
            (c for c in (512, 256, 128) if pp % c == 0), 0
        )
    if chunk_lanes and pp % chunk_lanes == 0 and pp > chunk_lanes:
        run = functools.partial(run_chunks, chunk=chunk_lanes)
    else:
        run = run_full

    @pl.when(s == 0)
    def _():
        if seeded:
            # Continue the recurrence from a caller-provided carry
            # (the previous shard's final carry in the phased
            # cross-shard chain): no re-init — the first column is a
            # regular step on the seed.  Diagonal passes shift the
            # seed at consumption, exactly like any cross-strip carry.
            carry[...] = seed_ref[...]
            run(None)
        else:
            run(0)

    @pl.when(s > 0)
    def _():
        run(None)

    if with_carry:
        # The recurrence's final carry (UNSHIFTED — the consumer
        # shifts, so shard hand-off is position-agnostic), for the
        # next shard in a phased chain.
        @pl.when(s == pl.num_programs(0) - 1)
        def _():
            carry_out_ref[...] = carry[...]


def sgm_directional_pallas(
    vol: jnp.ndarray,
    p1: int,
    p2: int,
    reverse: bool = False,
    strip: int = 16,
    interpret: bool | None = None,
    add_to: jnp.ndarray | None = None,
    chunk_lanes: int | None = None,
    donate_volume: bool = False,
    lane_shift: int = 0,
    lane_period: int = 0,
    seed: jnp.ndarray | None = None,
    with_carry: bool = False,
    wide_fold: bool = True,
    folded_tree: bool = False,
    add_wide: jnp.ndarray | None = None,
    donate_wide: bool = False,
) -> jnp.ndarray:
    """One directional pass over a scan-major volume [S, D, P] -> L
    [S, D, P] in vol.dtype.  ``reverse`` scans from S-1 down to 0.

    ``lane_shift`` (+-1, with ``lane_period`` = the image width the
    lane axis tiles by, P = B * period): a DIAGONAL pass — the carry
    rolls one lane per scan step (predecessor (s-1, x - lane_shift)),
    with image-boundary lanes taking the no-predecessor L = C init.
    Diagonals run chunk-major too: chunks execute sequentially in
    shift order and hand their boundary-lane trajectory to the next
    chunk through a per-column scratch slot (see _kernel).

    int16 input selects int16 strip/carry STORAGE (half the DMA
    traffic; arithmetic still int32 in-VMEM) — exact and bit-identical
    to the int32 path whenever max_cost + p2 < 16384, so the 16384
    padding sentinel never wins a min (caller contract).

    int8 input: quarter the DMA traffic; exact whenever
    max_cost + p2 < 127 (census-class costs) AND D equals its 32-row
    sublane round-up (no padded D rows — they would overflow int8
    through the recurrence).  A folded int8 pass stores the per-axis
    sum as int16 by default; ``wide_fold=False`` stores it BIASED int8
    (value - _FOLD_BIAS: the raw sum reaches 2*(max_cost+p2) <= 252,
    the biased value spans [-128, 124]; consumers add the bias back),
    which halves the fold traffic and keeps donation legal but
    measured SLOWER end-to-end (the int8-sourced merge transposes —
    round-4 A/B, docs/BENCHMARKS.md) — an opt-in probe surface.

    bfloat16 input selects the bf16 LATTICE (_step_math_bf16): the same
    16-bit DMA traffic as int16, but the recurrence runs in bf16
    directly — half the vector footprint per step op and zero
    widen/narrow converts on this latency-bound walk.  Exact (values
    identical to the int32 path after float->int conversion) whenever
    every intermediate integer fits bf16's 8 significand bits:
    2 * (max_cost + p2) <= 256 (caller contract; the tightest of the
    step/fold bounds).

    ``add_to`` (same shape/dtype, typically the opposite direction's
    output): the kernel returns L + add_to, folding the per-axis
    direction sum into the pass (caller asserts the sum fits the
    dtype).

    ``chunk_lanes``: lane width of the chunk-major strip walk (None =
    auto, 0 = full-plane).  Chunk-major runs each lane chunk through
    the whole strip with register-class carries — measured ~1.7-2.2x
    the full-plane form on chip, whose every step op stages through
    VMEM (tools/sgm_dir_probe.py ablation).

    ``seed``: a [D, P] carry (vol dtype) to CONTINUE the recurrence
    from instead of initializing at the first scanned column — the
    sharded tier's phased cross-shard chain hands each shard the
    previous shard's final carry (parallel/modern).  Diagonal passes
    take the UNSHIFTED carry and shift it at consumption, exactly as
    the in-kernel cross-strip hand-off does.  ``with_carry``: also
    return the final (unshifted) [D, P] carry, for seeding the next
    shard.  Seeded or carry-returning passes are bit-identical to
    slicing one long unsharded pass at the shard boundary
    (tests/test_sgm.py::test_directional_seed_carry_chain).

    ``add_wide`` (folded passes only): a second addend in the FOLD
    OUTPUT dtype — an already-summed direction total in the same
    scan-major layout.  Direction sums over the same volume CHAIN
    through the kernels (vertical axis sum -> first diagonal pair ->
    second) instead of meeting in the XLA merge: one merge read per
    chained term disappears, and ``donate_wide`` aliases the chain
    buffer to the output so the whole v-major accumulation lives in
    ONE int16 buffer — at 8 directions this is what lifts the batch
    ceiling (the unchained merge holds three separate int16 sums
    live).  Caller asserts the chained total fits the fold dtype
    (directions * (max_cost + p2), models/modern._sgm_out_dtype).

    ``donate_volume``: alias the volume operand to the output
    (in-place when the caller's volume is otherwise dead, e.g. the
    reverse pass of each axis — XLA inserts a copy if it is still
    live).  Grid step s reads exactly the block it writes, and the
    write-back of step s never overlaps the prefetch of step s+1 (a
    different block), so aliasing is race-free.  At 1 MP x 64 d this
    removes one volume-sized buffer per axis from peak HBM — the SGM
    batch ceiling's binding constraint (docs/BENCHMARKS.md)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    s, d, p = vol.shape
    if lane_shift:
        if lane_shift not in (-1, 1):
            raise ValueError("lane_shift must be -1, 0 or 1")
        if lane_period <= 0 or p % lane_period:
            raise ValueError(
                f"lane_period {lane_period} must tile the lane axis {p}"
            )
    io16 = vol.dtype == jnp.int16
    io8 = vol.dtype == jnp.int8
    soft = vol.dtype == jnp.bfloat16
    st_dt = vol.dtype if (io16 or io8 or soft) else jnp.int32
    # int8 STORAGE (quarter the DMA traffic): sentinel 127 must exceed
    # every real L <= max_cost + p2 (caller contract), and D must equal
    # the 32-row int8 sublane tile's power-of-2 round-up — padded D rows
    # would overflow int8 through the recurrence (L_pad = 127 + best - m
    # > 127) and wrap into min-winning garbage.
    big_pad = _SOFT_BIG if soft else (
        127 if io8 else (16384 if io16 else _BIG))
    sub = 32 if io8 else (16 if (io16 or soft) else 8)
    dp = max(sub, 1 << (d - 1).bit_length())  # pow2 min tree
    if io8 and dp != d:
        raise ValueError(
            f"int8 storage needs D == its sublane round-up ({dp}), got {d}"
        )
    pp = _round_up(p, 128)
    # Strip size: keep in+out double buffers within ~32 MB of VMEM
    # (vmem_limit_bytes below raises the compiler's 16 MB default;
    # fewer, larger strips amortize per-grid-step overhead in this
    # latency-bound scan).
    bytes_per_col = dp * pp * jnp.dtype(st_dt).itemsize
    xc = max(1, min(strip, (32 << 20) // (4 * bytes_per_col)))
    if add_wide is not None:
        # The chained pass stages two extra fold-width operands per
        # strip (add_wide in + the widened out); size the strip so all
        # double-buffered blocks fit the 80 MB vmem_limit (the plain
        # formula above assumes two st-width operands and blows the
        # scoped-vmem stack at wide lane counts).
        io_ratio = 2 if jnp.dtype(st_dt).itemsize == 1 else 1
        total_pc = bytes_per_col * (2 + 2 * io_ratio)
        xc = max(1, min(xc, (72 << 20) // (2 * total_pc)))
    # Prefer a strip count that DIVIDES S: otherwise the jnp.pad below
    # materializes a full copy of the volume just to round S up (seen
    # as 2x2.5 GB HLO temps at 1 MP x 64 d batch 40 — the OOM straw).
    # Worst case this walks down to xc=1, which is what the 16/32-bit
    # paths already pick at production sizes.
    while s % xc:
        xc -= 1
    vol_pad = jnp.pad(
        vol.astype(st_dt),
        ((0, 0), (0, dp - d), (0, pp - p)),
        constant_values=big_pad,
    )
    # Padded D rows hold the sentinel (never win a min); padded P lanes
    # are independent scan chains sliced off at the end.
    n_strips = s // xc

    fold = add_to is not None
    if add_wide is not None:
        if not fold:
            raise ValueError("add_wide requires a folded pass (add_to)")
        if soft:
            raise ValueError("add_wide is unsupported on the bf16 lattice")
        if wide_fold is False and io8:
            raise ValueError("add_wide requires wide_fold folds")
    # Folded (per-axis direction-sum) int8 passes store int16 by
    # default (wide_fold=True): biased-int8 fold stores (value -
    # _FOLD_BIAS, wide_fold=False) HALVE the fold write + merge read
    # traffic and restore donation, but measured 0.45 ms/pair SLOWER
    # end-to-end at 1 MP x 64 d batch 32 — the int8-sourced merge
    # transposes cost more than the traffic they save (round-4 A/B,
    # docs/BENCHMARKS.md).  Kept as an opt-in probe surface.
    fold_bias = _FOLD_BIAS if (fold and io8 and not wide_fold) else 0
    io_dt = jnp.int16 if (fold and io8 and wide_fold) else st_dt
    seeded = seed is not None
    kernel = functools.partial(
        _kernel, xc=xc, p1=p1, p2=p2, reverse=reverse,
        fold=fold, fold_bias=fold_bias, chunk_lanes=chunk_lanes,
        lane_shift=lane_shift, lane_period=lane_period,
        seeded=seeded, with_carry=with_carry, folded_tree=folded_tree,
        wide_add=add_wide is not None,
    )
    if reverse:
        index_map = lambda i: (n_strips - 1 - i, 0, 0)  # noqa: E731
    else:
        index_map = lambda i: (i, 0, 0)  # noqa: E731
    block = pl.BlockSpec((xc, dp, pp), index_map, memory_space=pltpu.VMEM)
    operands = [vol_pad]
    in_specs = [block]
    if fold:
        if add_to.shape != vol.shape or add_to.dtype != st_dt:
            raise ValueError("add_to must match the volume's shape/dtype")
        # Pad values don't matter (pad rows/lanes are sliced off);
        # zeros keep the pad finite.
        operands.append(
            jnp.pad(add_to, ((0, 0), (0, dp - d), (0, pp - p)))
        )
        in_specs.append(block)
    if add_wide is not None:
        if add_wide.shape != vol.shape or add_wide.dtype != io_dt:
            raise ValueError(
                f"add_wide must be the volume's shape in the fold "
                f"dtype {io_dt}, got {add_wide.shape} {add_wide.dtype}"
            )
        operands.append(
            jnp.pad(add_wide, ((0, 0), (0, dp - d), (0, pp - p)))
        )
        in_specs.append(
            pl.BlockSpec((xc, dp, pp), index_map, memory_space=pltpu.VMEM)
        )
    if seeded:
        if seed.shape != (d, p) or seed.dtype != st_dt:
            raise ValueError(
                f"seed must be [{d}, {p}] in the storage dtype, got "
                f"{seed.shape} {seed.dtype}"
            )
        # Pad rows take the sentinel (they must keep losing mins, as
        # in the volume pad); pad lanes are independent junk chains.
        operands.append(
            jnp.pad(seed, ((0, dp - d), (0, pp - p)),
                    constant_values=big_pad)
        )
        in_specs.append(
            pl.BlockSpec((dp, pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
    if donate_volume and io_dt != st_dt:
        # No byte-compatible buffer to reuse (cannot happen with the
        # current io_dt ladder; kept as a guard for future fold modes).
        donate_volume = False
    scratch = [pltpu.VMEM((dp, pp), st_dt)]
    if lane_shift:
        # Boundary-lane trajectory handoff between neighbour chunks:
        # one slot per strip column plus the cross-strip stash (slot
        # xc), in the widened domain.
        wide = jnp.bfloat16 if soft else jnp.int32
        scratch.append(pltpu.VMEM((dp, max(xc + 1, 128)), wide))
    out_specs = block
    out_shape = jax.ShapeDtypeStruct((s, dp, pp), io_dt)
    if with_carry:
        out_specs = [
            block,
            pl.BlockSpec((dp, pp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((dp, pp), st_dt)]
    if donate_wide and add_wide is not None and donate_volume:
        # One output buffer, one alias: the chained int16 sum is the
        # bigger/more-reusable buffer — it wins.
        donate_volume = False
    aliases = {}
    if donate_volume:
        aliases[0] = 0
    if donate_wide and add_wide is not None:
        # The chained-sum operand is byte-compatible with the output
        # (same shape, fold dtype) and each grid step reads exactly
        # the block it overwrites — same race-free pattern as
        # donate_volume.  Operand order: vol 0, add_to 1, add_wide 2.
        aliases[2] = 0
    out = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=80 * 2**20),
        interpret=interpret,
        input_output_aliases=aliases,
    )(*operands)
    if with_carry:
        out, carry = out
        return out[:s, :d, :p], carry[:d, :p]
    return out[:s, :d, :p]


def _roll_sub(x, shift):
    """Sublane roll that also legalizes for 16-bit dtypes: Mosaic has no
    sub-32-bit rotates and rejects shape-changing bitcasts in-kernel
    (probed on the axon backend), so 16-bit lattices round-trip through
    f32 — exact for the <= 512 integer values these kernels carry."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, shift, 0)
    return pltpu.roll(x.astype(jnp.float32), shift, 0).astype(x.dtype)


def _min_over_d_bf16(x):
    """_min_over_d for a bf16 [D, P] plane: static slices stop at the
    16-row sublane tile (an 8-row bf16 slice is sub-tile and would
    relayout), then a 4-level butterfly (8/4/2/1) via the bitcast roll
    leaves the min in all 16 sublanes; whole-tile copies broadcast back
    up to [D, P]."""
    d = x.shape[0]
    n = d
    while n > 16:
        n //= 2
        x = jnp.minimum(x[:n], x[n:])
    for sh in (8, 4, 2, 1):
        x = jnp.minimum(x, _roll_sub(x, sh))
    if d > 16:
        x = jnp.concatenate([x] * (d // 16), axis=0)
    return x


def _step_math_bf16(prev, c, p1, p2, big):
    """_step_math on bf16 planes — exact whenever every intermediate
    integer fits bf16's 8 significand bits (<= 256; the caller asserts
    max(2*max_cost + p2, max_cost + 2*p2) <= 256): min/add of exactly-
    representable integers are exact, so results are bit-identical to
    the int32 path after widening.  No widen/narrow relayouts and half
    the vector footprint per tile of the 16-bit lattice."""
    d = prev.shape[0]
    m = _min_over_d_bf16(prev)
    di = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    bigc = jnp.asarray(big, prev.dtype)
    up = jnp.where(di == d - 1, bigc, _roll_sub(prev, d - 1))
    dn = jnp.where(di == 0, bigc, _roll_sub(prev, 1))
    best = jnp.minimum(
        jnp.minimum(prev, jnp.minimum(up, dn) + jnp.asarray(p1, prev.dtype)),
        m + jnp.asarray(p2, prev.dtype),
    )
    # c + (best - m), NOT (c + best) - m: best - m <= p2 is always a
    # small exact integer, so the sum stays under the 256 bound even
    # when m is the 512 no-predecessor sentinel (diagonal path
    # boundaries inject an all-sentinel carry so that L degenerates to
    # exactly c; (c + 512) - 512 would round).  Bit-identical for all
    # in-bound values.
    return c + (best - m)


def _min_over_d(x):
    """min over the sublane (D) axis, returned PRE-BROADCAST as a full
    [D, P] plane.  Every op is sublane-tile aligned: a halving tree of
    static slices down to one (8, P) tile (slice offsets 8, 16, 32 ...
    are tile multiples), then a butterfly of sublane rotations (shifts
    4/2/1) that leaves the tile-wide min in ALL 8 sublanes, then whole-
    tile copies back up to [D, P].  The naive tree's last three levels
    slice at sub-tile offsets (4, 2, 1 sublanes) and a [1, P] result
    must re-broadcast — both force Mosaic relayouts of the full plane
    on every sequential step of this latency-bound kernel."""
    d = x.shape[0]
    n = d
    while n > 8:
        n //= 2
        x = jnp.minimum(x[:n], x[n:])
    for sh in (4, 2, 1):
        x = jnp.minimum(x, pltpu.roll(x, sh, 0))
    if d > 8:
        x = jnp.concatenate([x] * (d // 8), axis=0)
    return x


def _step_math(prev, c, p1, p2, big):
    """One recurrence step (ops/sgm._directional's body) on an int32
    [D, P] carry (int16 storage widens before calling: Mosaic has no
    int16 min/reductions).  The d+-1 neighbours come from full-lattice
    sublane rotations; instead of an iota-masked select pinning each
    wrapped row to the sentinel, a CONSTANT penalty plane (p1
    everywhere, big at the wrapped row) is added to the rolled carry —
    the compiler hoists the plane, so each select+add pair becomes one
    add (wrapped rows become carry + big + p1 >= big, which loses every
    min exactly as the selected sentinel did; no overflow: carry <= big
    and 2 * big + p1 fits int32).  Bit-identical to the masked form."""
    d = prev.shape[0]
    m = _min_over_d(prev)
    di = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    k_up = jnp.where(di == d - 1, big, p1)
    k_dn = jnp.where(di == 0, big, p1)
    up = pltpu.roll(prev, d - 1, 0) + k_up
    dn = pltpu.roll(prev, 1, 0) + k_dn
    best = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn)), m + p2)
    return c + best - m


def _min_over_d_folded(x):
    """_min_over_d WITHOUT the broadcast-back: returns the sublane-axis
    min as one (8, P) tile (min replicated in all 8 sublanes) for
    consumers that can fold their remaining ops over the 8-sublane tile
    groups (_step_math_folded) — the concatenate broadcast back to
    [D, P] is D/8 - 1 whole-tile copies per step on a latency-bound
    chain, pure overhead when the consumer can broadcast in-register."""
    n = x.shape[0]
    while n > 8:
        n //= 2
        x = jnp.minimum(x[:n], x[n:])
    for sh in (4, 2, 1):
        x = jnp.minimum(x, pltpu.roll(x, sh, 0))
    return x


def _step_math_folded(prev, c, p1, p2, big):
    """_step_math with the tree-min kept at its (8, P) tile width: the
    final min / subtract / add run on a (D/8, 8, P) view against the
    (1, 8, P) tile — the reshape is a pure re-indexing of the sublane
    tiles (no data movement) and the leading-dim broadcast reuses the
    tile registers, so the D/8 - 1 broadcast copies AND nothing else
    change: bit-identical to _step_math."""
    d = prev.shape[0]
    m8 = _min_over_d_folded(prev)
    di = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    up = jnp.where(di == d - 1, big, pltpu.roll(prev, d - 1, 0))
    dn = jnp.where(di == 0, big, pltpu.roll(prev, 1, 0))
    w = jnp.minimum(prev, jnp.minimum(up, dn) + p1)
    if d <= 8:
        return c + jnp.minimum(w, m8[:d] + p2) - m8[:d]
    g = d // 8
    p = prev.shape[1]
    wf = w.reshape(g, 8, p)
    cf = c.reshape(g, 8, p)
    best = jnp.minimum(wf, (m8 + p2)[None])
    return (cf + (best - m8[None])).reshape(d, p)


def _volume_kernel(
    l_ref,  # [1, hc, Wo] left cost-input plane (census codes / pixels)
    r_ref,  # [1, hc, Wr] right plane, LEFT-extended by D (edge) + pad
    out_ref,  # [1, D, hc, Wo]
    *,
    d_count: int,
    cost: str,
):
    """Per-pixel cost volume build with the cost inputs VMEM-resident:
    the XLA stacked build re-reads the two code planes from HBM once
    per disparity (~64x the input bytes at D=64); here each strip is
    DMA'd once and the D windows are one circular lane roll apart.

    Window arithmetic: the right tile t = [D copies of column 0 |
    row | pad] (host-built), so window_d(x) = t[x + D - d].  Starting
    from the tile rolled left by D (window_0), each next disparity is
    ONE roll right — and because 0 <= x + D - d < Wr for every needed
    (x, d), the circular wrap always lands on the correct index."""
    l = l_ref[0]
    wr = r_ref.shape[-1]
    win = pltpu.roll(r_ref[0], (wr - d_count) % wr, 1)  # left by D
    wo = out_ref.shape[-1]
    for d in range(d_count):
        if d:
            win = pltpu.roll(win, 1, 1)
        w_now = win[:, :wo]
        if cost == "census":
            from stereomatching_tpu.ops.costvolume import popcount32

            c = popcount32(l ^ w_now)
        else:
            c = jnp.abs(l - w_now)
        out_ref[0, d] = c.astype(out_ref.dtype)


def sgm_volume_pallas(
    ref: jnp.ndarray,
    other: jnp.ndarray,
    d_count: int,
    cost: str = "census",
    dtype=jnp.int16,
    row_strip: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """models/modern._sgm_volume(layout="dhw") with the build fused in
    VMEM: [(B,) H, W] int32 cost-input planes (census codes for census,
    pixel intensities for SAD) -> the disparity-major volume
    [(B,) D, H, W] in ``dtype`` — bit-identical values to the XLA
    stacked build.  Requires W % 128 == 0 (the volume's W axis feeds
    scan-major relayouts and must carry no lane padding).

    PRODUCTION volume builder since round 4: with the aggregation
    consuming pre-layouted scan-major volumes (aggregate_from_scan_
    major), this builder + two XLA transposes measures 2.12 ms/pair at
    1 MP x 64 d batch 16 vs 2.65 for the v-major builder + one
    transpose (the v-major kernel's per-disparity single-sublane
    scatter stores cost more than the transpose they avoid) and vs
    2.72 for the round-3 XLA stacked build (which re-reads the code
    planes once per output tile of each fused transpose) —
    checksum-identical throughout (tools/r4_probe.py --exp volroute)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = ref.ndim == 2
    if squeeze:
        ref, other = ref[None], other[None]
    b, h, w = ref.shape
    if w % 128:
        raise ValueError(f"W {w} must be a lane-tile multiple (got pad)")
    hc = min(row_strip, _round_up(h, 8))
    hp = _round_up(h, hc)
    wr = _round_up(w + d_count, 128)
    l_pad = jnp.pad(ref, ((0, 0), (0, hp - h), (0, 0)))
    # Left-extend by exactly D columns of column 0 (the _extend_left
    # clamp), right-pad to the lane tile (never read).
    r_ext = jnp.concatenate(
        [jnp.repeat(other[:, :, :1], d_count, axis=2), other], axis=2
    )
    r_pad = jnp.pad(r_ext, ((0, 0), (0, hp - h), (0, wr - w - d_count)))
    kernel = functools.partial(_volume_kernel, d_count=d_count, cost=cost)
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // hc),
        in_specs=[
            pl.BlockSpec((1, hc, w), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, wr), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, d_count, hc, w), lambda bi, si: (bi, 0, si, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d_count, hp, w), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(l_pad, r_pad)
    out = out[:, :, :h, :]
    return out[0] if squeeze else out


def _vmajor_volume_kernel(
    l_ref,  # [1, hc, Wo] left cost-input plane (census codes / pixels)
    r_ref,  # [1, hc, Wr] right plane, LEFT-extended by D (edge) + pad
    out_ref,  # [hc, D, Wo] — one batch element's row strip, v-scan-major
    *,
    d_count: int,
    cost: str,
):
    """_volume_kernel with the stores turned 90°: the per-disparity
    [hc, W] cost plane lands at out_ref[:, d, :], so the kernel emits
    the VERTICAL scan-major layout [H, D, B*W] the directional passes
    consume — no host-side relayout of the d-major volume, and the cost
    inputs are DMA'd once per strip instead of XLA's build-into-
    transpose fusion re-reading the code planes once per output tile
    (the ~8 B/element read term in bench/roofline.sgm_phase_models).
    The d-indexed store is a strided sublane write (Mosaic relayouts it
    in-register — measured cheaper than the HBM round-trip it
    replaces)."""
    l = l_ref[0]
    wr = r_ref.shape[-1]
    win = pltpu.roll(r_ref[0], (wr - d_count) % wr, 1)  # left by D
    wo = out_ref.shape[-1]
    for d in range(d_count):
        if d:
            win = pltpu.roll(win, 1, 1)
        w_now = win[:, :wo]
        if cost == "census":
            from stereomatching_tpu.ops.costvolume import popcount32

            c = popcount32(l ^ w_now)
        else:
            c = jnp.abs(l - w_now)
        out_ref[:, d, :] = c.astype(out_ref.dtype)


def sgm_volume_vmajor_pallas(
    ref: jnp.ndarray,
    other: jnp.ndarray,
    d_count: int,
    cost: str = "census",
    dtype=jnp.int16,
    row_strip: int = 64,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Cost volume built DIRECTLY in the vertical scan-major layout:
    [B, H, W] int32 cost-input planes (census codes for census, pixel
    intensities for SAD) -> [H, D, B*W] in ``dtype`` — the exact
    vol_v operand of aggregate_from_scan_major, with the batch folded
    into lanes.  Bit-identical values to the XLA stacked build
    (models/modern._sgm_volume(layout="dhw")) followed by the
    transpose; requires W % 128 == 0 (each batch element must own a
    whole number of lane tiles) and H % row-strip divisibility is
    handled internally.

    Replaces the d-major build + vol_v relayout of the round-3 route:
    one pass that reads each code plane once and writes the volume
    once (the horizontal layout vol_h is one XLA transpose away —
    models/modern._sgm_scan_major_volumes)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if ref.ndim != 3:
        raise ValueError("sgm_volume_vmajor_pallas takes batched [B, H, W]")
    b, h, w = ref.shape
    if w % 128:
        raise ValueError(f"W {w} must be a lane-tile multiple")
    # The input blocks' sublane dim is hc, so Mosaic needs hc % 8 == 0
    # (a divisor-of-H chooser picked 60 at H=1080 and failed to lower);
    # keep hc an 8-multiple and round H up to it — padded rows compute
    # junk from zero inputs and are sliced off below, exactly as the
    # d-major builder does.
    hc = min(max(8, row_strip // 8 * 8), _round_up(h, 8))
    hp = _round_up(h, hc)
    wr = _round_up(w + d_count, 128)
    l_pad = jnp.pad(ref, ((0, 0), (0, hp - h), (0, 0)))
    # Left-extend by exactly D columns of column 0 (the _extend_left
    # clamp), right-pad to the lane tile (never read).
    r_ext = jnp.concatenate(
        [jnp.repeat(other[:, :, :1], d_count, axis=2), other], axis=2
    )
    r_pad = jnp.pad(
        r_ext, ((0, 0), (0, hp - h), (0, wr - w - d_count))
    )
    kernel = functools.partial(
        _vmajor_volume_kernel, d_count=d_count, cost=cost
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // hc),
        in_specs=[
            pl.BlockSpec((1, hc, w), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc, wr), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Out lanes are B*W: block (hc, D, W) at lane-block index bi
        # covers exactly batch element bi's W lanes (W % 128 == 0).
        out_specs=pl.BlockSpec(
            (hc, d_count, w), lambda bi, si: (si, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((hp, d_count, b * w), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(l_pad, r_pad)
    return out[:h]


_ARGBIG = 2**30  # matches ops/costvolume._BIG (argmin sentinels)
_SGM_BIG = _BIG  # ops/sgm._BIG — the uniqueness pass's sentinel


def _tail_kernel(
    vol_ref,  # [1, D, hc, Wp] VMEM block (lane pad = edge-replicated)
    disp_ref,  # [1, hc, Wo]
    sub_ref,
    cost_ref,
    dr_ref,
    c2_ref=None,  # with_uniqueness: [1, hc, Wo] second-best cost
    *,
    d_count: int,
    wo: int,
    chunk: int = 128,
):
    """Fused argmin + sub-pixel + right-view re-projection over one row
    strip of the aggregated volume: ONE read of the strip computes what
    ops/sgm.volume_argmin_subpixel and right_disparity_from_left_volume
    take two full volume passes (plus an edge-extended copy) to produce.

    CHUNK-MAJOR (the VMEM-staging-floor lesson, docs/DESIGN.md): the
    outer loop walks ``chunk``-lane output windows, the disparity loop
    runs inside on register-class [hc, chunk+pad(D)] values.  Each
    step's window load covers the re-projection reach, so the
    right-view slice cost_L(x+d, d) is a left-rotation of the window by
    d lanes that never wraps into the output lanes; the host's
    edge-replicated lane padding makes rotated-in lanes the clamped
    last-column value (no per-step masks).

    (A round-4 attempt to fold the LR consistency mask in here via a
    log-shift gather of dR at x - dL was abandoned: conditional
    power-of-two rolls do NOT compose into a variable gather — after
    one level, lane j + k's value encodes lane j + k's residual shift,
    not lane j's (tools/r4_probe-era numpy disproof).  The LR lookup
    stays in XLA, restructured as a 2-op accumulator scan in
    ops/costvolume.lr_consistency.)"""
    hc = vol_ref.shape[2]
    win = chunk + _round_up(d_count, 128)  # slide reach, lane-tiled
    shape = (hc, chunk)
    big = jnp.full(shape, _ARGBIG, jnp.int32)
    zero = jnp.zeros(shape, jnp.int32)

    def chunk_body(pc, _):
        c0 = pc * chunk
        # Left-view argmin carries (argmin_subpixel_scan semantics:
        # first minimum wins, neighbors tracked for the parabola).
        best, best_d, c_left, c_right, c_prev = big, zero, big, big, big
        was_new = zero
        # Right-view carries (right_disparity_from_left_volume).
        best_r, dr = big, zero
        for d in range(d_count):
            w_d = vol_ref[0, d, :, pl.ds(c0, win)].astype(jnp.int32)
            c = w_d[:, :chunk]
            c_right = jnp.where(was_new == 1, c, c_right)
            is_new = c < best
            best = jnp.where(is_new, c, best)
            best_d = jnp.where(is_new, d, best_d)
            c_left = jnp.where(is_new, c_prev, c_left)
            c_right = jnp.where(is_new, big, c_right)
            c_prev = c
            was_new = is_new.astype(jnp.int32)
            # cost_R(x, d) = cost_L(x + d, d): rotate the window left
            # by d; output lanes j < chunk read j + d < win (no wrap).
            cr_view = (pltpu.roll(w_d, win - d, 1) if d else w_d)[:, :chunk]
            r_new = cr_view < best_r
            best_r = jnp.where(r_new, cr_view, best_r)
            dr = jnp.where(r_new, d, dr)
        # Parabola refine (argmin_subpixel_scan's epilogue, bit-for-bit).
        cl = c_left.astype(jnp.float32)
        cm = best.astype(jnp.float32)
        cr = c_right.astype(jnp.float32)
        denom = cl - 2.0 * cm + cr
        valid = (c_left < _ARGBIG) & (c_right < _ARGBIG) & (denom > 0)
        offset = jnp.where(
            valid, (cl - cr) / jnp.where(valid, 2.0 * denom, 1.0), 0.0
        )
        offset = jnp.clip(offset, -0.5, 0.5)
        sl = pl.ds(c0, chunk)
        disp_ref[0, :, sl] = best_d
        sub_ref[0, :, sl] = best_d.astype(jnp.float32) + offset
        cost_ref[0, :, sl] = best
        dr_ref[0, :, sl] = dr
        if c2_ref is not None:
            # Second pass over the SAME VMEM-resident strip: min cost
            # outside the winner's +-1 neighborhood (the uniqueness
            # numerator) — no extra HBM traffic, just D more loads of
            # resident data.  Sentinel is ops/sgm._BIG (2^28), NOT the
            # argmin carries' _ARGBIG, so pixels where every disparity
            # is excluded (D <= 3) emit the same bits as
            # ops/sgm.second_best_outside_neighborhood.
            c2 = jnp.full(shape, _SGM_BIG, jnp.int32)
            for d in range(d_count):
                c = vol_ref[0, d, :, pl.ds(c0, chunk)].astype(jnp.int32)
                c2 = jnp.minimum(
                    c2, jnp.where(jnp.abs(best_d - d) <= 1, _SGM_BIG, c)
                )
            c2_ref[0, :, sl] = c2
        return 0

    jax.lax.fori_loop(0, wo // chunk, chunk_body, 0)


def tail_lane_pad(d: int) -> int:
    """Lane padding the tail kernel's re-projection windows need past
    the real width: the full slide reach, lane-tile rounded."""
    return _round_up(d, 128)


def sgm_tail_pallas(
    vol: jnp.ndarray,
    interpret: bool | None = None,
    row_strip: int = 64,
    real_width: int | None = None,
    with_uniqueness: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused SGM tail over a disparity-major aggregated volume
    [(B,) D, H, W] (int16 or int32) -> (disparity int32, subpixel f32,
    cost int32, disparity_right int32), each [(B,) H, W].
    ``with_uniqueness`` appends a fifth plane: the minimum cost outside
    the winner's +-1 neighborhood (int32; the c2 of the uniqueness
    confidence), from a second pass over the VMEM-resident strip —
    bit-identical to ops/sgm.second_best_outside_neighborhood.

    Bit-identical to ops/sgm.volume_argmin_subpixel(layout="dhw") +
    right_disparity_from_left_volume(layout="dhw") but in ONE pass over
    the volume: those XLA D-step scans read the volume twice and
    materialize an edge-extended copy for the re-projection; here every
    strip block is DMA'd once and all four planes fall out of the same
    loop.

    ``real_width``: the volume arrives ALREADY edge-padded to
    round_up(real_width, 128) + tail_lane_pad(d) lanes (the producer
    folded the pad into its own output fusion, e.g.
    aggregate_from_scan_major(tail_padded=True)) — skips this
    function's full-volume pad copy, the peak-HBM straw at large
    batch."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    b, d, h, w = vol.shape
    if real_width is not None:
        if w != _round_up(real_width, 128) + tail_lane_pad(d):
            raise ValueError(
                f"pre-padded volume width {w} does not match "
                f"real_width {real_width} + pad"
            )
        w = real_width
    # Lane pad: every output chunk's window needs the full slide reach
    # past it, edge-replicated so rotated-in values ARE the clamped
    # re-projection reads (lane-tile rounded).
    wo = _round_up(w, 128)
    wp = wo + tail_lane_pad(d)
    # Row strip: the input window d*hc*wp*itemsize is double-buffered —
    # cap it inside the 96 MB scoped-VMEM limit or large-D volumes blow
    # the compile (D=256 at 1920 lanes allocated 142 MB with hc=64,
    # seen on the reference's 1080p pair at 16x disparity range).
    isz = jnp.dtype(vol.dtype).itemsize
    hc_cap = (72 << 20) // (2 * d * wp * isz)
    hc = min(row_strip, _round_up(h, 16), max(16, hc_cap // 16 * 16))
    hp = _round_up(h, hc)
    vol_p = jnp.pad(vol, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    if real_width is None:
        vol_p = jnp.pad(vol_p, ((0, 0), (0, 0), (0, 0), (0, wp - w)),
                        mode="edge")
    kernel = functools.partial(_tail_kernel, d_count=d, wo=wo)
    n_strips = hp // hc
    out_spec = pl.BlockSpec(
        (1, hc, wo), lambda bi, si: (bi, si, 0), memory_space=pltpu.VMEM
    )
    out_dts = [jnp.int32, jnp.float32, jnp.int32, jnp.int32]
    if with_uniqueness:
        out_dts.append(jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, d, hc, wp), lambda bi, si: (bi, 0, si, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=[out_spec] * len(out_dts),
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wo), dt) for dt in out_dts
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(vol_p)
    outs = tuple(o[:, :h, :w] for o in outs)
    if squeeze:
        outs = tuple(o[0] for o in outs)
    return outs


def sgm_aggregate_pallas(
    vol: jnp.ndarray,
    p1: int = 8,
    p2: int = 96,
    interpret: bool | None = None,
    small_values: bool = False,
    soft_values: bool = False,
    tiny_values: bool = False,
    layout: str = "hwd",
    out_dtype=None,
    tail_padded: bool = False,
    directions: int = 4,
    cost_bound: int | None = None,
) -> jnp.ndarray:
    """SGM aggregation of an int32 cost volume [H, W, D] (or a batch
    [B, H, W, D]) -> int32, same shape; bit-identical to
    ops/sgm.sgm_aggregate per pair.  ``directions``: 4 (default) or 8
    (adds Hirschmüller's diagonal paths — the four extra passes ride
    the vertical scan-major volume with a per-step carry lane shift).

    ``layout="dhw"`` takes and returns the disparity-major [(B,) D, H,
    W] instead — the scan-major relayouts cost the same from either
    side, but D-major output feeds the argmin/LR tail's D-step scans
    with contiguous [H, W] slices (ops/sgm.volume_argmin_subpixel).

    Batches stack into the kernel's LANE axis (scan chains are
    independent per lane, so per-pair results are unchanged bits):
    the directional recurrence is latency-bound — per-step cost is
    nearly flat in lane width — so B pairs per call cost close to one.

    ``small_values`` (caller asserts max cost + p2 < 16384) selects
    int16 STORAGE for the directional passes — half the HBM/DMA traffic
    of this bandwidth-heavy stage; arithmetic stays int32 in VMEM, so
    results are bit-identical to the int32 path.

    ``soft_values`` (caller asserts 2 * (max_cost + p2) <= 256, e.g.
    census costs with standard penalties) selects the bf16 LATTICE for
    the directional passes: the int16 path's halved DMA traffic PLUS
    half the vector footprint per recurrence op and no widen/narrow
    converts — same values as the int32 path (every intermediate
    integer is bf16-exact under the bound).  Overrides small_values.
    Measured end-to-end SLOWER than int16 on chip (docs/BENCHMARKS.md
    round 3) — kept as an opt-in probe surface.

    ``tiny_values`` (caller asserts max_cost + p2 < 127 AND
    num_disparities is a power of two >= 32) selects int8 STORAGE for
    the volume relayouts and directional passes — QUARTER the HBM/DMA
    traffic of this bandwidth-heavy stage; the folded per-axis sums
    store int16 (biased-int8 folds measured slower end-to-end, see
    sgm_directional_pallas's wide_fold).  Overrides small_values and
    soft_values.

    ``out_dtype`` (default int32) narrows the summed output — exact
    when the caller's direction-sum bound directions*(max_cost + p2)
    fits the dtype (models/modern._sgm_out_dtype); same VALUES, half
    the HBM write + downstream tail read at int16."""
    if p1 < 0 or p2 < p1:
        raise ValueError("need 0 <= p1 <= p2")
    if layout not in ("hwd", "dhw"):
        raise ValueError(f"layout must be hwd or dhw, got {layout!r}")
    if directions not in (4, 8):
        raise ValueError("directions must be 4 or 8")
    if small_values and p2 >= 16384:
        small_values = False
    if soft_values and 2 * p2 > 256:
        soft_values = False
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[None]
    if layout == "dhw":
        b, d, h, w = vol.shape
    else:
        b, h, w, d = vol.shape
    if tiny_values and (p2 >= 127 or d < 32 or d != 1 << (d - 1).bit_length()):
        tiny_values = False
    vol = vol.astype(
        jnp.int8 if tiny_values
        else (jnp.bfloat16 if soft_values
              else (jnp.int16 if small_values else jnp.int32))
    )
    # Scan-major layouts with the batch folded into lanes.
    if layout == "dhw":
        vol_v = jnp.transpose(vol, (2, 1, 0, 3)).reshape(h, d, b * w)
        vol_h = jnp.transpose(vol, (3, 1, 0, 2)).reshape(w, d, b * h)
    else:
        vol_v = jnp.transpose(vol, (1, 3, 0, 2)).reshape(h, d, b * w)
        vol_h = jnp.transpose(vol, (2, 3, 0, 1)).reshape(w, d, b * h)
    out = aggregate_from_scan_major(
        vol_v, vol_h, b, p1=p1, p2=p2, interpret=interpret,
        small_values=small_values,
        out_dtype=out_dtype, layout=layout, tail_padded=tail_padded,
        directions=directions, cost_bound=cost_bound,
    )
    return out[0] if squeeze else out


def aggregate_from_scan_major(
    vol_v: jnp.ndarray,
    vol_h: jnp.ndarray,
    batch: int,
    p1: int = 8,
    p2: int = 96,
    interpret: bool | None = None,
    small_values: bool = False,
    out_dtype=None,
    layout: str = "dhw",
    tail_padded: bool = False,
    directions: int = 4,
    wide_fold: bool = True,
    cost_bound: int | None = None,
) -> jnp.ndarray:
    """sgm_aggregate_pallas's core on PRE-LAYOUTED scan-major volumes
    (``vol_v`` [H, D, B*W], ``vol_h`` [W, D, B*H]) — callers that can
    build these directly (models/modern builds them straight from the
    census planes) skip materializing the [B, D, H, W] volume and its
    two relayout transposes.  -> the 4-direction sum in ``layout``
    ([B, D, H, W] for "dhw", [B, H, W, D] for "hwd"), int32 or
    ``out_dtype``.

    ``tail_padded`` (dhw only): emit the lane-padded layout
    sgm_tail_pallas(real_width=w) consumes — the edge-replicated
    re-projection pad rides the merge's own output fusion instead of
    costing a second full-volume pad copy downstream.

    The scan-major inputs are treated as DONATED: each axis's reverse
    pass overwrites its then-dead volume in place (donate_volume), so
    callers must not keep ``vol_v``/``vol_h`` live after this call —
    XLA would silently reinstate the volume-sized defensive copy the
    donation exists to remove.

    ``cost_bound``: upper bound on the cost volume's per-element value
    (models/modern._sgm_cost_bound).  At 8 directions with int16
    storage it gates the chained accumulation, whose total reaches
    6 * (cost_bound + p2) in the int16 fold buffer — without it the
    chain is conservatively disabled for int16 volumes (bit-identical
    unchained merge, higher peak memory)."""
    if tail_padded and layout != "dhw":
        raise ValueError("tail_padded requires layout='dhw'")
    h, d, bw = vol_v.shape
    w, _, bh = vol_h.shape
    b = batch
    assert bw == b * w and bh == b * h, (vol_v.shape, vol_h.shape, b)
    acc = jnp.int32 if out_dtype is None else out_dtype
    io8 = vol_v.dtype == jnp.int8 and not wide_fold
    bias = jnp.asarray(_FOLD_BIAS, acc)

    def unbias(x):
        # int8 folds arrive biased by _FOLD_BIAS (sgm_directional_
        # pallas); the constant add fuses into the merge expression.
        x = x.astype(acc)
        return x + bias if io8 else x

    run = functools.partial(
        sgm_directional_pallas, p1=p1, p2=p2, interpret=interpret,
        wide_fold=wide_fold,
    )
    # The reverse pass folds the forward output into its stores
    # (exact: the per-axis sum is <= 2x the directional bound, which
    # fits the io dtype by the small_values / biased-int8 contract)
    # and reuses the then-dead volume buffer in place (donate_volume)
    # — one volume less at peak HBM per axis, which is what capped
    # the batch at 28 (docs/BENCHMARKS.md).
    lr = unbias(run(vol_h, reverse=True, add_to=run(vol_h),
                    donate_volume=True))
    diags = []
    chain = vol_v.dtype != jnp.bfloat16 and not io8
    if directions == 8 and chain:
        # The chained v-major accumulation reaches 6 * (max_cost + p2)
        # in the FOLD buffer, but int16 storage's small_values contract
        # only bounds the 2x per-axis sum (< 2^15 via max_cost + p2 <
        # 16384) — for max_cost + p2 > 5461 the chained adds would wrap
        # silently.  Chain only when the caller's cost_bound PROVES the
        # 6x total fits; otherwise fall back to the unchained merge
        # (bit-identical, three live per-axis sums).  int8 volumes fold
        # into int16 with max_cost + p2 < 127 by contract — always fits.
        fold_dt = jnp.int16 if vol_v.dtype == jnp.int8 else vol_v.dtype
        if fold_dt == jnp.int16:
            if vol_v.dtype == jnp.int8:
                step_bound = 126
            elif cost_bound is not None:
                step_bound = cost_bound + p2
            else:
                step_bound = 16383  # small_values contract worst case
            chain = 6 * step_bound < 2 ** 15
    if directions == 8 and chain:
        # The four diagonal paths ride the SAME vertical scan-major
        # volume with a per-step carry lane shift.  Predecessors:
        # r=(1,1) -> fwd shift +1; r=(1,-1) -> fwd shift -1;
        # r=(-1,-1) -> rev shift -1; r=(-1,1) -> rev shift +1.
        # Each opposing pair folds into one output like the axes do —
        # and ALL v-major direction sums (vertical axis + both
        # diagonal pairs) CHAIN through the folded passes' add_wide
        # operand into ONE donated int16 buffer: two merge reads and
        # two live volume-sized int16 buffers disappear vs the
        # unchained form (its three separate sums set the 8-direction
        # batch ceiling at 16; chained, batch 32 fits).  Chained total
        # <= 6 * (max_cost + p2), within the caller's out-dtype bound
        # (directions * (max_cost + p2)).
        tb_s = run(vol_v, reverse=True, add_to=run(vol_v))
        dg = functools.partial(run, lane_period=w)
        v1 = dg(vol_v, lane_shift=-1, reverse=True,
                add_to=dg(vol_v, lane_shift=1), add_wide=tb_s,
                donate_wide=True)
        tb = unbias(dg(vol_v, lane_shift=1, reverse=True,
                       add_to=dg(vol_v, lane_shift=-1), add_wide=v1,
                       donate_wide=True, donate_volume=True))
    elif directions == 8:
        # Biased-int8 fold stores (wide_fold=False probe surface) and
        # the bf16 lattice cannot chain (fold io is int8 / bf16);
        # keep the unchained form.
        tb = unbias(run(vol_v, reverse=True, add_to=run(vol_v)))
        dg = functools.partial(run, lane_period=w)
        diags.append(unbias(dg(vol_v, lane_shift=-1, reverse=True,
                               add_to=dg(vol_v, lane_shift=1))))
        diags.append(unbias(dg(vol_v, lane_shift=1, reverse=True,
                               add_to=dg(vol_v, lane_shift=-1),
                               donate_volume=True)))
    else:
        tb = unbias(run(vol_v, reverse=True, add_to=run(vol_v),
                        donate_volume=True))
    if layout == "dhw":
        unfold_v = lambda x: jnp.transpose(  # noqa: E731
            x.reshape(h, d, b, w), (2, 1, 0, 3)
        )
        out = jnp.transpose(lr.reshape(w, d, b, h), (2, 1, 3, 0)) + (
            unfold_v(tb)
        )
        for dgs in diags:
            out = out + unfold_v(dgs)
        if tail_padded:
            # Edge-replicate to round_up(w,128) + tail_lane_pad(d)
            # lanes inside this same expression: XLA fuses the
            # concatenate with both transpose-add operands (the edge
            # strip re-derives only the last real column), so the
            # padded volume is the ONLY materialization.
            pad = _round_up(w, 128) + tail_lane_pad(d) - w
            out = jnp.concatenate(
                [out, jnp.broadcast_to(out[..., w - 1 :],
                                       (b, d, h, pad))],
                axis=-1,
            )
    else:
        unfold_v = lambda x: jnp.transpose(  # noqa: E731
            x.reshape(h, d, b, w), (2, 0, 3, 1)
        )
        out = jnp.transpose(lr.reshape(w, d, b, h), (2, 3, 0, 1)) + (
            unfold_v(tb)
        )
        for dgs in diags:
            out = out + unfold_v(dgs)
    return out
