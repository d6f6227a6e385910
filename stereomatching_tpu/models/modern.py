"""The modern stereo pipeline: windowed SAD + LR consistency + sub-pixel
refine + optional multi-scale cost fusion.

The BASELINE.md north-star extension of the classic binary edge matcher:
same TPU-first structure (one fused scan over disparities, no [D, H, W]
volume in HBM; see ops/costvolume.py), but matching 8-bit intensities
instead of binary edges, producing float sub-pixel disparity maps with a
validity channel.

All costs are exact int32 (absolute differences of integer pixel values,
integer box sums, integer pyramid weights), so integer disparities are
bit-identical on every backend/tier; only the final parabola offset and
the hole-filling diffusion are float32.

Multi-scale (scales=2) fuses a half-resolution cost pyramid: the cost of
disparity d adds ``coarse_weight`` x the upsampled aggregated cost of
disparity d//2 computed on 2x2-block-summed images — a static-shape
cost-volume-pyramid fusion (no data-dependent gathers, unlike classic
coarse-to-fine warping, so it maps cleanly onto XLA).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from stereomatching_tpu.config import ModernParams
from stereomatching_tpu.ops.costvolume import (
    DisparityResult,
    _aggregate,
    _extend_left,
    _extend_right,
    argmin_subpixel_scan,
    fill_invalid,
    lr_consistency,
)


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 block sum (exact integer downsample); odd edges replicate."""
    h, w = img.shape
    img = jnp.pad(img, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        img[0::2, 0::2] + img[0::2, 1::2] + img[1::2, 0::2] + img[1::2, 1::2]
    )


def _upsample2(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)[:h, :w]


def _pixel_cost(params: ModernParams):
    """Per-pixel dissimilarity: SAD (|a-b| on intensities) or census
    Hamming distance (popcount of XORed census codes) — both exact
    int32."""
    if params.cost == "census":
        from stereomatching_tpu.ops.costvolume import popcount32

        return lambda a, b: popcount32(a ^ b)
    return lambda a, b: jnp.abs(a - b)


def _maybe_census(img: jnp.ndarray, params: ModernParams) -> jnp.ndarray:
    if params.cost == "census":
        from stereomatching_tpu.ops.costvolume import census_transform

        return census_transform(img, params.census_window)
    return img


def _cost_fn(
    ref: jnp.ndarray,
    other: jnp.ndarray,
    params: ModernParams,
    reference: str,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the per-disparity aggregated-cost callback for the scan."""
    h, w = ref.shape
    half = params.window // 2
    d_count = params.num_disparities
    extend = _extend_left if reference == "left" else _extend_right
    pcost = _pixel_cost(params)
    ref_t = _maybe_census(ref, params)
    other_ext = extend(_maybe_census(other, params), d_count)

    def window_at(ext, d, shape, count):
        offset = (count - d) if reference == "left" else d
        return jax.lax.dynamic_slice(
            ext, (jnp.zeros((), d.dtype), offset), shape
        )

    if params.scales == 1:
        def cost_at(d):
            win = window_at(other_ext, d, (h, w), d_count)
            return _aggregate(pcost(ref_t, win), half)

        return cost_at

    # scales == 2: half-res pyramid level, fused by integer weight.
    # The coarse level transforms (census) the downsampled intensities.
    ref_c = _maybe_census(_downsample2(ref), params)
    other_c = _maybe_census(_downsample2(other), params)
    hc, wc = ref_c.shape
    dc_count = -(-d_count // 2)
    other_c_ext = extend(other_c, dc_count)
    weight = jnp.int32(params.coarse_weight)

    def cost_at(d):
        win = window_at(other_ext, d, (h, w), d_count)
        fine = _aggregate(pcost(ref_t, win), half)
        win_c = window_at(other_c_ext, d // 2, (hc, wc), dc_count)
        coarse = _aggregate(pcost(ref_c, win_c), half)
        return fine + weight * _upsample2(coarse, h, w)

    return cost_at


def modern_pallas_supported(params: ModernParams):
    """-> (ok, why): whether the fused VMEM kernels (ops/fused_modern.py)
    can run this config exactly.  The serving/CLI "auto" tier dispatches
    on this instead of letting the kernel raise (the kernel's bounds are
    exactness bounds, see ops/fused_modern.py docstring)."""
    if params.aggregation == "sgm":
        if params.scales != 1:
            return False, (
                "multi-scale SGM cost fusion runs on the XLA tier "
                "(the VMEM volume builders are single-scale)"
            )
        # SGM's directional recurrences have their own VMEM kernel
        # (ops/fused_sgm.py); no further bounds apply.
        return True, ""
    if params.scales != 1:
        return False, "multi-scale fusion (scales=2) runs on the XLA tier"
    if params.window > 255:
        return False, (
            f"window {params.window} > 255 exceeds the kernel's "
            "aggregation bound"
        )
    return True, ""


def disparity_one_view(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: ModernParams,
    reference: str = "left",
    use_pallas: bool = False,
) -> DisparityResult:
    """Fused disparity for one reference view; pixel planes are integer
    intensities 0..255, [H, W] (or [B, H, W] with ``use_pallas``).
    Left reference matches L(x) vs R(x-d); right reference matches
    R(x) vs L(x+d).  ``use_pallas`` routes through the VMEM kernel
    (ops/fused_modern.py; scales=1 only)."""
    if reference == "left":
        ref, other = left, right
    elif reference == "right":
        ref, other = right, left
    else:
        raise ValueError(reference)
    ref = ref.astype(jnp.int32)
    other = other.astype(jnp.int32)
    if use_pallas:
        from stereomatching_tpu.ops.fused_modern import disparity_pallas

        # The kernel consumes the cost's raw planes: census codes for
        # census (computed full-image, then extended in-kernel via the
        # clamp gather), intensities for SAD.
        if params.cost == "census":
            if ref.ndim == 3:
                tf = jax.vmap(lambda x: _maybe_census(x, params))
            else:
                tf = lambda x: _maybe_census(x, params)  # noqa: E731
            ref, other = tf(ref), tf(other)
        return disparity_pallas(ref, other, params, reference)
    cost_at = _cost_fn(ref, other, params, reference)
    return argmin_subpixel_scan(cost_at, params.num_disparities, ref.shape)


def _sgm_volume(
    left: jnp.ndarray, right: jnp.ndarray, params: ModernParams,
    layout: str = "hwd", dtype=jnp.int32,
) -> jnp.ndarray:
    """Per-pixel cost volume for the SGM path -> int32 [H, W, D]
    (``layout="dhw"``: the natural disparity-major [D, H, W] — the
    volume is BUILT d-major, so this skips a relayout; ``dtype=int16``
    writes the volume narrow when the costs fit — half the HBM
    traffic, same values)."""
    ref = _maybe_census(left.astype(jnp.int32), params)
    other = _maybe_census(right.astype(jnp.int32), params)
    h, w = ref.shape
    d_count = params.num_disparities
    other_ext = _extend_left(other, d_count)
    pcost = _pixel_cost(params)

    coarse = None
    if params.scales == 2:
        # Multi-scale fusion on the SGM route (SURVEY §7 step 6): add
        # coarse_weight x the upsampled HALF-RES per-pixel cost at d//2
        # — per-pixel (not window-aggregated like the box route's
        # pyramid) because SGM's own path aggregation supplies the
        # spatial support; the coarse level contributes a 2x2-pooled
        # matching prior that penalizes candidates inconsistent at the
        # coarser scale.  d-pairs share a coarse plane, so only
        # ceil(D/2) coarse planes are built.  Exact integers: the fused
        # cost is bounded by _sgm_cost_bound's (1 + coarse_weight)
        # factor, which also sizes the storage dtype and the chained-
        # fold gate.
        ref_c = _maybe_census(_downsample2(left.astype(jnp.int32)), params)
        other_c = _maybe_census(_downsample2(right.astype(jnp.int32)), params)
        hc, wc = ref_c.shape
        dc_count = -(-d_count // 2)
        oc_ext = _extend_left(other_c, dc_count)
        weight = jnp.int32(params.coarse_weight)
        coarse = [
            weight * _upsample2(
                pcost(ref_c, oc_ext[:, dc_count - di : dc_count - di + wc]),
                h, w,
            )
            for di in range(dc_count)
        ]

    if layout == "dhw":
        # Static slices, Python-unrolled: one fused XLA kernel writes
        # the volume once (the vmapped dynamic_slice form measured
        # ~4.5 ms/pair of pure overhead at 1 MP x 64 d).
        def fine(d):
            c = pcost(ref, other_ext[:, d_count - d : d_count - d + w])
            return c if coarse is None else c + coarse[d // 2]

        return jnp.stack(
            [fine(d).astype(dtype) for d in range(d_count)]
        )

    coarse_arr = None if coarse is None else jnp.stack(coarse)

    def cost_at(d):
        win = jax.lax.dynamic_slice(
            other_ext, (jnp.zeros((), d.dtype), d_count - d), (h, w)
        )
        c = pcost(ref, win)
        if coarse_arr is not None:
            c = c + coarse_arr[d // 2]
        return c

    vol = jax.vmap(cost_at)(jnp.arange(d_count, dtype=jnp.int32))  # [D, H, W]
    return jnp.moveaxis(vol, 0, -1)  # [H, W, D]


def _uniqueness_ratio(c2, c1):
    """Uniqueness confidence c2 / max(c1, 1) — the margin by which the
    winner beats its best out-of-neighborhood competitor (>= 1; higher
    is more confident; OpenCV SGBM thresholds this at ~1.1-1.15)."""
    return c2.astype(jnp.float32) / jnp.maximum(c1.astype(jnp.float32), 1.0)


def _fill(sub, valid, params: ModernParams, batched: bool,
          use_pallas: bool = False):
    """Hole filling for LR-invalidated pixels, per params.fill_mode:
    diffusion (fill_invalid / its fused kernel) or scanline background
    extension (ops/costvolume.fill_background — one associative_scan,
    identical on every tier, so no kernel variant is needed)."""
    if params.fill_mode == "background":
        from stereomatching_tpu.ops.costvolume import fill_background

        fn = jax.vmap(fill_background) if batched else fill_background
        return fn(sub, valid)
    if use_pallas:
        from stereomatching_tpu.ops.fused_diffusion import fill_invalid_pallas

        return fill_invalid_pallas(sub, valid, params.fill_iterations)
    fn = functools.partial(fill_invalid, iterations=params.fill_iterations)
    if batched:
        fn = jax.vmap(fn)
    return fn(sub, valid)


def _maybe_median(disp, sub, dr, params: ModernParams, batched: bool):
    """The SGM routes' median_filter hook, mirroring the box route:
    3x3 median on the left disparity/sub-pixel planes and the
    re-projected right view BEFORE LR consistency."""
    if not params.median_filter:
        return disp, sub, dr
    from stereomatching_tpu.ops.costvolume import median3x3

    med = jax.vmap(median3x3) if batched else median3x3
    return med(disp), med(sub), med(dr)


def _sgm_volume_auto(left, right, params: ModernParams, dtype):
    """d-major volume for the Pallas SGM route's FALLBACK (non-lane-
    multiple widths).  The XLA stacked build: XLA fuses it INTO the
    downstream scan-major relayout transposes (build + relayout in one
    pass), which an opaque kernel output would block — the reason the
    d-major sgm_volume_pallas was benched out of production in round
    3.  Lane-multiple widths skip this entirely: the v-major builder
    (_sgm_scan_major_volumes) emits the scan-major layout directly.
    Accepts [H, W] or batched [B, H, W]."""
    build = lambda l, r: _sgm_volume(  # noqa: E731
        l, r, params, layout="dhw", dtype=dtype
    )
    return jax.vmap(build)(left, right) if left.ndim == 3 else build(left, right)


def _sgm_scan_major_volumes(left, right, params: ModernParams, st):
    """Both scan-major volumes for the Pallas aggregation: the VMEM
    builder (ops/fused_sgm.sgm_volume_pallas) emits the d-major volume
    in ONE pass with CONTIGUOUS per-disparity stores (each code plane
    read once), and both scan-major layouts are XLA int transposes of
    it.  Measured round 4 (1 MP x 64 d batch 16, checksum-identical):
    2.12 ms/pair vs 2.65 for the v-major builder + one transpose — the
    v-major kernel's d-indexed stores are single-sublane scatters that
    Mosaic relayouts per disparity, costing more than the extra full-
    volume XLA transpose they avoid (tools/r4_probe.py --exp volroute).
    Requires W % 128 == 0 (the builder's lane-tile contract); values
    bit-identical to _sgm_volume + relayouts.

    8-direction runs keep the v-major builder + one transpose instead:
    its volume stage is ~0.5 ms/pair slower, but the d-major route
    holds THREE volume-sized buffers live during the transposes (vs
    two) and the four extra int16 diagonal folds already push 8-dir
    against the HBM ceiling (batch 24 OOMs on the d-major route)."""
    from stereomatching_tpu.ops.fused_sgm import (
        sgm_volume_pallas,
        sgm_volume_vmajor_pallas,
    )

    b, h, w = left.shape
    d_count = params.num_disparities
    tf = jax.vmap(lambda x: _maybe_census(x.astype(jnp.int32), params))
    if params.sgm_directions == 8:
        vol_v = sgm_volume_vmajor_pallas(
            tf(left), tf(right), d_count, cost=params.cost, dtype=st
        )
        vol_h = jnp.transpose(
            vol_v.reshape(h, d_count, b, w), (3, 1, 2, 0)
        ).reshape(w, d_count, b * h)
        return vol_v, vol_h
    vol = sgm_volume_pallas(
        tf(left), tf(right), d_count, cost=params.cost, dtype=st
    )  # [B, D, H, W]
    vol_v = jnp.transpose(vol, (2, 1, 0, 3)).reshape(h, d_count, b * w)
    vol_h = jnp.transpose(vol, (3, 1, 0, 2)).reshape(w, d_count, b * h)
    return vol_v, vol_h


def _sgm_tail_fused(
    agg: jnp.ndarray, params: ModernParams, real_width: int | None = None
) -> Dict[str, jnp.ndarray]:
    """The SGM tail on a disparity-major aggregated volume via the
    fused Pallas kernel (ops/fused_sgm.sgm_tail_pallas: one volume pass
    for argmin + sub-pixel + right-view re-projection); LR masking and
    hole fill are cheap [H, W] elementwise XLA.  Accepts [D, H, W] or
    a batch [B, D, H, W]; bit-identical to _sgm_tail(layout="dhw")."""
    from stereomatching_tpu.ops.fused_sgm import sgm_tail_pallas

    outs = sgm_tail_pallas(agg, real_width=real_width,
                           with_uniqueness=params.uniqueness)
    disp, sub, cost, dr = outs[:4]
    batched = agg.ndim == 4
    uniq = (
        _uniqueness_ratio(outs[4], cost) if params.uniqueness else None
    )
    disp, sub, dr = _maybe_median(disp, sub, dr, params, batched)
    lr = functools.partial(
        lr_consistency,
        max_diff=params.lr_max_diff,
        num_disparities=params.num_disparities,
        unroll=True,
    )
    if batched:
        lr = jax.vmap(lr)
    valid = lr(disp, dr)
    filled = _fill(sub, valid, params, batched, use_pallas=True)
    out = {
        "disparity": disp,
        "subpixel": sub,
        "disparity_right": dr,
        "valid": valid,
        "filled": filled,
        "cost": cost,
    }
    if uniq is not None:
        out["uniqueness"] = uniq
    return out


def _sgm_tail(
    agg: jnp.ndarray, params: ModernParams, layout: str = "hwd"
) -> Dict[str, jnp.ndarray]:
    """Aggregated volume [H, W, D] (or [D, H, W] with layout="dhw",
    the Pallas route's contiguous-slice layout) -> the SGM result dict
    (argmin + sub-pixel, right-view re-projection, LR validity, hole
    fill).  The dhw route unrolls the D-step scans (static slices +
    on-chip carries; lax.scan's HBM carry round-trips measured ~8
    ms/pair of tail time at 1 MP x 64 d)."""
    from stereomatching_tpu.ops.sgm import (
        right_disparity_from_left_volume,
        volume_argmin_subpixel,
    )

    unroll = layout == "dhw"
    disp, sub, cost = volume_argmin_subpixel(agg, layout=layout,
                                             unroll=unroll)
    dr = right_disparity_from_left_volume(agg, layout=layout, unroll=unroll)
    uniq = None
    if params.uniqueness:
        from stereomatching_tpu.ops.sgm import (
            second_best_outside_neighborhood,
        )

        uniq = _uniqueness_ratio(
            second_best_outside_neighborhood(agg, disp, layout=layout), cost
        )
    disp, sub, dr = _maybe_median(disp, sub, dr, params, batched=False)
    valid = lr_consistency(disp, dr, params.lr_max_diff, params.num_disparities)
    if params.fill_mode == "background":
        filled = _fill(sub, valid, params, batched=False)
    else:
        filled = fill_invalid(sub, valid, params.fill_iterations,
                              unroll=unroll)
    out = {
        "disparity": disp,
        "subpixel": sub,
        "disparity_right": dr,
        "valid": valid,
        "filled": filled,
        "cost": cost,
    }
    if uniq is not None:
        out["uniqueness"] = uniq
    return out


def _sgm_forward(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: ModernParams,
    use_pallas: bool = False,
) -> Dict[str, jnp.ndarray]:
    """SGM path: per-pixel costs (no window), materialized [H, W, D]
    volume, 4-direction semi-global aggregation, volume argmin +
    sub-pixel, right disparity via the standard volume re-projection.
    ``use_pallas`` routes the directional recurrences through the
    VMEM-resident kernel (ops/fused_sgm.py) — bit-identical."""
    from stereomatching_tpu.ops.sgm import sgm_aggregate

    if use_pallas and params.scales == 1:
        # One shared route with the batched entry (scan-major volumes
        # + folded directional kernels + fused tail): a single pair is
        # a batch of one — the kernels' lane chains are independent
        # per pair, so results are bit-identical either way.
        # (Multi-scale fusion stays on the XLA volume below.)
        out = _sgm_forward_batched_pallas(left[None], right[None], params)
        return {k: v[0] for k, v in out.items()}
    vol = _sgm_volume(left, right, params)
    agg = sgm_aggregate(vol, params.sgm_p1, params.sgm_p2,
                        directions=params.sgm_directions)
    return _sgm_tail(agg, params)


def _sgm_cost_bound(params: ModernParams) -> int:
    """Static per-pixel cost ceiling of the SGM volume: census Hamming
    distance is at most the code's bit count (window^2 - 1 neighbour
    bits), SAD on 8-bit intensities at most 255; multi-scale fusion
    adds coarse_weight x the same per-pixel bound from the half-res
    level (_sgm_volume)."""
    base = (
        params.census_window * params.census_window - 1
        if params.cost == "census"
        else 255
    )
    if params.scales == 2:
        base *= 1 + params.coarse_weight
    return base


def _sgm_fits_int16(params: ModernParams) -> bool:
    """Whether the directional recurrence values fit int16 STORAGE:
    L <= max_cost + p2 (the standard SGM bound), and the kernel's 16384
    padding sentinel must never win a min (ops/fused_sgm.py)."""
    return _sgm_cost_bound(params) + params.sgm_p2 < 16384


def _sgm_fits_int8(params: ModernParams) -> bool:
    """Whether the SGM volume and directional passes can use int8
    STORAGE (quarter DMA traffic): every directional value
    L <= max_cost + p2 must stay under the 127 sentinel, and
    num_disparities must equal its power-of-2 sublane round-up
    (>= 32) so no padded D rows exist to overflow int8 (see
    ops/fused_sgm.sgm_directional_pallas)."""
    d = params.num_disparities
    return (
        _sgm_cost_bound(params) + params.sgm_p2 < 127
        and d >= 32
        and d == 1 << (d - 1).bit_length()
    )


def _sgm_fits_bf16(params: ModernParams) -> bool:
    """Whether the directional recurrence can run on the bf16 LATTICE
    (ops/fused_sgm._step_math_bf16): every intermediate integer must be
    bf16-exact (<= 256).  The tightest bound is the folded per-axis
    direction sum 2 * (max_cost + p2); census costs with the default
    penalties (24 + 96 = 120) qualify, SAD (255 + p2) does not."""
    return 2 * (_sgm_cost_bound(params) + params.sgm_p2) <= 256


def _sgm_storage_dtype(params: ModernParams):
    """Narrowest exact storage dtype for the SGM volume and directional
    passes: int8 (census-class bounds, power-of-2 D) > int16 > int32.

    The bf16 lattice is deliberately NOT selected even where its 256
    bound fits: measured END-TO-END on chip (1 MP x 64 d census, batch
    28) bf16 ran 9.38 ms/pair vs int16's 8.57-8.66 — the walk itself is
    ~1% faster in bf16 (3.92 vs 3.97 ms/dir) but the volume build's
    int->float converts and the merge's float->int converts cost more
    than the lattice saves, and Mosaic's lack of 16-bit rotates forces
    f32 round-trips on every roll.  bf16 stays available via
    sgm_aggregate_pallas(soft_values=True)."""
    if _sgm_fits_int8(params):
        return jnp.int8
    if _sgm_fits_int16(params):
        return jnp.int16
    return jnp.int32


def _sgm_out_dtype(params: ModernParams):
    """Narrowest exact dtype of the aggregated direction SUM
    (<= directions * (max_cost + p2)): int16 halves the sum's HBM write
    and the tail kernel's volume read for every standard census/SAD
    config."""
    bound = params.sgm_directions * (_sgm_cost_bound(params) + params.sgm_p2)
    if bound < 2**15:
        return jnp.int16
    return jnp.int32


def _sgm_forward_batched_pallas(
    left: jnp.ndarray, right: jnp.ndarray, params: ModernParams
) -> Dict[str, jnp.ndarray]:
    """Batched SGM with ONE kernel dispatch per scan direction: the
    batch rides the kernel's lane axis, where the latency-bound
    recurrence's per-step cost is nearly flat, so B pairs cost close
    to one.  The argmin/LR tail is the fused kernel (sgm_tail_pallas).

    Volume route (round 4): lane-multiple widths build the VERTICAL
    scan-major volume directly in VMEM (_sgm_scan_major_volumes — one
    pass, each code plane read once) and transpose vol_h from it; the
    d-major volume is never materialized.  Other widths fall back to
    the XLA stacked build + sgm_aggregate_pallas's relayouts.  (The
    round-2 attempts at XLA-side scan-major builds measured slower
    both ways — transposed stack writes 12.0 ms/pair, pre-transposed
    operands 11.7 vs 9.3 — because the cost expression either
    re-evaluates or the writes lose fusion; the VMEM builder avoids
    both.)"""
    if params.scales != 1:
        raise ValueError(
            "multi-scale SGM fusion runs on the XLA tier "
            "(modern_pallas_supported gates dispatch)"
        )
    from stereomatching_tpu.ops.fused_sgm import (
        aggregate_from_scan_major,
        sgm_aggregate_pallas,
    )

    st = _sgm_storage_dtype(params)
    b, h, w = left.shape
    if w % 128 == 0:
        vol_v, vol_h = _sgm_scan_major_volumes(left, right, params, st)
        agg = aggregate_from_scan_major(
            vol_v, vol_h, b, params.sgm_p1, params.sgm_p2,
            out_dtype=_sgm_out_dtype(params), layout="dhw",
            tail_padded=True, directions=params.sgm_directions,
            cost_bound=_sgm_cost_bound(params),
        )
    else:
        vol = _sgm_volume_auto(left, right, params, st)
        agg = sgm_aggregate_pallas(
            vol, params.sgm_p1, params.sgm_p2,
            small_values=st == jnp.int16, tiny_values=st == jnp.int8,
            layout="dhw",
            out_dtype=_sgm_out_dtype(params), tail_padded=True,
            directions=params.sgm_directions,
            cost_bound=_sgm_cost_bound(params),
        )
    return _sgm_tail_fused(agg, params, real_width=w)


def modern_forward(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: ModernParams,
    use_pallas: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full modern pipeline on one pair of integer intensity planes
    [H, W] (uint8 pixel values; pass ``pixels`` not brightness).
    With ``use_pallas``, [B, H, W] batches are also accepted (the
    kernel takes the batch as a grid dimension).

    Returns: disparity (int32), subpixel (f32), disparity_right (int32),
    valid (bool, LR-consistent), filled (f32: subpixel with invalid
    pixels diffused from valid neighbors), cost (int32 at the winner).
    """
    if params.aggregation == "sgm":
        fn = functools.partial(_sgm_forward, params=params, use_pallas=use_pallas)
        if left.ndim == 3:
            if use_pallas and params.scales == 1:
                return _sgm_forward_batched_pallas(left, right, params)
            return jax.vmap(fn)(left, right)
        return fn(left, right)
    dl = disparity_one_view(left, right, params, "left", use_pallas)
    dr = disparity_one_view(left, right, params, "right", use_pallas)
    batched = left.ndim == 3
    if params.median_filter:
        from stereomatching_tpu.ops.costvolume import median3x3

        med = jax.vmap(median3x3) if batched else median3x3
        dl = dl._replace(disparity=med(dl.disparity), subpixel=med(dl.subpixel))
        dr = dr._replace(disparity=med(dr.disparity))
    lr = functools.partial(
        lr_consistency,
        max_diff=params.lr_max_diff,
        num_disparities=params.num_disparities,
        unroll=use_pallas,
    )
    if batched:
        lr = jax.vmap(lr)
    valid = lr(dl.disparity, dr.disparity)
    filled = _fill(dl.subpixel, valid, params, batched,
                   use_pallas=use_pallas)
    return {
        "disparity": dl.disparity,
        "subpixel": dl.subpixel,
        "disparity_right": dr.disparity,
        "valid": valid,
        "filled": filled,
        "cost": dl.cost,
    }


def build_modern_pipeline(
    params: ModernParams, batched: bool = False, use_pallas: bool = False
) -> Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]]:
    fn = functools.partial(modern_forward, params=params, use_pallas=use_pallas)
    if batched and not use_pallas:
        fn = jax.vmap(functools.partial(modern_forward, params=params))
    return jax.jit(fn)
