"""The classic pipeline — single-chip JAX/XLA tier.

One jitted function covering the reference's whole ``algorithm()``
(src/stereo.c:287-333): edges -> shift matching + windowed scoring +
argmax (fused scan, ops/argmax.py) -> diffusion -> contour.  Both
boundary modes.  Batched via vmap over a leading pairs axis.

The distributed tier (parallel/) shards this same computation over a
(data, rows) mesh; the Pallas tier (ops/fused.py) replaces the scan body
with a VMEM-resident fused kernel.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from stereomatching_tpu.config import StereoParams
from stereomatching_tpu.ops.argmax import match_and_score, match_and_score_collect
from stereomatching_tpu.ops.contour import contour_bands, draw_contour
from stereomatching_tpu.ops.diffusion import fill_web_holes
from stereomatching_tpu.ops.edges import find_edges


def classic_forward(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoParams,
    use_pallas: bool = False,
    tile_rows: int | None = None,
    subpixel: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full pipeline on one brightness pair [H, W] -> artifact dict.
    Trace-time params; wrap in jit via ``build_classic_pipeline``.
    ``use_pallas`` routes the fused cost-volume phase through the VMEM
    Pallas kernel (ops/fused.py) instead of the XLA scan — with the
    "exact" edge rule the edge stencil runs inside the same kernel
    (brightness in, no edge-map HBM round trips); ``tile_rows``
    overrides the kernel's batch-aware auto tiling.

    ``subpixel`` (opt-in extension beyond the reference) adds a
    float32 "subpixel" artifact: the winning shift parabola-refined on
    its neighbor scores (ops/argmax.match_and_score_subpixel; carried
    through the fused kernel on the Pallas tiers).  All reference
    artifacts stay bit-identical."""
    sub = None
    if use_pallas and params.edge_rule == "exact":
        from stereomatching_tpu.ops.fused import match_score_edges_pallas

        best, winner, edges_l, edges_r, *sub = match_score_edges_pallas(
            left, right, params, tile_rows=tile_rows, subpixel=subpixel
        )
        web, min_e, max_e = _fill_web_holes_auto(
            winner, params.times, params.num_shifts, with_range=True
        )
        out = contour_bands(web, params.lines, min_e, max_e)
    elif use_pallas:
        from stereomatching_tpu.ops.fused import match_and_score_pallas

        edges_l = find_edges(left, params.threshold, params.mode, params.edge_rule)
        edges_r = find_edges(right, params.threshold, params.mode, params.edge_rule)
        best, winner, *sub = match_and_score_pallas(
            edges_l, edges_r, params, tile_rows=tile_rows, subpixel=subpixel
        )
        web, min_e, max_e = _fill_web_holes_auto(
            winner, params.times, params.num_shifts, with_range=True
        )
        out = contour_bands(web, params.lines, min_e, max_e)
    else:
        edges_l = find_edges(left, params.threshold, params.mode, params.edge_rule)
        edges_r = find_edges(right, params.threshold, params.mode, params.edge_rule)
        if subpixel:
            from stereomatching_tpu.ops.argmax import match_and_score_subpixel

            best, winner, s = match_and_score_subpixel(edges_l, edges_r, params)
            sub = [s]
        else:
            best, winner = match_and_score(edges_l, edges_r, params)
        web = fill_web_holes(winner, params.times)
        out, min_e, max_e = draw_contour(web, params.lines)
    res = {
        "edges-1": edges_l,
        "edges-2": edges_r,
        "score_best": best,
        "web-1": winner,
        "web-2": web,
        "output-0": out,
        "min_elevation": min_e,
        "max_elevation": max_e,
    }
    if subpixel:
        res["subpixel"] = sub[0]
    return res


def _fill_web_holes_auto(
    winner: jnp.ndarray, times: int, num_shifts: int, with_range: bool = False
):
    """Fused Pallas diffusion (any width — lanes pad internally);
    bit-identical to the XLA scan.  The winner plane is bounded by
    num_shifts, which lets batched calls pack two images per int32.
    ``with_range`` also folds each image's min/max in the kernel
    epilogue (the contour phase's global reduction)."""
    from stereomatching_tpu.ops.fused_diffusion import fill_web_holes_pallas

    return fill_web_holes_pallas(
        winner, times, value_bound=num_shifts + 1, with_range=with_range
    )


def _classic_forward_batched_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoParams,
    tile_rows: int | None = None,
    subpixel: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched pipeline routed through the Pallas kernels.  The kernels
    take the batch as a grid dimension (they cannot be vmapped: Mosaic
    ANY-space inputs are not partitionable by the batcher), so only the
    XLA phases are vmapped."""
    if params.edge_rule == "exact":
        from stereomatching_tpu.ops.fused import match_score_edges_pallas

        best, winner, edges_l, edges_r, *sub = match_score_edges_pallas(
            left, right, params, tile_rows=tile_rows, subpixel=subpixel
        )
    else:
        from stereomatching_tpu.ops.fused import match_and_score_pallas

        ef = jax.vmap(
            lambda x: find_edges(x, params.threshold, params.mode,
                                 params.edge_rule)
        )
        edges_l = ef(left)
        edges_r = ef(right)
        best, winner, *sub = match_and_score_pallas(
            edges_l, edges_r, params, tile_rows=tile_rows, subpixel=subpixel
        )
    web, min_e, max_e = _fill_web_holes_auto(
        winner, params.times, params.num_shifts, with_range=True
    )
    out = jax.vmap(
        lambda wb, mn, mx: contour_bands(wb, params.lines, mn, mx)
    )(web, min_e, max_e)
    res = {
        "edges-1": edges_l,
        "edges-2": edges_r,
        "score_best": best,
        "web-1": winner,
        "web-2": web,
        "output-0": out,
        "min_elevation": min_e,
        "max_elevation": max_e,
    }
    if subpixel:
        res["subpixel"] = sub[0]
    return res


def classic_forward_batched(
    left: jnp.ndarray,
    right: jnp.ndarray,
    params: StereoParams,
    use_pallas: bool = False,
    tile_rows: int | None = None,
    subpixel: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batched [B, H, W] pipeline, traceable inside an outer jit."""
    if use_pallas:
        return _classic_forward_batched_pallas(left, right, params, tile_rows,
                                               subpixel)
    return jax.vmap(
        functools.partial(classic_forward, params=params, subpixel=subpixel)
    )(left, right)


def build_classic_pipeline(
    params: StereoParams,
    batched: bool = False,
    use_pallas: bool = False,
    tile_rows: int | None = None,
    subpixel: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Jitted pipeline for fixed params.  With ``batched=True`` the inputs
    carry a leading pairs axis [B, H, W] (the throughput mode of
    BASELINE.md config 4) — per-pair contour min/max via vmap.
    ``subpixel`` adds the opt-in refined-disparity artifact
    (classic_forward)."""
    if batched and use_pallas:
        return jax.jit(
            functools.partial(
                _classic_forward_batched_pallas, params=params,
                tile_rows=tile_rows, subpixel=subpixel,
            )
        )
    fn = functools.partial(
        classic_forward, params=params, use_pallas=use_pallas,
        tile_rows=tile_rows, subpixel=subpixel,
    )
    if batched:
        fn = jax.vmap(fn)
    return jax.jit(fn)


def classic_finish(
    winner: jnp.ndarray,
    params: StereoParams,
    use_pallas: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The finishing phases alone — diffusion + contour from a
    post-argmax winner web [H, W].  The resume entry point: the
    reference's phase dumps double as restartable state
    (src/stereo.c:302-320); here the CLI's ``--resume`` feeds a saved
    ``web-1`` checkpoint back through exactly these phases, and the
    result is bit-identical to the uninterrupted run (the phases are
    pure integer functions of the winner web)."""
    if use_pallas:
        web, min_e, max_e = _fill_web_holes_auto(
            winner, params.times, params.num_shifts, with_range=True
        )
        out = contour_bands(web, params.lines, min_e, max_e)
    else:
        web = fill_web_holes(winner, params.times)
        out, min_e, max_e = draw_contour(web, params.lines)
    return {
        "web-2": web,
        "output-0": out,
        "min_elevation": min_e,
        "max_elevation": max_e,
    }


def build_classic_finish_pipeline(
    params: StereoParams, use_pallas: bool = False
) -> Callable[[jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Jitted ``classic_finish`` for fixed params (CLI ``--resume``)."""
    return jax.jit(
        functools.partial(classic_finish, params=params, use_pallas=use_pallas)
    )


def build_classic_collect_pipeline(
    params: StereoParams,
) -> Callable[[jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Artifact-collecting variant: additionally returns the stacked
    per-shift planes (matches/score_all/scores, [D, H, W]) the reference
    dumps in debug builds — the cross-implementation golden surface."""

    def forward(left: jnp.ndarray, right: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        edges_l = find_edges(left, params.threshold, params.mode, params.edge_rule)
        edges_r = find_edges(right, params.threshold, params.mode, params.edge_rule)
        matches, sums, scores, best, winner = match_and_score_collect(
            edges_l, edges_r, params
        )
        web = fill_web_holes(winner, params.times)
        out, min_e, max_e = draw_contour(web, params.lines)
        return {
            "edges-1": edges_l,
            "edges-2": edges_r,
            "matches": matches,
            "score_all": sums,
            "scores": scores,
            "score_best": best,
            "web-1": winner,
            "web-2": web,
            "output-0": out,
            "min_elevation": min_e,
            "max_elevation": max_e,
        }

    return jax.jit(forward)
