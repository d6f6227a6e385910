"""Differential tests for the Pallas fused cost-volume kernel.

Runs in Pallas interpret mode on CPU (the kernel auto-selects interpret
off-TPU); compiled-mode numerics are pinned by the same int32 arithmetic.
The oracle is the spec, as test/diff.sh's serial C is for the reference's
CUDA kernels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stereomatching_tpu.config import BoundaryMode, StereoParams
from stereomatching_tpu.oracle import pipeline as oracle
from stereomatching_tpu.ops.fused import match_and_score_pallas
from stereomatching_tpu.utils.imageio import to_brightness
from tests.util import synthetic_pair


def _edges_and_expected(params, h=48, w=64, seed=0):
    left, right = synthetic_pair(h=h, w=w, seed=seed)
    lb = to_brightness(left)
    rb = to_brightness(right)
    el = oracle.find_edges(lb, params.threshold, params.mode, rule=params.edge_rule)
    er = oracle.find_edges(rb, params.threshold, params.mode, rule=params.edge_rule)
    matches = oracle.fill_matches(el, er, params.num_shifts, params.mode)
    sums = np.stack(
        [
            oracle.box_sum(matches[i], params.square_width, params.mode)
            for i in range(params.num_shifts)
        ]
    )
    scores = oracle.record_scores(matches, sums)
    best, winner = oracle.best_and_winner(scores)
    return el, er, best, winner


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
@pytest.mark.parametrize("sw,d", [(9, 12), (21, 30), (5, 64)])
def test_fused_kernel_matches_oracle(mode, sw, d):
    params = StereoParams(square_width=sw, num_shifts=d, mode=mode, edge_rule="exact")
    el, er, best, winner = _edges_and_expected(params, h=48, w=64)
    got_best, got_winner = match_and_score_pallas(
        el.astype(np.int32), er.astype(np.int32), params, tile_rows=16
    )
    np.testing.assert_array_equal(np.asarray(got_best), best, err_msg="best")
    np.testing.assert_array_equal(np.asarray(got_winner), winner, err_msg="winner")


def test_fused_kernel_ragged_height():
    """H not divisible by tile_rows: output rows past H are sliced off."""
    params = StereoParams(square_width=9, num_shifts=8, mode=BoundaryMode.GHOST,
                          edge_rule="exact")
    el, er, best, winner = _edges_and_expected(params, h=37, w=48, seed=4)
    got_best, got_winner = match_and_score_pallas(
        el.astype(np.int32), er.astype(np.int32), params, tile_rows=16
    )
    np.testing.assert_array_equal(np.asarray(got_best), best)
    np.testing.assert_array_equal(np.asarray(got_winner), winner)


def test_fused_kernel_wrap_tall_tiles():
    """tile_rows > H exercises the single-tile path."""
    params = StereoParams(square_width=7, num_shifts=10, mode=BoundaryMode.WRAP,
                          edge_rule="exact")
    el, er, best, winner = _edges_and_expected(params, h=24, w=40, seed=2)
    got_best, got_winner = match_and_score_pallas(
        el.astype(np.int32), er.astype(np.int32), params, tile_rows=128
    )
    np.testing.assert_array_equal(np.asarray(got_best), best)
    np.testing.assert_array_equal(np.asarray(got_winner), winner)


def test_fused_kernel_batched():
    """Native batch support: [B, H, W] inputs via the grid batch dim."""
    params = StereoParams(square_width=9, num_shifts=8, mode=BoundaryMode.GHOST,
                          edge_rule="exact")
    els, ers, bests, winners = [], [], [], []
    for seed in range(3):
        el, er, best, winner = _edges_and_expected(params, h=32, w=48, seed=seed)
        els.append(el); ers.append(er); bests.append(best); winners.append(winner)
    gb, gw = match_and_score_pallas(
        np.stack(els).astype(np.int32), np.stack(ers).astype(np.int32),
        params, tile_rows=16,
    )
    np.testing.assert_array_equal(np.asarray(gb), np.stack(bests))
    np.testing.assert_array_equal(np.asarray(gw), np.stack(winners))


def test_batched_pallas_pipeline_matches_xla():
    import jax

    from stereomatching_tpu.models.classic import build_classic_pipeline
    from stereomatching_tpu.utils.imageio import to_brightness

    params = StereoParams(square_width=9, num_shifts=8, times=4, lines=4,
                          mode=BoundaryMode.GHOST, edge_rule="exact")
    pairs = [synthetic_pair(h=32, w=48, seed=s) for s in range(2)]
    l = np.stack([to_brightness(p[0], np.float32) for p in pairs])
    r = np.stack([to_brightness(p[1], np.float32) for p in pairs])
    want = jax.device_get(build_classic_pipeline(params, batched=True)(l, r))
    got = jax.device_get(
        build_classic_pipeline(params, batched=True, use_pallas=True)(l, r)
    )
    for k in ("score_best", "web-1", "web-2", "output-0"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)


def test_auto_tile_rows_batch_aware():
    """Large batch grids must cap the row tile at 192: 256-row tiles at
    the 1 MP bench shape abort with a scoped-VMEM overflow at batch >=
    32 on real hardware (the round-1 STEREO_TILE_ROWS crutch, now an
    explicit batch-aware rule + tile_rows argument)."""
    from stereomatching_tpu.ops.fused import _auto_tile_rows

    assert _auto_tile_rows(1024, 10, 64, batch=1) == 256
    assert _auto_tile_rows(1024, 10, 64, batch=16) == 256
    assert _auto_tile_rows(1024, 10, 64, batch=32) == 224
    assert _auto_tile_rows(1024, 10, 64, batch=128) == 224
    # Very wide images still shrink below the cap to fit the budget.
    assert _auto_tile_rows(7680, 10, 64, batch=1) < 256
    # And the tile_rows override plumbs through the public entry.
    left = np.zeros((32, 8, 128), np.int32)
    params = StereoParams(square_width=5, num_shifts=4, edge_rule="exact")
    best, winner = match_and_score_pallas(left, left, params, tile_rows=8)
    assert best.shape == (32, 8, 128)


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
def test_fused_kernel_x_tiled(mode):
    """x (lane) tiling must be invisible: n_x > 1 forced via a small
    x_tile on a wide-ish image, bit-equal to the untiled kernel and the
    oracle."""
    params = StereoParams(square_width=9, times=4, lines=4, num_shifts=8,
                          mode=mode, edge_rule="exact")
    el, er, want_best, want_winner = _edges_and_expected(params, h=24, w=512,
                                                         seed=11)
    best, winner = match_and_score_pallas(el, er, params, x_tile=128)
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)
    # Ragged: width not a multiple of the x tile.
    el2, er2, wb2, ww2 = _edges_and_expected(params, h=16, w=450, seed=12)
    b2, w2 = match_and_score_pallas(el2, er2, params, x_tile=128)
    np.testing.assert_array_equal(np.asarray(b2), wb2)
    np.testing.assert_array_equal(np.asarray(w2), ww2)


@pytest.mark.parametrize("row_mode", ["matmul", "chunked", "tree", "cm128"])
def test_fused_kernel_row_modes(row_mode):
    """Every selectable match-loop realization (three row-sum forms +
    the chunk-major walk, which falls back to chunked when the chunk
    geometry does not divide the width) is bit-identical."""
    params = StereoParams(square_width=21, times=4, lines=4, num_shifts=8,
                          mode=BoundaryMode.GHOST, edge_rule="exact")
    el, er, want_best, want_winner = _edges_and_expected(params, h=24, w=300,
                                                         seed=13)
    best, winner = match_and_score_pallas(el, er, params, row_mode=row_mode)
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
def test_fused_kernel_chunk_major(mode):
    """The chunk-major walk proper (width a chunk multiple, so no
    fallback) is bit-identical, both boundary modes."""
    params = StereoParams(square_width=9, times=4, lines=4, num_shifts=8,
                          mode=mode, edge_rule="exact")
    el, er, want_best, want_winner = _edges_and_expected(params, h=24, w=256,
                                                         seed=29)
    best, winner = match_and_score_pallas(el, er, params, row_mode="cm128")
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
@pytest.mark.parametrize("sw,d", [(9, 12), (21, 8)])
def test_fused_edges_kernel_matches_oracle(mode, sw, d):
    """The single-kernel (brightness-in) path: in-VMEM exact-rule edges
    + match loop, bit-equal to the oracle's separate phases."""
    from stereomatching_tpu.ops.fused import match_score_edges_pallas

    params = StereoParams(square_width=sw, num_shifts=d, mode=mode,
                          edge_rule="exact")
    left, right = synthetic_pair(h=48, w=64, seed=21)
    lb = to_brightness(left).astype(np.float32)
    rb = to_brightness(right).astype(np.float32)
    el = oracle.find_edges(lb.astype(np.float64), params.threshold, mode,
                           rule="exact")
    er = oracle.find_edges(rb.astype(np.float64), params.threshold, mode,
                           rule="exact")
    matches = oracle.fill_matches(el, er, d, mode)
    sums = np.stack([oracle.box_sum(matches[i], sw, mode) for i in range(d)])
    scores = oracle.record_scores(matches, sums)
    want_best, want_winner = oracle.best_and_winner(scores)

    best, winner, gel, ger = match_score_edges_pallas(lb, rb, params)
    np.testing.assert_array_equal(np.asarray(gel), el)
    np.testing.assert_array_equal(np.asarray(ger), er)
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
@pytest.mark.parametrize("shift_unroll", [1, 2])
def test_fused_subpixel_matches_xla(mode, shift_unroll):
    """subpixel=True carries the winner's neighbor scores through the
    fused loop; must equal ops/argmax.match_and_score_subpixel exactly
    (same parabola arithmetic on the same int scores)."""
    from stereomatching_tpu.ops.argmax import match_and_score_subpixel
    from stereomatching_tpu.ops.fused import match_and_score_pallas

    params = StereoParams(square_width=9, num_shifts=8, mode=mode,
                          edge_rule="exact")
    el, er, want_best, want_winner = _edges_and_expected(params, h=24, w=200,
                                                         seed=51)
    want_b, want_w, want_s = match_and_score_subpixel(
        jnp.asarray(el), jnp.asarray(er), params)
    best, winner, sub = match_and_score_pallas(el, er, params,
                                               shift_unroll=shift_unroll,
                                               subpixel=True)
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(want_s))


def test_fused_edges_kernel_subpixel_and_classic_surface():
    """The single-kernel path's 5th output and the classic_forward
    "subpixel" artifact (pallas vs XLA tier bit-equal)."""
    from stereomatching_tpu.models.classic import classic_forward
    from stereomatching_tpu.ops.argmax import match_and_score_subpixel
    from stereomatching_tpu.ops.edges import find_edges

    params = StereoParams(square_width=9, num_shifts=8,
                          mode=BoundaryMode.GHOST, edge_rule="exact")
    left, right = synthetic_pair(h=48, w=64, seed=23)
    lb = to_brightness(left).astype(np.float32)
    rb = to_brightness(right).astype(np.float32)
    el = find_edges(jnp.asarray(lb), params.threshold, params.mode, "exact")
    er = find_edges(jnp.asarray(rb), params.threshold, params.mode, "exact")
    _, _, want_sub = match_and_score_subpixel(el, er, params)

    res_p = classic_forward(jnp.asarray(lb), jnp.asarray(rb), params,
                            use_pallas=True, subpixel=True)
    res_x = classic_forward(jnp.asarray(lb), jnp.asarray(rb), params,
                            use_pallas=False, subpixel=True)
    np.testing.assert_array_equal(np.asarray(res_p["subpixel"]),
                                  np.asarray(want_sub))
    np.testing.assert_array_equal(np.asarray(res_x["subpixel"]),
                                  np.asarray(want_sub))
    np.testing.assert_array_equal(np.asarray(res_p["output-0"]),
                                  np.asarray(res_x["output-0"]))


@pytest.mark.parametrize("mode", [BoundaryMode.WRAP, BoundaryMode.GHOST])
def test_fused_edges_kernel_int16_storage_bit_identical(mode):
    """input_storage="int16" (narrow padded planes + in-kernel widening,
    ghost fill via the -32768 sentinel) must be the same bits as the
    int32 layout."""
    from stereomatching_tpu.ops.fused import match_score_edges_pallas

    params = StereoParams(square_width=9, num_shifts=8, mode=mode,
                          edge_rule="exact")
    left, right = synthetic_pair(h=48, w=64, seed=22)
    lb = to_brightness(left).astype(np.float32)
    rb = to_brightness(right).astype(np.float32)
    want = match_score_edges_pallas(lb, rb, params, input_storage="int32")
    got = match_score_edges_pallas(lb, rb, params, input_storage="int16")
    for w_, g_, name in zip(want, got, ("best", "winner", "el", "er")):
        np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_),
                                      err_msg=name)


def test_fused_edges_kernel_batched_and_x_tiled():
    from stereomatching_tpu.ops.fused import (
        match_and_score_pallas,
        match_score_edges_pallas,
    )
    from stereomatching_tpu.ops.edges import find_edges

    params = StereoParams(square_width=9, num_shifts=8,
                          mode=BoundaryMode.GHOST, edge_rule="exact")
    import jax

    lefts, rights = [], []
    for i in range(3):
        l, r = synthetic_pair(h=24, w=384, seed=30 + i)
        lefts.append(to_brightness(l, np.float32))
        rights.append(to_brightness(r, np.float32))
    lb, rb = np.stack(lefts), np.stack(rights)
    el = jax.vmap(lambda x: find_edges(x, params.threshold, params.mode,
                                       params.edge_rule))(lb)
    er = jax.vmap(lambda x: find_edges(x, params.threshold, params.mode,
                                       params.edge_rule))(rb)
    want_best, want_winner = match_and_score_pallas(el, er, params)
    best, winner, gel, ger = match_score_edges_pallas(lb, rb, params,
                                                      x_tile=128)
    np.testing.assert_array_equal(np.asarray(gel), np.asarray(el))
    np.testing.assert_array_equal(np.asarray(ger), np.asarray(er))
    np.testing.assert_array_equal(np.asarray(best), np.asarray(want_best))
    np.testing.assert_array_equal(np.asarray(winner), np.asarray(want_winner))


def test_fused_kernel_shift_unroll_bit_identical():
    params = StereoParams(square_width=9, num_shifts=8,
                          mode=BoundaryMode.GHOST, edge_rule="exact")
    el, er, want_best, want_winner = _edges_and_expected(params, h=24, w=256,
                                                         seed=41)
    best, winner = match_and_score_pallas(el, er, params, shift_unroll=2)
    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(winner), want_winner)
    # Odd shift counts fall back to the single-shift loop.
    params3 = StereoParams(square_width=9, num_shifts=7,
                           mode=BoundaryMode.WRAP, edge_rule="exact")
    el3, er3, wb3, ww3 = _edges_and_expected(params3, h=24, w=128, seed=42)
    b3, w3 = match_and_score_pallas(el3, er3, params3, shift_unroll=2)
    np.testing.assert_array_equal(np.asarray(b3), wb3)
    np.testing.assert_array_equal(np.asarray(w3), ww3)
