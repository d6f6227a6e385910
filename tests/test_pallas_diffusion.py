"""Differential tests for the fused Pallas diffusion kernel vs the
NumPy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from stereomatching_tpu.oracle.pipeline import fill_web_holes
from stereomatching_tpu.ops.fused_diffusion import fill_web_holes_pallas


def _web(h, w, seed, hole_frac=0.3, max_v=30):
    rng = np.random.default_rng(seed)
    web = rng.integers(1, max_v + 1, size=(h, w)).astype(np.int32)
    web[rng.random((h, w)) < hole_frac] = 0
    return web


@pytest.mark.parametrize("times", [2, 5, 32])
@pytest.mark.parametrize("h,w", [(48, 128), (40, 256)])
def test_fused_diffusion_matches_oracle(times, h, w):
    web = _web(h, w, seed=times)
    want = fill_web_holes(web, times)
    got = fill_web_holes_pallas(web, times, tile_rows=16)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_diffusion_single_tile_and_batch():
    webs = np.stack([_web(24, 128, s) for s in range(3)])
    want = np.stack([fill_web_holes(webs[i], 8) for i in range(3)])
    got = fill_web_holes_pallas(webs, 8, tile_rows=64)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_diffusion_times_leq_one_identity():
    web = _web(16, 128, 9)
    np.testing.assert_array_equal(
        np.asarray(fill_web_holes_pallas(web, 1)), web
    )


@pytest.mark.parametrize("w", [100, 240, 960, 127, 129])
def test_fused_diffusion_unaligned_widths(w):
    """Any width runs (lanes pad internally); the flat-index p±1
    row-crossing semantics must stay exact at the REAL width — the
    crossing columns are the most padding-sensitive cells."""
    web = _web(24, w, 3)
    want = fill_web_holes(web, 6)
    got = fill_web_holes_pallas(web, 6, tile_rows=8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_boundary_rows_stay_zero_semantics():
    """A hole on the top row must average with the non-evolving zero
    above it — the reference's out-of-buffer-is-0 semantics."""
    web = np.full((16, 128), 8, dtype=np.int32)
    web[0, 64] = 0
    want = fill_web_holes(web, 6)
    got = fill_web_holes_pallas(web, 6, tile_rows=8)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_packed_batch_matches_unpacked():
    # value_bound < 2^14 packs two images per int32 plane — must be
    # bit-identical to the unpacked kernel (and hence the XLA scan).
    rng = np.random.default_rng(21)
    webs = (rng.random((5, 40, 200)) < 0.3) * rng.integers(1, 31, (5, 40, 200))
    webs = webs.astype(np.int32)
    want = fill_web_holes_pallas(webs, 12, tile_rows=16)
    got = fill_web_holes_pallas(webs, 12, tile_rows=16, value_bound=31)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_bound_too_large_falls_back():
    rng = np.random.default_rng(22)
    webs = rng.integers(0, 1 << 15, (2, 24, 128)).astype(np.int32)
    want = fill_web_holes_pallas(webs, 6, tile_rows=8)
    got = fill_web_holes_pallas(webs, 6, tile_rows=8, value_bound=1 << 15)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("bsz,packed", [(1, False), (3, True), (4, True),
                                        (2, False)])
def test_with_range_matches_min_max(bsz, packed):
    """The epilogue-folded min/max must equal jnp.min/max of the output
    web, packed (two images per int32) or not."""
    webs = np.stack([_web(40, 200, 100 + s, max_v=29) for s in range(bsz)])
    kw = {"value_bound": 30} if packed else {}
    got = fill_web_holes_pallas(webs, 6, tile_rows=16, with_range=True, **kw)
    web, mn, mx = got
    want = fill_web_holes_pallas(webs, 6, tile_rows=16, **kw)
    np.testing.assert_array_equal(np.asarray(web), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(want).min(axis=(1, 2)))
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(want).max(axis=(1, 2)))


def test_with_range_single_image_scalars():
    web = _web(24, 128, 77)
    out, mn, mx = fill_web_holes_pallas(web, 5, tile_rows=8, with_range=True)
    want = np.asarray(fill_web_holes_pallas(web, 5, tile_rows=8))
    assert np.asarray(mn).shape == () and np.asarray(mx).shape == ()
    assert int(mn) == want.min() and int(mx) == want.max()


def test_with_range_times_one():
    web = _web(16, 128, 3)
    out, mn, mx = fill_web_holes_pallas(web, 1, with_range=True)
    assert int(mn) == web.min() and int(mx) == web.max()


def test_wide_image_escalated_budget_matches_oracle():
    """Wide images trigger the escalated-VMEM tile selection (round 5:
    the 44 MB budget forced 8-row tiles under the 62-row step halo at
    W=7680, an 8.75x recompute — the 8K droop).  The escalated
    geometry must stay bit-identical to the oracle."""
    web = _web(40, 7680, seed=9)
    want = fill_web_holes(web, 32)
    got = fill_web_holes_pallas(web, 32)
    np.testing.assert_array_equal(np.asarray(got), want)
