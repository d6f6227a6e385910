"""Differential tests for the fused modern kernel (interpret on CPU):
must match the XLA argmin scan exactly (int planes) / to float tol
(subpixel)."""

import numpy as np
import pytest

from stereomatching_tpu.config import ModernParams
from stereomatching_tpu.models.modern import (
    build_modern_pipeline,
    disparity_one_view,
)
from tests.util import synthetic_pair


@pytest.mark.parametrize("cost", ["sad", "census"])
@pytest.mark.parametrize("reference", ["left", "right"])
def test_fused_modern_matches_scan(cost, reference):
    params = ModernParams(num_disparities=12, window=7, cost=cost)
    left, right = synthetic_pair(h=32, w=48, seed=1)
    l, r = left.astype(np.int32), right.astype(np.int32)
    want = disparity_one_view(l, r, params, reference)
    got = disparity_one_view(l, r, params, reference, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(want.cost))
    np.testing.assert_allclose(np.asarray(got.subpixel),
                               np.asarray(want.subpixel), atol=1e-5)


def test_fused_modern_window_one_and_big_disp():
    params = ModernParams(num_disparities=32, window=1)
    left, right = synthetic_pair(h=24, w=64, seed=3)
    l, r = left.astype(np.int32), right.astype(np.int32)
    want = disparity_one_view(l, r, params, "left")
    got = disparity_one_view(l, r, params, "left", use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))


def test_fused_modern_batched_pipeline():
    params = ModernParams(num_disparities=8, window=5)
    pairs = [synthetic_pair(h=24, w=32, seed=s) for s in range(2)]
    l = np.stack([p[0] for p in pairs]).astype(np.int32)
    r = np.stack([p[1] for p in pairs]).astype(np.int32)
    want = build_modern_pipeline(params, batched=True)(l, r)
    got = build_modern_pipeline(params, batched=True, use_pallas=True)(l, r)
    for k in ("disparity", "disparity_right", "cost", "valid"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)
    np.testing.assert_allclose(np.asarray(got["subpixel"]),
                               np.asarray(want["subpixel"]), atol=1e-5)


def test_fused_modern_wide_windows_now_supported():
    """Round 1's digit-split bounds (census bits*window <= 255, SAD
    window <= 36) are gone with the lane-tree aggregation; an 11-wide
    5x5-census window runs the kernel and matches the XLA scan."""
    params = ModernParams(num_disparities=8, window=11, cost="census",
                          census_window=5)
    left, right = synthetic_pair(h=24, w=32, seed=4)
    got = disparity_one_view(left.astype(np.int32), right.astype(np.int32),
                             params, "left", use_pallas=True)
    want = disparity_one_view(left.astype(np.int32), right.astype(np.int32),
                              params, "left", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got.disparity),
                                  np.asarray(want.disparity))
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(want.cost))


def test_fused_modern_window_limit():
    params = ModernParams(num_disparities=8, window=257)
    left, right = synthetic_pair(h=300, w=320, seed=4)
    with pytest.raises(ValueError, match="255"):
        disparity_one_view(left.astype(np.int32), right.astype(np.int32),
                           params, "left", use_pallas=True)
