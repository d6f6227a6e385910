"""Parameter-space fuzzing: random configurations, every tier must match
the oracle bitwise.  Catches interactions (window vs image size, shifts
vs width, odd times) that the targeted tests don't enumerate."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # randomized sweeps: the test-all tier

from stereomatching_tpu.config import BoundaryMode, StereoParams
from stereomatching_tpu.models.classic import build_classic_pipeline
from stereomatching_tpu.oracle import pipeline as oracle
from stereomatching_tpu.ops.fused import match_and_score_pallas
from stereomatching_tpu.utils.imageio import to_brightness
from tests.util import synthetic_pair

import jax


def _random_config(rng):
    h = int(rng.integers(17, 64))
    w = int(rng.integers(21, 96))
    sw = int(rng.choice([1, 3, 5, 7, 9, 11]))
    sw = min(sw, (min(h, w) - 1) | 1)
    return dict(
        h=h,
        w=w,
        params=StereoParams(
            threshold=float(rng.uniform(0.05, 0.5)),
            square_width=sw,
            times=int(rng.integers(0, 12)),
            lines=int(rng.integers(1, 12)),
            num_shifts=int(rng.integers(1, min(w + 10, 40))),
            mode=BoundaryMode(rng.choice(["wrap", "ghost"])),
            edge_rule="exact",
        ),
    )


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_jax_tier_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_config(rng)
    left, right = synthetic_pair(h=cfg["h"], w=cfg["w"], seed=seed)
    params = cfg["params"]
    want = oracle.run_pipeline(to_brightness(left), to_brightness(right), params)
    fn = build_classic_pipeline(params)
    got = jax.device_get(
        fn(to_brightness(left, np.float32), to_brightness(right, np.float32))
    )
    for k in ("edges-1", "score_best", "web-1", "web-2", "output-0"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), want[k], err_msg=f"{k} cfg={params}"
        )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pallas_kernel_matches_oracle(seed):
    rng = np.random.default_rng(2000 + seed)
    cfg = _random_config(rng)
    left, right = synthetic_pair(h=cfg["h"], w=cfg["w"], seed=seed)
    params = cfg["params"]
    el = oracle.find_edges(to_brightness(left), params.threshold, params.mode,
                           rule="exact")
    er = oracle.find_edges(to_brightness(right), params.threshold, params.mode,
                           rule="exact")
    matches = oracle.fill_matches(el, er, params.num_shifts, params.mode)
    sums = np.stack([
        oracle.box_sum(matches[i], params.square_width, params.mode)
        for i in range(params.num_shifts)
    ])
    best, winner = oracle.best_and_winner(oracle.record_scores(matches, sums))
    tile = int(rng.choice([8, 16, 48]))
    gb, gw = match_and_score_pallas(
        el.astype(np.int32), er.astype(np.int32), params, tile_rows=tile
    )
    np.testing.assert_array_equal(np.asarray(gb), best,
                                  err_msg=f"best cfg={params} tile={tile}")
    np.testing.assert_array_equal(np.asarray(gw), winner,
                                  err_msg=f"winner cfg={params} tile={tile}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sharded_matches_oracle(seed):
    if len(jax.devices()) < 8:
        pytest.skip("needs CPU mesh")
    from stereomatching_tpu.parallel import build_sharded_pipeline, make_mesh
    from stereomatching_tpu.oracle import pipeline as oracle_mod

    rng = np.random.default_rng(3000 + seed)
    rows = int(rng.choice([2, 4, 8]))
    data = int(rng.choice([1, 2]))
    if data * rows > 8:
        data = 1
    sw = int(rng.choice([3, 5, 7, 9]))
    hs = int(rng.integers(max(sw // 2, 2), 20))
    h = rows * hs
    w = int(rng.integers(24, 80))
    params = StereoParams(
        threshold=float(rng.uniform(0.05, 0.4)),
        square_width=sw,
        times=int(rng.integers(0, 8)),
        lines=int(rng.integers(1, 8)),
        num_shifts=int(rng.integers(1, 24)),
        mode=BoundaryMode(rng.choice(["wrap", "ghost"])),
        edge_rule="exact",
    )
    use_pallas = bool(rng.integers(0, 2))
    mesh = make_mesh(data=data, rows=rows, devices=jax.devices()[: data * rows])
    lefts, rights = [], []
    for i in range(data):
        l, r = synthetic_pair(h=h, w=w, seed=seed * 10 + i)
        lefts.append(to_brightness(l, np.float32))
        rights.append(to_brightness(r, np.float32))
    lb, rb = np.stack(lefts), np.stack(rights)
    got = jax.device_get(
        build_sharded_pipeline(params, mesh, use_pallas=use_pallas)(lb, rb)
    )
    for i in range(data):
        want = oracle_mod.run_pipeline(
            lb[i].astype(np.float64), rb[i].astype(np.float64), params
        )
        for k in ("score_best", "web-2", "output-0"):
            np.testing.assert_array_equal(
                np.asarray(got[k][i]), want[k],
                err_msg=f"{k} mesh={data}x{rows} pallas={use_pallas} {params}",
            )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_modern_pallas_matches_scan(seed):
    from stereomatching_tpu.config import ModernParams
    from stereomatching_tpu.models.modern import disparity_one_view

    rng = np.random.default_rng(4000 + seed)
    cost = str(rng.choice(["sad", "census"]))
    window = int(rng.choice([1, 3, 5, 7, 9]))
    params = ModernParams(
        num_disparities=int(rng.integers(2, 32)),
        window=window,
        cost=cost,
        census_window=int(rng.choice([3, 5])),
    )
    h = int(rng.integers(12, 48))
    w = int(rng.integers(20, 72))
    left, right = synthetic_pair(h=h, w=w, seed=seed)
    ref = str(rng.choice(["left", "right"]))
    l, r = left.astype(np.int32), right.astype(np.int32)
    want = disparity_one_view(l, r, params, ref)
    got = disparity_one_view(l, r, params, ref, use_pallas=True)
    np.testing.assert_array_equal(
        np.asarray(got.disparity), np.asarray(want.disparity),
        err_msg=f"{params} ref={ref} h={h} w={w}",
    )
    np.testing.assert_array_equal(np.asarray(got.cost), np.asarray(want.cost))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sgm_pallas_route_matches_xla(seed):
    """The full Pallas SGM route (volume dtype narrowing, chunk-major
    directional kernels with the direction-sum fold, fused tail, fused
    hole fill) vs the XLA route, bit-for-bit on every output, over
    random shapes, penalties, and costs."""
    from stereomatching_tpu.config import ModernParams
    from stereomatching_tpu.models.modern import modern_forward

    rng = np.random.default_rng(5000 + seed)
    p1 = int(rng.integers(0, 12))
    params = ModernParams(
        num_disparities=int(rng.integers(2, 24)),
        cost=str(rng.choice(["sad", "census"])),
        census_window=int(rng.choice([3, 5])),
        aggregation="sgm",
        sgm_p1=p1,
        sgm_p2=p1 + int(rng.integers(0, 120)),
        lr_max_diff=int(rng.integers(0, 3)),
        fill_iterations=int(rng.integers(0, 12)),
    )
    h = int(rng.integers(12, 48))
    w = int(rng.integers(20, 72))
    left, right = synthetic_pair(h=h, w=w, seed=seed + 7)
    l, r = left.astype(np.int32), right.astype(np.int32)
    want = modern_forward(l, r, params, use_pallas=False)
    got = modern_forward(l, r, params, use_pallas=True)
    for k in want:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]),
            err_msg=f"{k} {params} h={h} w={w}",
        )
