"""Parameter-space fuzzing: random configurations, every tier must match
the oracle bitwise.  Catches interactions (window vs image size, shifts
vs width, odd times) that the targeted tests don't enumerate."""

import numpy as np
import pytest

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
