"""Cost-volume build + disparity argmax, fused over shifts.

Covers reference phases 2a-2c (``fillup_matches`` + ``fillup_scores`` +
``find_highest_scoring_shifts``, src/stereo.c:113-220) in ONE scan over
shifts that never materializes the [D, H, W] cost volume in HBM: the
carry is just (best_score, winning_shift).

The single-pass update preserves the reference's two-pass last-wins tie
rule exactly: the reference records winner = i+1 for the LAST i whose
score equals the global best (src/stereo.c:211-219).  In a single pass,
updating the winner on ``score >= best`` triggers at exactly that last i
(when it arrives, the running best already equals the global best), and
never afterwards.  All scores are >= 0 and best starts at 0, matching the
reference's zeroed buffer (src/stereo.c:311) — in the all-zero-scores case
every shift triggers and the winner ends at num_shifts, exactly as the
reference's loop does.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stereomatching_tpu.config import BoundaryMode, StereoParams
from stereomatching_tpu.ops.aggregate import box_sum_padded_auto, pad_plane
from stereomatching_tpu.ops.matching import extend_right_edges, match_plane


def _score_for_shift(
    left_edges: jnp.ndarray,
    right_ext: jnp.ndarray,
    shift: jnp.ndarray,
    half: int,
    mode: BoundaryMode,
) -> jnp.ndarray:
    match = match_plane(left_edges, right_ext, shift)
    sums = box_sum_padded_auto(pad_plane(match, half, mode), half)
    # Keep the sum only where a match occurred (record_score,
    # src/stereo.c:172-182); elsewhere 0.
    score = jnp.where(match == 1, sums, 0)
    return match, sums, score


def match_and_score(
    left_edges: jnp.ndarray,
    right_edges: jnp.ndarray,
    params: StereoParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (best_scores, winning_shifts), both int32 [H, W]."""
    h, w = left_edges.shape
    right_ext = extend_right_edges(right_edges, params.num_shifts, params.mode)
    half = params.half
    mode = params.mode

    def step(carry, i):
        best, winner = carry
        _, _, score = _score_for_shift(left_edges, right_ext, i, half, mode)
        winner = jnp.where(score >= best, i + 1, winner)
        best = jnp.maximum(best, score)
        return (best, winner), None

    init = (jnp.zeros((h, w), jnp.int32), jnp.zeros((h, w), jnp.int32))
    (best, winner), _ = jax.lax.scan(
        step, init, jnp.arange(params.num_shifts, dtype=jnp.int32)
    )
    return best, winner.astype(jnp.int32)


def match_and_score_collect(
    left_edges: jnp.ndarray,
    right_edges: jnp.ndarray,
    params: StereoParams,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Artifact-collecting variant for golden/differential tests: also
    stacks the per-shift planes the reference dumps in debug builds
    (matches-i, score_all-i, scores-i; src/stereo.c:302-313).
    -> (matches [D,H,W], sums [D,H,W], scores [D,H,W], best, winner)."""
    h, w = left_edges.shape
    right_ext = extend_right_edges(right_edges, params.num_shifts, params.mode)
    half = params.half
    mode = params.mode

    def step(carry, i):
        best, winner = carry
        match, sums, score = _score_for_shift(left_edges, right_ext, i, half, mode)
        winner = jnp.where(score >= best, i + 1, winner)
        best = jnp.maximum(best, score)
        return (best, winner), (match, sums, score)

    init = (jnp.zeros((h, w), jnp.int32), jnp.zeros((h, w), jnp.int32))
    (best, winner), (matches, sums, scores) = jax.lax.scan(
        step, init, jnp.arange(params.num_shifts, dtype=jnp.int32)
    )
    return matches, sums, scores, best, winner
