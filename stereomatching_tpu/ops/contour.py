"""Contour rendering (reference ``draw_contour_map``, src/stereo.c:256-274):
global min/max reduction, interval = range / num_lines (C integer
division), pixel on a line iff (web - min) % interval == 0.

``interval`` is clamped to >= 1: the reference divides by zero when the
elevation range is smaller than num_lines (src/stereo.c:266-271) — a
documented bug fix, tested in tests/test_oracle.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def draw_contour(
    web: jnp.ndarray, num_lines: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (contour int32 {0,1} [H, W], min_elevation, max_elevation)."""
    max_e = web.max()
    min_e = web.min()
    interval = jnp.maximum((max_e - min_e) // num_lines, 1)
    out = (((web - min_e) % interval) == 0).astype(jnp.int32)
    return out, min_e, max_e
