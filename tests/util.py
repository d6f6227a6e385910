"""Shared test helpers: synthetic stereo pairs."""

from __future__ import annotations

import numpy as np


def synthetic_pair(
    h: int = 48, w: int = 64, seed: int = 0, max_shift: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """A deterministic synthetic stereo pair of uint8 grayscale images:
    piecewise-constant blobs on a gradient, with the 'right' image a
    per-region horizontal shift of the left — gives real edges, real
    matches, and a nontrivial disparity web."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    left = (32 + 128 * (xx / w) + 64 * (yy / h)).astype(np.float64)
    # Rectangular blobs at random depths.
    depth = np.zeros((h, w), dtype=np.int32)
    for _ in range(6):
        y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 12)
        bh, bw = rng.integers(6, max(h // 3, 7)), rng.integers(8, max(w // 3, 9))
        val = rng.integers(60, 250)
        d = rng.integers(1, max_shift)
        left[y0 : y0 + bh, x0 : x0 + bw] = val
        depth[y0 : y0 + bh, x0 : x0 + bw] = d
    left = np.clip(left, 0, 255).astype(np.uint8)
    # Right image: shift each pixel left by its depth (background 0).
    right = np.empty_like(left)
    for y in range(h):
        for x in range(w):
            sx = (x + depth[y, x]) % w
            right[y, x] = left[y, sx]
    return left, right
