"""Windowed score aggregation (reference ``addup_pixels_in_square``,
src/stereo.c:132-148): square_width² box sum centered on each pixel.

The reference's CUDA kernel does square_width² (441) global reads per
pixel (src/stereo.cu:146-155) — the hot loop of the whole program.  Here
the box sum is a summed-area table: two cumulative sums and a 4-corner
difference, O(1) per pixel, exact in int32 (window sums <= sw² and SAT
entries <= H*W < 2^31).
"""

from __future__ import annotations

import jax.numpy as jnp

from stereomatching_tpu.config import BoundaryMode


def pad_plane(
    plane: jnp.ndarray, half: int, mode: BoundaryMode
) -> jnp.ndarray:
    """Pad a match plane by ``half``: wrap-around (src/stereo.c:141-142)
    or the ghost variant's zero-filled match halo (src/stereo-ghost.c:93-97,
    140-141)."""
    if mode == BoundaryMode.WRAP:
        return jnp.pad(plane, half, mode="wrap")
    return jnp.pad(plane, half, mode="constant")


def box_sum_padded(padded: jnp.ndarray, half: int) -> jnp.ndarray:
    """Box sum over an already ``half``-padded plane (last two axes)
    -> int32 [..., H, W].  Leading batch/shard dims pass through."""
    k = 2 * half + 1
    sat = padded.astype(jnp.int32).cumsum(axis=-2).cumsum(axis=-1)
    pad = [(0, 0)] * (sat.ndim - 2) + [(1, 0), (1, 0)]
    sat = jnp.pad(sat, pad)
    return (
        sat[..., k:, k:]
        - sat[..., :-k, k:]
        - sat[..., k:, :-k]
        + sat[..., :-k, :-k]
    )


def box_sum(
    plane: jnp.ndarray, square_width: int, mode: BoundaryMode
) -> jnp.ndarray:
    half = square_width // 2
    return box_sum_padded(pad_plane(plane, half, mode), half)
