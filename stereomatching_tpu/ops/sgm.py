"""Semi-Global Matching cost aggregation (Hirschmüller 2005/2008), the
standard classical stereo aggregation — TPU-native formulation.

Each direction r accumulates

    L_r(p, d) = C(p, d) - min_d' L_r(p-r, d')
              + min( L_r(p-r, d),
                     L_r(p-r, d±1) + P1,
                     min_d' L_r(p-r, d') + P2 )

This is an inherently sequential recurrence along the scan direction but
fully parallel across the perpendicular axis AND the disparity axis, so
each direction is one ``lax.scan`` whose step does vector ops on an
[perp, D] plane — the compiler-friendly shape (no data-dependent
control flow, static shapes).  Four directions (two horizontal, two
vertical) are summed; diagonal paths add little accuracy for their cost
and are omitted (the common embedded/GPU simplification, e.g. the
FP-Stereo / GPU-SGM literature).

All arithmetic is int32 and exact; for the usual census costs
(<= 24 per pixel) the summed aggregate stays far below overflow.

Unlike the rest of the framework's fused scans, SGM *materializes* the
[H, W, D] cost volume (the recurrence needs random access along two
axes): at 1 MP x 64 disparities int32 that is 256 MB in HBM — fine for
a 16 GB chip, but choose D accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 2**28


def _directional(vol: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """One left-to-right pass along axis 1.  vol [H, W, D] -> L [H, W, D]."""

    def step(carry, c_x):
        # carry, c_x: [H, D]
        m = carry.min(axis=-1, keepdims=True)
        up = jnp.pad(carry[:, 1:], ((0, 0), (0, 1)), constant_values=_BIG)
        dn = jnp.pad(carry[:, :-1], ((0, 0), (1, 0)), constant_values=_BIG)
        best = jnp.minimum(
            jnp.minimum(carry, jnp.minimum(up, dn) + p1), m + p2
        )
        out = c_x + best - m
        return out, out

    x_major = jnp.moveaxis(vol, 1, 0)  # [W, H, D]
    init = x_major[0]
    _, rest = jax.lax.scan(step, init, x_major[1:])
    out = jnp.concatenate([init[None], rest], axis=0)
    return jnp.moveaxis(out, 0, 1)


def sgm_aggregate(
    vol: jnp.ndarray, p1: int = 8, p2: int = 96
) -> jnp.ndarray:
    """4-direction SGM aggregation of an int32 cost volume [H, W, D]
    (left→right, right→left, top→bottom, bottom→top) -> int32 [H, W, D].
    P1 penalizes ±1 disparity changes along a path, P2 larger jumps."""
    if p1 < 0 or p2 < p1:
        raise ValueError("need 0 <= p1 <= p2")
    vol = vol.astype(jnp.int32)
    lr = _directional(vol, p1, p2)
    rl = jnp.flip(_directional(jnp.flip(vol, axis=1), p1, p2), axis=1)
    vol_t = jnp.swapaxes(vol, 0, 1)
    tb = jnp.swapaxes(_directional(vol_t, p1, p2), 0, 1)
    bt = jnp.swapaxes(
        jnp.flip(_directional(jnp.flip(vol_t, axis=1), p1, p2), axis=1), 0, 1
    )
    return lr + rl + tb + bt


def volume_argmin_subpixel(vol: jnp.ndarray):
    """First-minimum argmin over the last axis + parabola sub-pixel
    refine on the neighbors (the materialized-volume counterpart of
    ops/costvolume.argmin_subpixel_scan).
    -> (disparity int32, subpixel f32, cost int32), each [H, W]."""
    d_count = vol.shape[-1]
    best_d = jnp.argmin(vol, axis=-1).astype(jnp.int32)  # first min wins
    best = jnp.take_along_axis(vol, best_d[..., None], axis=-1)[..., 0]
    lo = jnp.take_along_axis(
        vol, jnp.clip(best_d - 1, 0, d_count - 1)[..., None], axis=-1
    )[..., 0]
    hi = jnp.take_along_axis(
        vol, jnp.clip(best_d + 1, 0, d_count - 1)[..., None], axis=-1
    )[..., 0]
    interior = (best_d > 0) & (best_d < d_count - 1)
    cl = lo.astype(jnp.float32)
    cm = best.astype(jnp.float32)
    cr = hi.astype(jnp.float32)
    denom = cl - 2.0 * cm + cr
    valid = interior & (denom > 0)
    offset = jnp.where(valid, (cl - cr) / jnp.where(valid, 2.0 * denom, 1.0), 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    return best_d, best_d.astype(jnp.float32) + offset, best


def right_disparity_from_left_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Right-view disparity from the LEFT-referenced volume via the
    standard re-projection cost_R(x, d) = cost_L(x + d, d) (clamped) —
    avoids a second aggregation pass; used for LR consistency.
    -> int32 [H, W]."""
    h, w, d_count = vol.shape
    xs = jnp.arange(w)[:, None] + jnp.arange(d_count)[None, :]  # [W, D]
    xs = jnp.clip(xs, 0, w - 1)
    vol_r = vol[:, xs, jnp.arange(d_count)[None, :]]  # [H, W, D]
    return jnp.argmin(vol_r, axis=-1).astype(jnp.int32)
