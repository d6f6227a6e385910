"""Ghost-zone halo exchange between row shards via ``jax.lax.ppermute``.

TPU-native replacement for the reference's ghost-area buffers
(``src/ghost.h:6-55``): instead of one padded allocation whose halo is
filled once (``ghost_add_*``, src/ghost.h:34-44), each shard sends its
boundary rows to its mesh neighbors over ICI and receives the rows it
needs to read past its own boundary.

Two boundary behaviors, mirroring the reference's two program families:
  * circular (wrap mode): the first shard's top halo comes from the last
    shard — the distributed form of the modulo indexing in
    ``src/util.h:42-47``.
  * open (ghost mode): boundary shards fill their outer halo with a
    constant (128.0 for brightness per src/stereo-ghost.c:384-385, zero
    for everything else), exactly the reference's ``ghost_add`` fill.

All functions must be called inside ``shard_map`` with ``axis_name``
bound to the rows mesh axis.  They operate on ``[..., Hs, W]`` arrays
(leading batch dims pass through untouched), so no vmap over collectives
is needed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def exchange_row_halo(
    x: jnp.ndarray,
    halo: int,
    axis_name: str,
    n_shards: int,
    circular: bool,
    fill: float | int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (top, bottom) halo blocks of ``halo`` rows each, [..., halo, W].

    ``top`` is the ``halo`` rows just above this shard's first row (the
    bottom rows of shard i-1); ``bottom`` the rows just below its last.
    Open boundaries are filled with ``fill``.
    ``n_shards`` is the static size of the rows mesh axis.
    """
    hs = x.shape[-2]
    if halo > hs:
        raise ValueError(
            f"halo {halo} exceeds shard height {hs}: use more rows per "
            "shard or fewer row shards (halo width == dependency reach, "
            "src/stereo-ghost.c:11-12)"
        )
    bottom_rows = x[..., hs - halo :, :]  # what the shard below needs as top
    top_rows = x[..., :halo, :]  # what the shard above needs as bottom

    if n_shards == 1:
        if circular:
            return bottom_rows, top_rows
        f = jnp.full_like(bottom_rows, fill)
        return f, jnp.full_like(top_rows, fill)

    if circular:
        perm_down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        perm_up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    else:
        perm_down = [(i, i + 1) for i in range(n_shards - 1)]
        perm_up = [(i, i - 1) for i in range(1, n_shards)]

    # ppermute delivers zeros to devices no pair targets — already the
    # right open-boundary fill for integer planes; overwrite when the
    # caller needs a different constant (the 128.0 brightness halo).
    top = jax.lax.ppermute(bottom_rows, axis_name, perm_down)
    bottom = jax.lax.ppermute(top_rows, axis_name, perm_up)

    if not circular and fill != 0:
        idx = jax.lax.axis_index(axis_name)
        filled = jnp.full_like(top, fill)
        top = jnp.where(idx == 0, filled, top)
        bottom = jnp.where(idx == n_shards - 1, filled, bottom)
    return top, bottom


def with_row_halo(
    x: jnp.ndarray,
    halo: int,
    axis_name: str,
    n_shards: int,
    circular: bool,
    fill: float | int = 0,
) -> jnp.ndarray:
    """Concatenate exchanged halos: [..., Hs, W] -> [..., Hs + 2*halo, W]."""
    if halo == 0:
        return x
    top, bottom = exchange_row_halo(x, halo, axis_name, n_shards, circular, fill)
    return jnp.concatenate([top, x, bottom], axis=-2)
