"""Device mesh construction for the (data, rows) layout.

Axes:
  * ``data`` — batch data parallelism: independent stereo pairs.
  * ``rows`` — spatial parallelism: image rows sharded across chips,
    stitched by ppermute halo exchange (parallel/halo.py).

On a pod slice, lay ``rows`` along an ICI ring so halo strips ride
neighbor links; ``data`` needs no steady-state communication at all
(only the per-image contour min/max reduce, parallel/pipeline.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
ROWS_AXIS = "rows"


def make_mesh(
    data: int = 1,
    rows: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, rows) mesh.  ``rows`` defaults to using all
    remaining devices.  Device order follows jax.devices(), which on TPU
    enumerates chips in ICI-neighbor order along the minor axes."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if rows is None:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}")
        rows = n // data
    if data * rows != n:
        raise ValueError(f"mesh {data}x{rows} != {n} devices")
    arr = np.asarray(devices).reshape(data, rows)
    return Mesh(arr, (DATA_AXIS, ROWS_AXIS))
