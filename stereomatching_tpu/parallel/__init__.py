"""Multi-chip tier: SPMD sharding over a (data, rows) device mesh.

The scaled-out generalization of the reference's ghost areas
(``src/ghost.h``): where the reference allocates one padded buffer and
fills the halo once on one device, here image batches are sharded
[B over "data", H over "rows"] and halo rows move between neighbor
shards with ``jax.lax.ppermute`` over ICI.  Halo width == dependency
reach, the reference's own rule (src/stereo-ghost.c:11-12).
"""

from stereomatching_tpu.parallel.mesh import make_mesh
from stereomatching_tpu.parallel.halo import exchange_row_halo, with_row_halo
from stereomatching_tpu.parallel.pipeline import (
    build_sharded_pipeline,
    sharded_classic_forward,
)
from stereomatching_tpu.parallel.modern import (
    build_sharded_modern_pipeline,
    sharded_modern_forward,
)

__all__ = [
    "make_mesh",
    "exchange_row_halo",
    "with_row_halo",
    "build_sharded_pipeline",
    "sharded_classic_forward",
    "build_sharded_modern_pipeline",
    "sharded_modern_forward",
]
