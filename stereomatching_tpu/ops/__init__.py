"""TPU compute ops (JAX/XLA tier + Pallas kernel tier).

Each op mirrors one phase of the reference pipeline (SURVEY.md §2) with
identical semantics to the NumPy oracle; the XLA tier is the portable
implementation, the Pallas tier (``fused.py``) is the VMEM-tiled
speed-of-light path for the hot cost-volume phase.
"""

from stereomatching_tpu.ops.edges import find_edges
from stereomatching_tpu.ops.matching import extend_right_edges, match_plane
from stereomatching_tpu.ops.aggregate import box_sum
from stereomatching_tpu.ops.argmax import match_and_score, match_and_score_collect
from stereomatching_tpu.ops.diffusion import fill_web_holes
from stereomatching_tpu.ops.contour import draw_contour
from stereomatching_tpu.ops.fused import match_and_score_pallas
from stereomatching_tpu.ops.costvolume import (
    argmin_subpixel_scan,
    sad_disparity,
    lr_consistency,
    fill_invalid,
)

__all__ = [
    "find_edges",
    "extend_right_edges",
    "match_plane",
    "box_sum",
    "match_and_score",
    "match_and_score_collect",
    "fill_web_holes",
    "draw_contour",
    "match_and_score_pallas",
    "argmin_subpixel_scan",
    "sad_disparity",
    "lr_consistency",
    "fill_invalid",
]
