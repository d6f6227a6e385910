"""Configuration for the stereo pipeline.

The reference hard-codes its parameters as compile-time constants
(``src/stereo.c:6-10``: NUM_SHIFTS 30, DEFAULT_THRESHOLD 0.15,
DEFAULT_SQUARE_WIDTH 21, DEFAULT_TIMES 32, DEFAULT_LINES 10) and takes
overrides for all but NUM_SHIFTS as positional argv
(``src/stereo.c:335-386``).  Here everything — including the number of
shifts/disparities — is a runtime parameter carried in one frozen
dataclass, serializable to/from JSON, validated with the same rules the
reference's ``main()`` enforces.
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Any

# Reference defaults (src/stereo.c:6-10).
NUM_SHIFTS = 30
DEFAULT_THRESHOLD = 0.15
DEFAULT_SQUARE_WIDTH = 21
DEFAULT_TIMES = 32
DEFAULT_LINES = 10

# Fill value for the 1-px brightness halo in ghost mode
# (src/stereo-ghost.c:384-385 pads with 128.0 — deliberately out-of-band
# for [0,1) data, reproduced verbatim for golden-match of border pixels).
GHOST_BRIGHTNESS_FILL = 128.0


class BoundaryMode(str, enum.Enum):
    """Boundary handling, mirroring the reference's two program families.

    WRAP  — modulo wrap-around indexing (src/util.h:42-47, used by
            ``stereomatch`` / ``stereopar``).
    GHOST — ghost-area (halo) padding: brightness halo of 1 filled with
            128.0, edge halo of ``num_shifts`` filled 0, match halo of
            ``square_width`` filled 0 (src/ghost.h, src/stereo-ghost.c:11-12).
    """

    WRAP = "wrap"
    GHOST = "ghost"


@dataclasses.dataclass(frozen=True)
class StereoParams:
    """Algorithm parameters (reference ``AlgorithmParams``, src/stereo.c:280-285,
    plus the compile-time constants promoted to runtime values)."""

    threshold: float = DEFAULT_THRESHOLD
    square_width: int = DEFAULT_SQUARE_WIDTH
    times: int = DEFAULT_TIMES
    lines: int = DEFAULT_LINES
    num_shifts: int = NUM_SHIFTS
    mode: BoundaryMode = BoundaryMode.WRAP
    # Edge-decision arithmetic:
    #  "reference" — float ops in the C reference's exact order
    #    (src/stereo.c:16-70).  Bit-identical to the C binaries when run
    #    in float64 with correctly-rounded division (the NumPy oracle);
    #    accelerator backends may approximate division (XLA lowers /3.0
    #    to a reciprocal multiply), flipping knife-edge tie pixels
    #    (~1e-4 of pixels on the reference fixtures).
    #  "exact" — the same predicate in real arithmetic, rescaled to
    #    integers so the only float op is one IEEE multiply:
    #    2*|ka-kb| > min(f32(threshold) * (ka+kb), 1536) where
    #    ka/kb are integer 3-pixel sums of (brightness*256).
    #    Bit-identical across every backend and tier.
    edge_rule: str = "reference"

    def __post_init__(self) -> None:
        # Same validation as the reference CLI (src/stereo.c:378-385),
        # minus the image-size check which needs the images (see
        # ``validate_for_image``).
        if not (0.0 <= self.threshold <= 1.0):
            raise ValueError("threshold must be between 0 and 1")
        if self.square_width < 1 or self.square_width % 2 == 0:
            raise ValueError("square_width must be a positive odd integer")
        if self.times < 0:
            raise ValueError("times must be non-negative")
        if self.lines < 1:
            raise ValueError("lines must be positive")
        if self.num_shifts < 1:
            raise ValueError("num_shifts must be positive")
        if self.edge_rule not in ("reference", "exact"):
            raise ValueError("edge_rule must be 'reference' or 'exact'")

    @property
    def half(self) -> int:
        """Half window width (src/stereo.c:135)."""
        return self.square_width // 2

    def validate_for_image(self, width: int, height: int) -> None:
        """Reference check: square width must fit in the image
        (src/stereo.c:382-385)."""
        if self.square_width > width or self.square_width > height:
            raise ValueError(
                "square width must not be higher than image width/height"
            )

    def replace(self, **kwargs: Any) -> "StereoParams":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["mode"] = self.mode.value
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "StereoParams":
        d = json.loads(s)
        if "mode" in d:
            d["mode"] = BoundaryMode(d["mode"])
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class ModernParams:
    """Parameters for the modern SAD stereo pipeline (models/modern.py) —
    the BASELINE.md north-star extensions beyond the reference: windowed
    SAD cost volume, left-right consistency, sub-pixel parabola refine,
    multi-scale cost fusion."""

    num_disparities: int = 64
    window: int = 9
    lr_max_diff: int = 1  # LR consistency tolerance in pixels
    fill_iterations: int = 16  # diffusion sweeps for invalidated pixels
    # Hole filling for LR-invalidated pixels: "diffusion" (valid-aware
    # Jacobi averaging, fill_iterations sweeps) or "background"
    # (scanline background extension — min of the nearest valid left /
    # right disparity, the standard SGM occlusion interpolation).
    fill_mode: str = "diffusion"
    scales: int = 1  # 1 = single scale; 2 = fuse a half-res cost pyramid
    coarse_weight: int = 1  # integer weight of the upsampled coarse cost
    cost: str = "sad"  # "sad" | "census" (Hamming on census codes)
    census_window: int = 5  # census neighborhood (3 or 5)
    # Aggregation: "box" (windowed sum, fused scan/kernel) or "sgm"
    # (Semi-Global Matching over the materialized volume with
    # per-pixel costs; `window` is then unused).
    aggregation: str = "box"
    sgm_p1: int = 8  # SGM small-change penalty (|dd| == 1)
    sgm_p2: int = 96  # SGM jump penalty (|dd| > 1)
    # 4 = two horizontal + two vertical paths (the common GPU/embedded
    # simplification); 8 adds Hirschmüller's four diagonal paths
    # (higher quality, ~2x the aggregation cost).
    sgm_directions: int = 4
    median_filter: bool = False  # 3x3 median speckle removal before LR
    # Emit a per-pixel "uniqueness" confidence plane: the ratio
    # c2 / max(c1, 1) of the second-best aggregated cost OUTSIDE the
    # winner's +-1 disparity neighborhood to the best (the OpenCV SGBM
    # uniquenessRatio signal; higher = more confident).  SGM only —
    # the box route's costs are never materialized for a second pass.
    uniqueness: bool = False

    def __post_init__(self) -> None:
        if self.num_disparities < 2:
            raise ValueError("num_disparities must be >= 2")
        if self.window < 1 or self.window % 2 == 0:
            raise ValueError("window must be a positive odd integer")
        if self.scales not in (1, 2):
            raise ValueError("scales must be 1 or 2")
        if self.lr_max_diff < 0 or self.fill_iterations < 0:
            raise ValueError("lr_max_diff/fill_iterations must be >= 0")
        if self.cost not in ("sad", "census"):
            raise ValueError("cost must be 'sad' or 'census'")
        if self.census_window not in (3, 5):
            raise ValueError("census_window must be 3 or 5")
        if self.aggregation not in ("box", "sgm"):
            raise ValueError("aggregation must be 'box' or 'sgm'")
        if self.sgm_p1 < 0 or self.sgm_p2 < self.sgm_p1:
            raise ValueError("need 0 <= sgm_p1 <= sgm_p2")
        if self.sgm_directions not in (4, 8):
            raise ValueError("sgm_directions must be 4 or 8")
        # (round 5: scales=2 now fuses a half-res per-pixel cost prior
        # into the SGM volume too — models/modern._sgm_volume; the
        # round-4 rejection is lifted.)
        if self.fill_mode not in ("diffusion", "background"):
            raise ValueError("fill_mode must be 'diffusion' or 'background'")
        if self.uniqueness and self.aggregation != "sgm":
            raise ValueError(
                "uniqueness needs the materialized cost volume "
                "(aggregation='sgm')"
            )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "ModernParams":
        return cls(**json.loads(s))
