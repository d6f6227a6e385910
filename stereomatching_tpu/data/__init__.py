"""Data loading: stereo-pair datasets and a prefetching batch loader."""

from stereomatching_tpu.data.loader import (
    StereoPairDataset,
    BatchLoader,
    discover_pairs,
)

__all__ = ["StereoPairDataset", "BatchLoader", "discover_pairs"]
