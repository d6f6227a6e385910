"""Artifact checkpointing: save/load pipeline artifact dicts as one
compressed ``.npz``.

The framework's equivalent of the reference's per-phase PPM dumps
(src/stereo.c:302-320) used as both debug state and golden files —
``.npz`` keeps exact integer/float values (PPM normalizes), doubles as
a resume point for the finishing phases (consumed by the CLI's
``--save-artifacts``/``--resume``, cli.py:_run_resume), and diffs with
``compare_artifacts``.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import numpy as np


def save_artifacts(path: str, artifacts: Mapping[str, np.ndarray]) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in artifacts.items()})


def load_artifacts(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def compare_artifacts(
    a: Mapping[str, np.ndarray],
    b: Mapping[str, np.ndarray],
    atol: float = 0.0,
) -> List[str]:
    """Names of artifacts that differ (present-in-one or value mismatch).
    atol=0 is bitwise (the diff.sh discipline); a small atol gives the
    numeric-tolerance mode the reference lacks (SURVEY.md §4 gaps)."""
    bad = sorted(set(a) ^ set(b))
    for k in sorted(set(a) & set(b)):
        x, y = np.asarray(a[k]), np.asarray(b[k])
        if x.shape != y.shape:
            bad.append(k)
        elif atol == 0.0:
            if not np.array_equal(x, y):
                bad.append(k)
        elif not np.allclose(x, y, atol=atol, rtol=0.0):
            bad.append(k)
    return bad
