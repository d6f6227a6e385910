#!/usr/bin/env python
"""End-to-end classic pipeline demo on the reference fixtures.

Loads a stereo pair, runs the jitted pipeline (both boundary modes),
writes the contour map and elevation web as PPM images, and prints the
reference-compatible timing line.

    python examples/classic_demo.py [left.png right.png] [--outdir out]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE = "/root/reference/test/imgs/1-240x135"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("left", nargs="?", default=f"{FIXTURE}/a.png")
    p.add_argument("right", nargs="?", default=f"{FIXTURE}/b.png")
    p.add_argument("--outdir", default="demo_out")
    args = p.parse_args()

    import numpy as np

    from stereomatching_tpu import BoundaryMode, StereoParams
    from stereomatching_tpu.serving import Matcher
    from stereomatching_tpu.utils.imageio import (
        artifact_ppm_type,
        read_png_gray,
        write_ppm,
    )

    left = read_png_gray(args.left)
    right = read_png_gray(args.right)
    print(f"pair: {left.shape[1]}x{left.shape[0]}")

    os.makedirs(args.outdir, exist_ok=True)
    for mode in (BoundaryMode.WRAP, BoundaryMode.GHOST):
        params = StereoParams(mode=mode, edge_rule="exact")
        matcher = Matcher(params)
        t0 = time.monotonic()
        arts = matcher(left, right)
        dt = time.monotonic() - t0
        for name in ("output-0", "web-2", "edges-1"):
            path = os.path.join(args.outdir, f"{mode.value}-{name}.ppm")
            write_ppm(path, np.asarray(arts[name]), artifact_ppm_type(name))
        print(
            f"{mode.value}: elevations [{int(arts['min_elevation'])}, "
            f"{int(arts['max_elevation'])}], first call {dt:.2f}s "
            f"(includes compile); artifacts in {args.outdir}/"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
