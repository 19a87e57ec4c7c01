"""Headless point-cloud viewer — mirrors view_point_cloud.py /
visualize_ply.py / visualize_point_cloud.py: renders fixed orbit
viewpoints of a PLY to PNGs (no interactive GL in this environment).

  python -m repas_tpu.apps.view_pointcloud scene.ply --out view
  python -m repas_tpu.apps.view_pointcloud scene.ply --out view \
      --grid --axes --max-dist 1.0
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from repas_tpu.apps._common import log
from repas_tpu.io.ply import read_ply
from repas_tpu.viz.scene import axes_points, plot_pointcloud


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", type=Path)
    p.add_argument("--out", type=Path, required=True,
                   help="output PNG prefix")
    p.add_argument("--axes", action="store_true")
    p.add_argument("--max-dist", type=float, default=0.0)
    p.add_argument("--max-points", type=int, default=100_000)
    args = p.parse_args(argv)

    pc = read_ply(args.input)
    pts = pc.points
    cols = pc.colors
    if args.max_dist > 0:
        m = np.linalg.norm(pts, axis=1) < args.max_dist
        pts = pts[m]
        cols = None if cols is None else cols[m]
    extra = axes_points(size=0.05) if args.axes else None
    paths = []
    for i, (elev, azim) in enumerate([(-70, -90), (-20, -45), (0, 0)]):
        out = Path(f"{args.out}_view{i}.png")
        plot_pointcloud(pts, cols, out, elev=elev, azim=azim,
                        max_points=args.max_points, extra_points=extra)
        paths.append(out)
    log.info("wrote %s", [str(x) for x in paths])


if __name__ == "__main__":
    main()
