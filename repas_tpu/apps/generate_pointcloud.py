"""RGB-D -> colored point-cloud PLY — mirrors create_masked_ply.py and the
point-cloud export of better_three_capture.py / capture_aligned_all.py.

  python -m repas_tpu.apps.generate_pointcloud --color c.png --depth d.png \
      --intrinsics K.json --out cloud.ply [--mask m.png] [--voxel 0.005] \
      [--max-dist 1.0]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import (add_intrinsics_args, load_depth_m,
                                    load_rgb, log, resolve_intrinsics)
from repas_tpu.cloud import create_masked_pointcloud, radius_mask
from repas_tpu.io.image import read_image
from repas_tpu.io.meta import write_meta
from repas_tpu.io.ply import PointCloud, write_ply


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--color", type=Path, required=True)
    p.add_argument("--depth", type=Path, required=True)
    p.add_argument("--mask", type=Path)
    add_intrinsics_args(p)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--voxel", type=float, default=0.0)
    p.add_argument("--outlier-nb", type=int, default=0)
    p.add_argument("--max-dist", type=float, default=0.0,
                   help="radial distance mask in meters (0 = off; "
                        "distance_masking_on_ply.py semantics)")
    p.add_argument("--normals", action="store_true")
    args = p.parse_args(argv)

    rgb = load_rgb(args.color)
    depth = load_depth_m(args.depth)
    h, w = depth.shape
    if rgb.shape[:2] != (h, w):
        rgb = rgb[::rgb.shape[0] // h, ::rgb.shape[1] // w][:h, :w]
    intr = resolve_intrinsics(args, w, h)
    mask = None
    if args.mask:
        mask = jnp.asarray((read_image(args.mask) > 0).astype(np.uint8))
        if mask.ndim == 3:
            mask = mask[..., 0]

    out = create_masked_pointcloud(
        jnp.asarray(rgb), jnp.asarray(depth), intr.K.astype(np.float32),
        mask=mask, voxel=args.voxel, outlier_nb=args.outlier_nb,
        with_normals=args.normals)
    valid = np.asarray(out.valid)
    if args.max_dist > 0:
        valid = valid & np.asarray(
            radius_mask(out.points, out.valid, args.max_dist))

    pc = PointCloud(points=np.asarray(out.points)[valid],
                    colors=np.asarray(out.colors)[valid],
                    normals=(np.asarray(out.normals)[valid]
                             if args.normals else None))
    write_ply(args.out, pc)
    write_meta(args.out.with_suffix(".meta.json"), "capture",
               source_color=args.color, source_depth=args.depth,
               intrinsics=intr.to_dict(), n_points=int(valid.sum()),
               voxel=args.voxel, max_dist=args.max_dist)
    log.info("wrote %s (%d points)", args.out, int(valid.sum()))


if __name__ == "__main__":
    main()
