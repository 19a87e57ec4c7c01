"""Tag-anchored scene crop — mirrors april_tag_bg_removal_pl.py: PnP both
tags with depth-corrected translation, build the tag-local box, AABB-crop
the cloud, export cropped PLY + provenance meta.

  python -m repas_tpu.apps.crop_scene --color c.png --depth d.png \
      --intrinsics K.json --out cropped.ply --dx 0.1 0.1 --dy 0.1 0.1 \
      --dz 0.05 0.3 [--anchor-id 16]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import (add_intrinsics_args, load_depth_m,
                                    load_rgb, log, resolve_intrinsics)
from repas_tpu.cloud import create_masked_pointcloud, tag_frame_aabb_crop
from repas_tpu.core.config import CropConfig, DetectorConfig
from repas_tpu.detect import detect_tags
from repas_tpu.io.meta import write_meta
from repas_tpu.io.ply import PointCloud, write_ply
from repas_tpu.pose.fusion import fuse_tag_poses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--color", type=Path, required=True)
    p.add_argument("--depth", type=Path, required=True)
    add_intrinsics_args(p)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--tag-size", type=float, default=0.0303)
    p.add_argument("--tag-ids", type=int, nargs="*", default=[9, 16])
    p.add_argument("--anchor-id", type=int, default=16)
    p.add_argument("--dx", type=float, nargs=2, default=[0.1, 0.1],
                   metavar=("FRONT", "BACK"))
    p.add_argument("--dy", type=float, nargs=2, default=[0.1, 0.1])
    p.add_argument("--dz", type=float, nargs=2, default=[0.1, 0.1])
    p.add_argument("--pad", type=float, default=0.0)
    args = p.parse_args(argv)

    rgb = load_rgb(args.color)
    depth = load_depth_m(args.depth)
    h, w = depth.shape
    intr = resolve_intrinsics(args, w, h)
    K = intr.K.astype(np.float32)

    det = detect_tags(jnp.asarray(rgb), DetectorConfig())
    valid = np.asarray(det.valid) & np.isin(np.asarray(det.ids), args.tag_ids)
    if not valid.any():
        raise SystemExit(f"no tags {args.tag_ids} found")
    fused = fuse_tag_poses(det.corners, det.ids, det.areas,
                           jnp.asarray(valid), jnp.asarray(depth), K,
                           jnp.asarray(intr.dist, jnp.float32),
                           args.tag_size, anchor_id=args.anchor_id)

    cloud = create_masked_pointcloud(jnp.asarray(rgb), jnp.asarray(depth),
                                     K, outlier_nb=0)
    ccfg = CropConfig(dx_front=args.dx[0], dx_back=args.dx[1],
                      dy_front=args.dy[0], dy_back=args.dy[1],
                      dz_front=args.dz[0], dz_back=args.dz[1],
                      pad_m=args.pad, anchor_id=args.anchor_id)
    ai = int(fused.anchor_idx)
    mask, lo, hi, corners = tag_frame_aabb_crop(
        cloud.points, cloud.valid, fused.R[ai],
        jnp.asarray(fused.anchor_P_depth), ccfg)
    m = np.asarray(mask)
    pc = PointCloud(points=np.asarray(cloud.points)[m],
                    colors=np.asarray(cloud.colors)[m])
    write_ply(args.out, pc)
    write_meta(args.out.with_suffix(".meta.json"), "crop",
               intrinsics=intr.to_dict(),
               tag_ids=[int(i) for i in np.asarray(det.ids)[valid]],
               anchor_id=args.anchor_id,
               anchor_P_depth=np.asarray(fused.anchor_P_depth),
               R_anchor=np.asarray(fused.R[ai]),
               aabb_lo=np.asarray(lo), aabb_hi=np.asarray(hi),
               box_corners_cam=np.asarray(corners),
               offsets={"dx": args.dx, "dy": args.dy, "dz": args.dz,
                        "pad": args.pad},
               n_points=int(m.sum()))
    log.info("cropped %d -> %d points -> %s",
             int(np.asarray(cloud.valid).sum()), int(m.sum()), args.out)


if __name__ == "__main__":
    main()
