"""CAD placement at the fused tag pose — mirrors
mpa_final_view_with_export.py / mpa_icp_export.py: estimate pose, place
CAD (scale -> rotate about origin -> translate to anchor), optional ICP
refinement against the scene cloud, export transformed CAD + provenance.

  python -m repas_tpu.apps.place_cad --color c.png --depth d.png \
      --intrinsics K.json --cad model.ply --out placed.ply [--icp]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import (add_intrinsics_args, load_depth_m,
                                    load_rgb, log, resolve_intrinsics)
from repas_tpu.cloud import create_masked_pointcloud
from repas_tpu.cloud.cad import (place_cad_at_anchor, refine_with_icp,
                                 transform_geometry)
from repas_tpu.core.config import CadConfig, DetectorConfig, ICPConfig
from repas_tpu.detect import detect_tags
from repas_tpu.io.meta import write_meta
from repas_tpu.io.ply import PointCloud, read_geometry, write_ply
from repas_tpu.pose.fusion import fuse_tag_poses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--color", type=Path, required=True)
    p.add_argument("--depth", type=Path, required=True)
    add_intrinsics_args(p)
    p.add_argument("--cad", type=Path, required=True)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--tag-size", type=float, default=0.0293,
                   help="mpa scripts use 0.0293 (mpa_icp_export.py:24)")
    p.add_argument("--tag-ids", type=int, nargs="*", default=[9, 16])
    p.add_argument("--anchor-id", type=int, default=16)
    p.add_argument("--cad-units-to-m", type=float, default=0.001)
    p.add_argument("--pre-rot-zyx", type=float, nargs=3,
                   default=[0.0, 0.0, 0.0])
    p.add_argument("--icp", action="store_true",
                   help="refine with point-to-plane ICP vs the scene")
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
    log.info("R_avg:\n%s", np.asarray(fused.R_avg))
    log.info("anchor P_depth: %s", np.asarray(fused.anchor_P_depth))

    cad = read_geometry(args.cad)
    ccfg = CadConfig(units_to_meters=args.cad_units_to_m,
                     pre_rot_deg_zyx=tuple(args.pre_rot_zyx))
    placement = place_cad_at_anchor(cad, np.asarray(fused.R_avg),
                                    np.asarray(fused.anchor_P_depth), ccfg)

    icp_report = None
    if args.icp:
        scene = create_masked_pointcloud(jnp.asarray(rgb),
                                         jnp.asarray(depth), K,
                                         outlier_nb=0)
        v = np.asarray(scene.valid)
        scene_pc = PointCloud(points=np.asarray(scene.points)[v])
        placed = transform_geometry(cad, placement.T_cad_world)
        icp_report, T_icp = refine_with_icp(placed, scene_pc, ICPConfig())
        placement.record("icp_refinement", T_icp)
        log.info("ICP fitness=%.3f rmse=%.4f drot=%.2fdeg dt=%.1fmm",
                 icp_report["fitness"], icp_report["inlier_rmse"],
                 icp_report["delta_rotation_deg"],
                 icp_report["delta_translation_mm"])

    out_geom = transform_geometry(cad, placement.T_cad_world)
    write_ply(args.out, out_geom)
    write_meta(args.out.with_suffix(".meta.json"), "cad_transform",
               cad=args.cad, tag_size_m=args.tag_size,
               weights=np.asarray(fused.weights)[valid],
               icp=icp_report, **placement.provenance())
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
