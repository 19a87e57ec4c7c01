"""Multi-tag 6-DOF pose estimation + fusion — mirrors the mpa_* pipeline
(mpa_final_view_with_export.py): detect, per-tag best-order PnP,
depth-corrected translation, weighted rotation averaging, anchor select.

  python -m repas_tpu.apps.estimate_pose --color c.png --depth d.png \
      --intrinsics K.json [--tag-size 0.0303] [--tag-ids 9 16]
      [--anchor-id 16] [--json out.json]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import (add_intrinsics_args, emit_json,
                                    load_depth_m, load_rgb, log,
                                    resolve_intrinsics)
from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect import detect_tags
from repas_tpu.pose.fusion import fuse_tag_poses


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--color", type=Path, required=True)
    p.add_argument("--depth", type=Path, help="aligned depth png/npy")
    add_intrinsics_args(p)
    p.add_argument("--tag-size", type=float, default=0.0303)
    p.add_argument("--tag-ids", type=int, nargs="*", default=[9, 16])
    p.add_argument("--anchor-id", type=int, default=16)
    p.add_argument("--flip-z-ids", type=int, nargs="*", default=[9])
    p.add_argument("--layout", type=Path,
                   help="known world layout JSON {tag_id: [x,y,z]} -> one "
                        "multi-tag SQPnP bundle solve for the camera pose "
                        "(mpe_final_view_tag_bundle_with_cad.py TAG_3D_"
                        "POSITIONS semantics)")
    p.add_argument("--json", type=Path)
    args = p.parse_args(argv)

    rgb = load_rgb(args.color)
    h, w = rgb.shape[:2]
    intr = resolve_intrinsics(args, w, h)
    depth = (load_depth_m(args.depth) if args.depth
             else np.zeros((h, w), np.float32))
    if depth.shape != (h, w):
        raise SystemExit(
            f"Depth size mismatch: COLOR {w}x{h} vs DEPTH "
            f"{depth.shape[1]}x{depth.shape[0]}")

    det = detect_tags(jnp.asarray(rgb), DetectorConfig())
    ids = np.asarray(det.ids)
    valid = np.asarray(det.valid)
    if args.tag_ids:
        valid = valid & np.isin(ids, args.tag_ids)
    if not valid.any():
        raise SystemExit(
            f"No requested tags {args.tag_ids} found. "
            f"Detected: {ids[np.asarray(det.valid)].tolist()}")

    if args.layout:
        import json as _json

        import jax.numpy as _jnp

        from repas_tpu.pose.bundle import solve_tag_bundle

        layout = {int(k): v for k, v in
                  _json.loads(args.layout.read_text()).items()}
        n = len(ids)
        centers_w = np.zeros((n, 3), np.float32)
        bundle_valid = np.zeros(n, bool)
        for i in range(n):
            if valid[i] and int(ids[i]) in layout:
                centers_w[i] = layout[int(ids[i])]
                bundle_valid[i] = True
        if not bundle_valid.any():
            raise SystemExit(f"no detected tags in layout {sorted(layout)}")
        R, t, err = solve_tag_bundle(
            det.corners, det.centers, _jnp.asarray(bundle_valid),
            _jnp.asarray(centers_w), args.tag_size,
            intr.K.astype(np.float32),
            _jnp.asarray(intr.dist, np.float32))
        out = {
            "mode": "bundle",
            "tags_used": [int(i) for i in ids[bundle_valid]],
            "R_world_to_camera": np.asarray(R).tolist(),
            "t_world_to_camera": np.asarray(t).tolist(),
            "reproj_err_px": float(err),
        }
        log.info("bundle solve over %d tags: reproj %.3f px",
                 int(bundle_valid.sum()), float(err))
        emit_json(out, args.json)
        return out

    fused = fuse_tag_poses(
        det.corners, det.ids, det.areas, jnp.asarray(valid),
        jnp.asarray(depth), intr.K.astype(np.float32),
        jnp.asarray(intr.dist, jnp.float32), args.tag_size,
        anchor_id=args.anchor_id,
        flip_z_ids=jnp.asarray(args.flip_z_ids or [-1], jnp.int32))

    out = {
        "tags": [
            {
                "id": int(ids[i]),
                "R": np.asarray(fused.R)[i].tolist(),
                "t": np.asarray(fused.t)[i].tolist(),
                "P_depth": np.asarray(fused.P_depth)[i].tolist(),
                "P_depth_valid": bool(np.asarray(fused.P_depth_valid)[i]),
                "reproj_err_px": float(np.asarray(fused.err_px)[i]),
                "weight": float(np.asarray(fused.weights)[i]),
            }
            for i in range(len(ids)) if valid[i]
        ],
        "R_avg": np.asarray(fused.R_avg).tolist(),
        "anchor_id": int(ids[int(fused.anchor_idx)]),
        "anchor_t": np.asarray(fused.anchor_t).tolist(),
        "anchor_P_depth": np.asarray(fused.anchor_P_depth).tolist(),
    }
    for tag in out["tags"]:
        log.info("id=%d reproj=%.2fpx weight=%.1f", tag["id"],
                 tag["reproj_err_px"], tag["weight"])
    emit_json(out, args.json)
    return out


if __name__ == "__main__":
    main()
