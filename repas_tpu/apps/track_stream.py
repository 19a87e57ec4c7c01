"""Streaming multi-tag 6-DOF tracking over a replayed capture stream —
the BASELINE.json configs[2] shape ("streaming 30fps multi-tag 6DOF
tracking") and the live-loop role of better_three_capture.py /
realtime_pose_estimation_april_tag.py, driven by the replay backend.

Frames stream through the fused on-device pipeline; per-frame fused poses
are printed/exported and a rolling FPS counter reports throughput
(SURVEY.md §5.1 ad-hoc FPS counters, promoted to utils.profiling).

  python -m repas_tpu.apps.track_stream --source captures/ \
      --intrinsics K.json [--frames 100] [--loop] [--out poses.jsonl]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import add_intrinsics_args, log, resolve_intrinsics
from repas_tpu.core.config import PipelineConfig
from repas_tpu.io.replay import ReplayBackend
from repas_tpu.pipeline import process_frame
from repas_tpu.utils.profiling import FpsCounter


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", type=Path, required=True)
    add_intrinsics_args(p)
    p.add_argument("--frames", type=int, default=0, help="0 = one pass")
    p.add_argument("--loop", action="store_true")
    p.add_argument("--tag-size", type=float, default=0.0303)
    p.add_argument("--out", type=Path, help="JSONL of per-frame poses")
    p.add_argument("--no-pointcloud", action="store_true")
    p.add_argument("--robust", action="store_true",
                   help="per-frame enhancement retry ladder (CLAHE/gamma, "
                        "the reference's recipe for hard frames); slower")
    p.add_argument("--temporal", action="store_true",
                   help="register-then-track with a pose prior: detect in "
                        "a small ROI around the predicted tag and GN-refine "
                        "the previous pose (run_custom.py:33-76 shape); "
                        "falls back to full detection on track loss")
    args = p.parse_args(argv)

    rb = ReplayBackend(args.source, loop=args.loop)
    if len(rb) == 0:
        raise SystemExit(f"no captures under {args.source}")

    cfg = PipelineConfig()
    fps = FpsCounter(tag="track")
    out_f = None
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        out_f = open(args.out, "w")

    tracker = None
    n = 0
    try:
        for frame in rb.frames():
            h, w = frame.color.shape[:2]
            intr = resolve_intrinsics(args, w, h)
            if args.temporal:
                from repas_tpu.pose.track import TagTracker, TrackerConfig
                if tracker is None:
                    tracker = TagTracker(
                        intr.K.astype(np.float32), tag_size=args.tag_size,
                        config=TrackerConfig(robust_register=args.robust))
                res = tracker.step(frame.color)
                rec = {
                    "frame": n, "timestamp": frame.timestamp,
                    "mode": res.mode, "ok": bool(res.ok),
                    "tag_id": int(res.tag_id),
                    "R": np.asarray(res.R).tolist(),
                    "t": np.asarray(res.t).tolist(),
                    "err_px": float(res.err_px),
                }
                if out_f:
                    out_f.write(json.dumps(rec) + "\n")
                fps.tick()
                n += 1
                if args.frames and n >= args.frames:
                    break
                continue
            depth_m = frame.depth_meters()
            if depth_m is None:
                depth_u16 = np.zeros((h, w), np.uint16)
            else:
                if depth_m.shape != (h, w):
                    # depth saved at lower res: upsample nearest to color grid
                    ry = h // depth_m.shape[0]
                    rx = w // depth_m.shape[1]
                    depth_m = np.repeat(np.repeat(depth_m, ry, 0), rx, 1)[:h, :w]
                depth_u16 = np.clip(depth_m / cfg.depth.depth_scale, 0,
                                    65535).astype(np.uint16)
            K = intr.K.astype(np.float32)
            if args.robust:
                from repas_tpu.detect.robust import detect_tags_robust
                from repas_tpu.pose.fusion import fuse_tag_poses

                det = detect_tags_robust(jnp.asarray(frame.color),
                                         cfg.detector)
                pose = fuse_tag_poses(
                    det.corners, det.ids, det.areas, det.valid,
                    jnp.asarray(depth_u16.astype(np.float32)
                                * cfg.depth.depth_scale), K,
                    jnp.zeros(8, jnp.float32), args.tag_size,
                    anchor_id=cfg.anchor_id)
            else:
                res = process_frame(jnp.asarray(frame.color),
                                    jnp.asarray(depth_u16), K, cfg,
                                    with_pointcloud=not args.no_pointcloud)
                det, pose = res.detections, res.pose
            ids = np.asarray(det.ids)
            valid = np.asarray(det.valid)
            rec = {
                "frame": n,
                "timestamp": frame.timestamp,
                "ids": ids[valid].tolist(),
                "R_avg": np.asarray(pose.R_avg).tolist(),
                "anchor_P_depth": np.asarray(pose.anchor_P_depth).tolist(),
                "margins": np.asarray(det.decision_margin)[valid].tolist(),
            }
            if out_f:
                out_f.write(json.dumps(rec) + "\n")
            fps.tick()
            n += 1
            if args.frames and n >= args.frames:
                break
    finally:
        if out_f:
            out_f.close()
    log.info("tracked %d frames (last fps %.1f)", n, fps.fps)


if __name__ == "__main__":
    main()
