"""Checkerboard calibration from captured images — mirrors
checkerboard_callibration.py (offline: a directory of board views instead
of live right-click capture).

  python -m repas_tpu.apps.calibrate --images dir/ --cols 19 --rows 19 \
      --square-mm 12.7 --out calib.json [--npz calib.npz]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import log
from repas_tpu.calib import (calibrate_camera, detect_checkerboard_corners,
                             refine_corners_subpix)
from repas_tpu.core.calib import Intrinsics, save_intrinsics_json
from repas_tpu.io.image import read_image
from repas_tpu.kernels.image import rgb_to_gray


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=Path, required=True)
    p.add_argument("--cols", type=int, default=19)
    p.add_argument("--rows", type=int, default=19)
    p.add_argument("--square-mm", type=float, default=12.7)
    p.add_argument("--out", type=Path, required=True)
    p.add_argument("--npz", type=Path)
    args = p.parse_args(argv)

    paths = sorted(list(args.images.glob("*.png"))
                   + list(args.images.glob("*.jpg")))
    if len(paths) < 3:
        raise SystemExit(f"need >= 3 board views, found {len(paths)}")

    sq = args.square_mm / 1000.0
    xx, yy = np.meshgrid(np.arange(args.cols), np.arange(args.rows))
    obj = np.column_stack([xx.reshape(-1) * sq, yy.reshape(-1) * sq,
                           np.zeros(args.cols * args.rows)]).astype(np.float32)

    objs, imgs = [], []
    size = None
    for path in paths:
        img = read_image(path)
        gray = jnp.asarray(np.asarray(rgb_to_gray(jnp.asarray(img))))
        size = (gray.shape[1], gray.shape[0])
        corners, ok = detect_checkerboard_corners(gray, args.cols, args.rows)
        if not bool(ok):
            log.warning("%s: board not found, skipping", path.name)
            continue
        corners = refine_corners_subpix(gray, corners)
        objs.append(obj)
        imgs.append(np.asarray(corners))
        log.info("%s: %d corners", path.name, len(obj))

    if len(objs) < 3:
        raise SystemExit(f"only {len(objs)} usable views")

    K, dist, rms, rv, tv = calibrate_camera(np.stack(objs), np.stack(imgs),
                                            size)
    log.info("RMS reprojection error: %.4f px", rms)
    log.info("K:\n%s", K)

    intr = Intrinsics(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                      width=size[0], height=size[1], dist=dist[:5])
    save_intrinsics_json(intr, args.out, "lean", extra={
        "dist_coeffs": dist[:5].tolist(),
        "checkerboard_inner_corners": {"cols": args.cols, "rows": args.rows},
        "square_size_mm": args.square_mm,
        "rms_px": rms,
    })
    if args.npz:
        np.savez(args.npz, K=K, dist=dist[:5][None], image_size=size,
                 checkerboard=[args.cols, args.rows],
                 square_size_mm=args.square_mm, rms=rms)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
