"""Detect tag36h11 tags in image(s) — mirrors april_tag_id_detector.py /
april_tag_detector_img.py.

  python -m repas_tpu.apps.detect_tags IMAGE [IMAGE...] [--json OUT]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from repas_tpu.apps._common import emit_json, load_rgb, log
from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect import detect_tags


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("images", nargs="+", type=Path)
    p.add_argument("--json", type=Path, help="write detections JSON here")
    p.add_argument("--min-margin", type=float, default=10.0)
    args = p.parse_args(argv)

    cfg = DetectorConfig(min_decision_margin=args.min_margin)
    results = []
    for path in args.images:
        img = load_rgb(path)
        det = detect_tags(jnp.asarray(img), cfg)
        valid = np.asarray(det.valid)
        entry = {
            "image": str(path),
            "detections": [
                {
                    "id": int(np.asarray(det.ids)[i]),
                    "corners": np.asarray(det.corners)[i].tolist(),
                    "center": np.asarray(det.centers)[i].tolist(),
                    "decision_margin": float(np.asarray(det.decision_margin)[i]),
                    "hamming": int(np.asarray(det.hamming)[i]),
                }
                for i in range(len(valid)) if valid[i]
            ],
        }
        log.info("%s: ids %s", path.name,
                 [d["id"] for d in entry["detections"]])
        results.append(entry)
    emit_json(results, args.json)
    return results


if __name__ == "__main__":
    main()
