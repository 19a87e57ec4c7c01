"""Robust detection retry ladder (C2).

The reference retries detection over enhancement variants when a frame is
hard: CLAHE + parameter ladder (detect_best_tag,
vis_tool_april_tag_pose_validaiton.py:65-86: pass 1 decimate 1.0/sigma 0,
pass 2 decimate 0.5/sigma 1, accept margin >= 10) and a gamma-LUT variant
(vis_tool_solvepnp.py:35-45). Sequential retries are replaced by running
the detector over all enhancement variants as one batch and merging by
decision margin — same robustness, one device dispatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect.detector import Detections, detect_tags
from repas_tpu.kernels.image import clahe, gamma_lut, gaussian_blur, rgb_to_gray


def detect_tags_robust(img: jnp.ndarray,
                       config: DetectorConfig = DetectorConfig(),
                       use_clahe: bool = True, use_gamma: bool = True,
                       gamma: float = 0.7) -> Detections:
    """Detect over [raw, blurred, CLAHE, gamma] variants, merge by margin.

    Returns a single fixed-capacity Detections with, per tag id, the
    variant detection with the highest decision margin.
    """
    gray = rgb_to_gray(img) if img.ndim == 3 else img.astype(jnp.float32)
    variants = [gray, gaussian_blur(gray, 1.0)]
    if use_clahe:
        variants.append(clahe(gray))
    if use_gamma:
        variants.append(gamma_lut(gray, gamma))
    batch = jnp.stack(variants)
    dets = jax.vmap(lambda g: detect_tags(g, config))(batch)

    # flatten variants x slots, dedupe by id keeping max margin
    V, D = dets.ids.shape
    ids = dets.ids.reshape(-1)
    margins = jnp.where(dets.valid.reshape(-1),
                        dets.decision_margin.reshape(-1), -1.0)
    # suppress duplicates: a slot loses if another slot shares its id with
    # a strictly better (margin, index) key
    order = jnp.argsort(-margins)
    ids_sorted = ids[order]
    first_of_id = jnp.ones_like(ids_sorted, dtype=bool)
    # mark later occurrences of the same id as dupes (O(n^2), n = V*D small)
    same = (ids_sorted[:, None] == ids_sorted[None, :])
    earlier = jnp.tril(same, k=-1).any(axis=1)
    keep_sorted = first_of_id & (~earlier) & (margins[order] > 0)

    keep = jnp.zeros(V * D, bool).at[order].set(keep_sorted)
    score = jnp.where(keep, margins, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, D)
    sel = top_scores > 0
    flat = lambda x: x.reshape((V * D,) + x.shape[2:])
    return Detections(
        ids=jnp.where(sel, flat(dets.ids)[top_idx], -1),
        corners=flat(dets.corners)[top_idx],
        centers=flat(dets.centers)[top_idx],
        decision_margin=jnp.where(sel, flat(dets.decision_margin)[top_idx],
                                  0.0),
        hamming=flat(dets.hamming)[top_idx],
        areas=flat(dets.areas)[top_idx],
        valid=sel,
    )
