"""Robust detection retry ladder (C2).

The reference retries detection over enhancement + parameter variants when
a frame is hard: CLAHE + a quad_decimate ladder (detect_best_tag,
vis_tool_april_tag_pose_validaiton.py:65-86: pass 1 decimate 1.0/sigma 0,
pass 2 decimate 0.5/sigma 1, accept margin >= 10) and a gamma-LUT variant
(vis_tool_solvepnp.py:35-45). Sequential retries become batched variant
sweeps: all enhancement variants run as one vmapped batch per decimate
setting, and results merge by decision margin.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect.detector import Detections, detect_tags
from repas_tpu.kernels.image import clahe, gamma_lut, gaussian_blur, rgb_to_gray


def _merge_by_margin(dets: list[Detections], D: int) -> Detections:
    """Concatenate detection sets, dedupe by id keeping max margin,
    return the top-D slots."""
    ids = jnp.concatenate([d.ids.reshape(-1) for d in dets])
    margins = jnp.concatenate([
        jnp.where(d.valid.reshape(-1), d.decision_margin.reshape(-1), -1.0)
        for d in dets])
    corners = jnp.concatenate([d.corners.reshape(-1, 4, 2) for d in dets])
    centers = jnp.concatenate([d.centers.reshape(-1, 2) for d in dets])
    hams = jnp.concatenate([d.hamming.reshape(-1) for d in dets])
    areas = jnp.concatenate([d.areas.reshape(-1) for d in dets])

    n = ids.shape[0]
    order = jnp.argsort(-margins)
    ids_sorted = ids[order]
    same = ids_sorted[:, None] == ids_sorted[None, :]
    earlier = jnp.tril(same, k=-1).any(axis=1)
    keep_sorted = (~earlier) & (margins[order] > 0)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)

    score = jnp.where(keep, margins, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, D)
    sel = top_scores > 0
    return Detections(
        ids=jnp.where(sel, ids[top_idx], -1),
        corners=corners[top_idx],
        centers=centers[top_idx],
        decision_margin=jnp.where(sel, margins[top_idx], 0.0),
        hamming=hams[top_idx],
        areas=areas[top_idx],
        valid=sel,
    )


def detect_tags_robust(img: jnp.ndarray,
                       config: DetectorConfig = DetectorConfig(),
                       use_clahe: bool = True, use_gamma: bool = True,
                       full_res_pass: bool = True,
                       gamma: float = 0.7) -> Detections:
    """Detect over [raw, blurred, CLAHE, gamma] enhancement variants —
    plus a decimate-1 pass when config decimates — and merge by decision
    margin. Per tag id the best-margin detection wins.
    """
    gray = rgb_to_gray(img) if img.ndim == 3 else img.astype(jnp.float32)
    variants = [gray, gaussian_blur(gray, 1.0)]
    if use_clahe:
        variants.append(clahe(gray))
    if use_gamma:
        variants.append(gamma_lut(gray, gamma))
    batch = jnp.stack(variants)
    dets = [jax.vmap(lambda g: detect_tags(g, config))(batch)]

    if full_res_pass and config.quad_decimate > 1:
        cfg1 = dataclasses.replace(config, quad_decimate=1.0)
        batch1 = jnp.stack([gray, variants[2] if use_clahe else gray])
        dets.append(jax.vmap(lambda g: detect_tags(g, cfg1))(batch1))

    return _merge_by_margin(dets, config.max_detections)
