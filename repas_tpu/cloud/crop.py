"""Tag-anchored scene cropping (C12, april_tag_bg_removal_pl.py).

The reference defines a box in the tag-local frame via front/back offsets
per axis (lines 40-48), transforms its 8 corners to the camera frame
(transform_point_tag_local_to_camera, lines 177-187), takes the axis-
aligned bounding box of those corners, and masks the point cloud with it
(lines 450-468). Same contract here, as pure masked array ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from repas_tpu.core.config import CropConfig


def obb_from_tag(R: jnp.ndarray, t: jnp.ndarray, cfg: CropConfig):
    """8 box corners in camera frame from tag pose + tag-local offsets.

    Box spans [-dx_back, +dx_front] x [-dy_back, +dy_front] x
    [-dz_back, +dz_front] in the tag frame (reference lines 40-48 use
    d*_front/back naming).
    """
    xs = jnp.array([cfg.dx_front, -cfg.dx_back])
    ys = jnp.array([cfg.dy_front, -cfg.dy_back])
    zs = jnp.array([cfg.dz_front, -cfg.dz_back])
    corners = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"),
                        axis=-1).reshape(8, 3)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32).reshape(3)
    return corners @ R.T + t


def aabb_mask(pts: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
              pad: float = 0.0) -> jnp.ndarray:
    """Inside-AABB mask (april_tag_bg_removal_pl.py:450-468)."""
    return jnp.all((pts >= lo - pad) & (pts <= hi + pad), axis=-1)


def tag_frame_aabb_crop(pts: jnp.ndarray, mask: jnp.ndarray,
                        R: jnp.ndarray, t: jnp.ndarray, cfg: CropConfig):
    """Crop a cloud to the tag-anchored box.

    Returns (mask', aabb_lo, aabb_hi, box_corners_cam) — the camera-frame
    AABB of the tag-local box, as the reference does (AABB of the 8
    transformed corners, not an oriented box test).
    """
    corners = obb_from_tag(R, t, cfg)
    lo = jnp.min(corners, axis=0)
    hi = jnp.max(corners, axis=0)
    inside = aabb_mask(pts, lo, hi, pad=cfg.pad_m)
    return mask & inside, lo, hi, corners
