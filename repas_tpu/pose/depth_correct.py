"""Depth-corrected translation (C7).

Re-implements the correction loop at mpa_final_view_with_export.py:297-313
and april_tag_bg_removal_pl.py:330-344: project the PnP tvec into the
image, take a median-window depth there, deproject to get P_depth, and use
it in place of the PnP translation. Also the Z-only scale variant
(vis_tool_april_tag_pose_validaiton.py:259-271).
"""
from __future__ import annotations

import jax.numpy as jnp

from repas_tpu.kernels.pointcloud import median_depth_window


def depth_corrected_translation(t: jnp.ndarray, depth_m: jnp.ndarray, K,
                                win: int = 5, fallback_win: int = 11):
    """Returns (P_depth (3,), valid (bool)).

    P_depth = deproject(round(project(t)), median depth) — exactly the
    reference recipe: u,v = round(K t / t_z); Zc = median window depth;
    X=(u-cx)Zc/fx, Y=(v-cy)Zc/fy. Falls back to a larger window when the
    small one has no valid depth; invalid when t_z <= 0, the pixel is
    outside the image, or no depth exists at all.
    """
    K = jnp.asarray(K, jnp.float32)
    t = jnp.asarray(t, jnp.float32).reshape(3)
    h, w = depth_m.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    tz_ok = t[2] > 1e-6
    z = jnp.where(tz_ok, t[2], 1.0)
    u = jnp.round(fx * t[0] / z + cx).astype(jnp.int32)
    v = jnp.round(fy * t[1] / z + cy).astype(jnp.int32)
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    Zc = median_depth_window(depth_m, u, v, win=win)
    Zc_fb = median_depth_window(depth_m, u, v, win=fallback_win)
    Zc = jnp.where(Zc > 0, Zc, Zc_fb)
    valid = tz_ok & in_img & (Zc > 0)
    X = (u.astype(jnp.float32) - cx) / fx * Zc
    Y = (v.astype(jnp.float32) - cy) / fy * Zc
    P = jnp.stack([X, Y, Zc])
    return jnp.where(valid, P, t), valid


def z_scale_correction(t: jnp.ndarray, z_pcd: jnp.ndarray):
    """Scale the whole translation so its z matches a measured depth:
    s = z_pcd / t_z; t' = s * t (vis_tool_april_tag_pose_validaiton.py:259-271).
    """
    t = jnp.asarray(t).reshape(3)
    s = jnp.where(jnp.abs(t[2]) > 1e-9, z_pcd / t[2], 1.0)
    return t * s, s
