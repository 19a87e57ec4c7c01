"""Depth -> color alignment on device.

Replaces the SDK C++ aligners (Orbbec AlignFilter(align_to=COLOR_STREAM),
better_three_capture.py:169,187-196; rs.align(color),
canopy_return_upgraded.py:590,604-607). The math is pure intrinsics +
depth->color extrinsics: deproject every depth pixel, transform into the
color camera frame, project into the color image, z-buffer splat.

Implemented as a fixed-shape scatter-min (XLA lowers this to an efficient
on-device scatter); a small dilation pass fills single-pixel holes the way
the SDK's interpolation does.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from repas_tpu.kernels.pointcloud import depth_image_to_points
from repas_tpu.kernels.project import project_camera_points


@functools.partial(jax.jit, static_argnames=("out_shape", "fill_holes"))
def align_depth_to_color(depth_m: jnp.ndarray, K_depth, K_color, R_d2c, t_d2c,
                         out_shape: tuple[int, int],
                         fill_holes: bool = True) -> jnp.ndarray:
    """Warp a depth image (meters, depth-camera grid) onto the color grid.

    Returns (H_c, W_c) float32 meters; 0 where no depth projects.
    """
    hc, wc = out_shape
    K_color = jnp.asarray(K_color, jnp.float32)
    R = jnp.asarray(R_d2c, jnp.float32)
    t = jnp.asarray(t_d2c, jnp.float32).reshape(3)

    pts_d = depth_image_to_points(depth_m, K_depth)          # (H,W,3)
    pts_c = pts_d @ R.T + t                                  # color frame
    uv = project_camera_points(pts_c, K_color)               # (H,W,2)
    z = pts_c[..., 2]
    valid = (depth_m > 0) & (z > 1e-6)

    # splat into a 2x2 footprint to close sub-pixel gaps from the reproject
    u0 = jnp.floor(uv[..., 0]).astype(jnp.int32)
    v0 = jnp.floor(uv[..., 1]).astype(jnp.int32)
    big = jnp.float32(1e9)
    out = jnp.full((hc, wc), big, dtype=jnp.float32)
    zflat = jnp.where(valid, z, big).reshape(-1)
    for du in (0, 1):
        for dv in (0, 1):
            uu = (u0 + du).reshape(-1)
            vv = (v0 + dv).reshape(-1)
            inb = (uu >= 0) & (uu < wc) & (vv >= 0) & (vv < hc)
            idx = jnp.where(inb, vv * wc + uu, 0)
            vals = jnp.where(inb, zflat, big)
            out = out.reshape(-1).at[idx].min(vals).reshape(hc, wc)

    if fill_holes:
        # fill remaining holes with the min of the 3x3 neighborhood
        neigh = -jax.lax.reduce_window(
            -out, -big, jax.lax.max, (3, 3), (1, 1), "SAME")
        out = jnp.where(out >= big, neigh, out)

    return jnp.where(out >= big, 0.0, out)
