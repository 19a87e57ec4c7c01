"""Pinhole + Brown-Conrady projection math (batched, pure JAX).

Replaces cv2.projectPoints / rs2_deproject_pixel_to_point /
rs2_project_point_to_pixel call sites. The reference reimplements the
pinhole forms in NumPy at canopy_return_upgraded.py:259-308 and
create_masked_ply.py:74-107; the distortion model follows OpenCV's 8-coeff
rational Brown-Conrady (k1,k2,p1,p2,k3,k4,k5,k6), superset of the
5-coefficient vectors in the checked-in calibrations.

All functions broadcast over leading axes and are jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply Brown-Conrady distortion to normalized image coords (...,2)."""
    dist = jnp.asarray(dist)
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    k4 = dist[5] if dist.shape[0] > 5 else jnp.zeros_like(k1)
    k5 = dist[6] if dist.shape[0] > 6 else jnp.zeros_like(k1)
    k6 = dist[7] if dist.shape[0] > 7 else jnp.zeros_like(k1)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    radial = num / den
    xt = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yt = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([x * radial + xt, y * radial + yt], axis=-1)


def undistort_points(uv: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
                     iters: int = 10) -> jnp.ndarray:
    """Pixel coords -> undistorted normalized coords via fixed-point
    iteration (cv2.undistortPoints equivalent)."""
    K = jnp.asarray(K)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    target = jnp.stack([xd, yd], axis=-1)

    def body(_, xy):
        d = distort_normalized(xy, dist)
        return xy + (target - d)

    return jax.lax.fori_loop(0, iters, body, target)


def project_points(pts: jnp.ndarray, rvec, tvec, K, dist=None) -> jnp.ndarray:
    """cv2.projectPoints equivalent: object points (...,3) -> pixels (...,2).

    rvec may be a (3,) axis-angle vector or a (3,3) rotation matrix.
    """
    from repas_tpu.core.transforms import rodrigues

    pts = jnp.asarray(pts)
    rvec = jnp.asarray(rvec)
    R = rvec if rvec.shape[-2:] == (3, 3) else rodrigues(rvec)
    t = jnp.asarray(tvec).reshape(3)
    cam = pts @ R.T + t
    return project_camera_points(cam, K, dist)


def project_camera_points(cam: jnp.ndarray, K, dist=None) -> jnp.ndarray:
    """Camera-frame points (...,3) -> pixel coords (...,2)."""
    K = jnp.asarray(K)
    z = cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xy = cam[..., :2] / zsafe[..., None]
    if dist is not None:
        # always apply the polynomial (identity at zero coeffs) — gating
        # on any(dist != 0) would zero the gradient w.r.t. dist at the
        # origin, freezing distortion in calibration's LM
        xy = distort_normalized(xy, jnp.asarray(dist))
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def deproject_pixels(uv: jnp.ndarray, depth: jnp.ndarray, K, dist=None,
                     undistort_iters: int = 10) -> jnp.ndarray:
    """Pixels (...,2) + depth (...,) -> camera-frame 3D points (...,3).

    Matches deproject_pixel_to_point (canopy_return_upgraded.py:259-282) when
    dist is None/zero: X=(u-cx)Z/fx, Y=(v-cy)Z/fy, Z=Z.
    """
    K = jnp.asarray(K)
    uv = jnp.asarray(uv)
    depth = jnp.asarray(depth)
    # The dist-vs-None branch must be static: bool(jnp.any(...)) on a traced
    # array raises TracerBoolConversionError under jit/vmap. The fixed-point
    # undistort is the identity at zero coefficients, so always run it when
    # a dist argument is given.
    if dist is not None:
        xy = undistort_points(uv, K, dist, iters=undistort_iters)
    else:
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        xy = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy],
                       axis=-1)
    return jnp.concatenate([xy * depth[..., None], depth[..., None]], axis=-1)


def reprojection_error(obj_pts, img_pts, rvec, tvec, K, dist=None):
    """Mean L2 pixel error of projected vs detected points
    (compute_reproj_error, final_view_with_cad.py:169-175)."""
    proj = project_points(obj_pts, rvec, tvec, K, dist)
    return jnp.mean(jnp.linalg.norm(proj - img_pts, axis=-1))
