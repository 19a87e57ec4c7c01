"""Depth -> point-cloud kernels.

On-device replacements for the SDK C++ point-cloud paths
(PointCloudFilter with RGB_POINT, better_three_capture.py:233-242;
rs.pointcloud map_to/calculate, capture_aligned_all.py:78,208-216) and the
reference's own NumPy meshgrid deprojection (create_masked_ply.py:56-107).

Two implementations of the fused u16-depth -> meters -> XYZ -> +RGB path:
  * `rgbd_to_pointcloud` — pure-XLA (fuses fine on TPU, works everywhere)
  * `fused_pointcloud_kernel` — Pallas TPU kernel, row-tile grid, for the
    hot streaming loop (one pass over HBM, no intermediates)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def depth_to_meters(depth_u16: jnp.ndarray, scale: float = 0.001) -> jnp.ndarray:
    """u16 depth -> float32 meters (better_three_capture.py:118-125)."""
    return depth_u16.astype(jnp.float32) * jnp.float32(scale)


def depth_image_to_points(depth_m: jnp.ndarray, K) -> jnp.ndarray:
    """Dense deprojection: (H,W) meters -> (H,W,3) camera-frame XYZ.

    Matches the meshgrid deproject in create_masked_pointcloud
    (create_masked_ply.py:74-107).
    """
    K = jnp.asarray(K, dtype=jnp.float32)
    h, w = depth_m.shape[-2], depth_m.shape[-1]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    z = depth_m
    x = (u - cx) / fx * z
    y = (v - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def rgbd_to_pointcloud(rgb: jnp.ndarray, depth_m: jnp.ndarray, K,
                       mask: jnp.ndarray | None = None,
                       min_depth: float = 1e-6,
                       max_depth: float = jnp.inf):
    """RGB (H,W,3 uint8) + aligned depth (H,W m) -> flat colored cloud.

    Returns (points (H*W,3) f32, colors (H*W,3) f32 in [0,1],
    valid (H*W,) bool). Invalid slots hold zeros; consumers filter by the
    mask (fixed shapes keep this jittable and shardable).
    """
    pts = depth_image_to_points(depth_m, K)
    valid = (depth_m > min_depth) & (depth_m < max_depth) & jnp.isfinite(depth_m)
    if mask is not None:
        valid = valid & (mask > 0)
    pts = jnp.where(valid[..., None], pts, 0.0)
    cols = rgb.astype(jnp.float32) / 255.0
    cols = jnp.where(valid[..., None], cols, 0.0)
    return (pts.reshape(-1, 3), cols.reshape(-1, 3), valid.reshape(-1))


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_pointcloud(depth_u16: jnp.ndarray, rgb: jnp.ndarray, K,
                     scale: float = 0.001):
    """Fused u16 depth + RGB -> PLANAR (6, H*W) [x,y,z,r,g,b] rows.

    Pallas on TPU; falls back to the XLA path on non-TPU backends or odd
    shapes. Planar (structure-of-arrays) is the TPU-native layout: each
    channel is a full-lane (H*W,) row, so the producing kernel and every
    downstream elementwise/reduce op run at memory bandwidth. The
    xyzrgb-rows (H*W, 6) layout tiles its minor dim at 6/128 lane
    utilization — materializing it cost more than the whole deprojection
    (0.37 vs 0.24 ms/frame measured, tools/micro_perf.py). Use
    `xyzrgb_rows` only at export boundaries (PLY writers, Open3D
    interop).

    `rgb` may be (H,W,3) uint8 or an already-packed (H,W) uint32
    (r|g<<8|b<<16, kernels.image.pack_rgb_u32) — pipelines that also
    grayscale the frame pack once and share."""
    h, w = depth_u16.shape
    if jax.default_backend() == "tpu" and w % 128 == 0 and h % 16 == 0:
        out = _fused_pointcloud_pallas(depth_u16, rgb,
                                       jnp.asarray(K, jnp.float32),
                                       jnp.float32(scale))
        return out.reshape(6, -1)
    if rgb.ndim == 2:    # packed u32 -> (H,W,3) u8 for the XLA fallback
        rgb = jnp.stack([(rgb & 255), (rgb >> 8) & 255,
                         (rgb >> 16) & 255], axis=-1).astype(jnp.uint8)
    pts, cols, valid = rgbd_to_pointcloud(rgb, depth_to_meters(depth_u16, scale), K)
    return jnp.concatenate([pts.T, cols.T], axis=0)


def xyzrgb_rows(pc_planar: jnp.ndarray) -> jnp.ndarray:
    """(6, N) planar cloud -> (N, 6) xyzrgb rows (export/Open3D interop
    boundary only — the transpose materializes the 6-minor layout that
    the hot path deliberately avoids)."""
    return pc_planar.T


def _fused_pointcloud_pallas(depth_u16, rgb, K, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = depth_u16.shape
    tile_h = 16  # u16 min tile is (16, 128)

    # pack RGB into one int32 word per pixel so the kernel reads 32-bit
    # lanes. pack_rgb_u32's pad+bitcast is the only near-bandwidth
    # (H,W,3)-u8 access pattern on v5e (see kernels/image.py); the
    # previous 12-byte->3-lane repack paid stride-3 sub-lane loads and
    # dominated the pointcloud stage's cost.
    if rgb.ndim == 2:                  # pre-packed u32
        rgb32 = rgb.astype(jnp.int32) & 0xFFFFFF
    elif rgb.dtype == jnp.uint8:
        from repas_tpu.kernels.image import pack_rgb_u32
        rgb32 = pack_rgb_u32(rgb).astype(jnp.int32) & 0xFFFFFF
    else:
        rgb32 = (rgb[..., 0].astype(jnp.int32)
                 | (rgb[..., 1].astype(jnp.int32) << 8)
                 | (rgb[..., 2].astype(jnp.int32) << 16))

    def kernel(k_ref, d_ref, c_ref, out_ref):
        i = pl.program_id(0)
        fx, fy, cx, cy, s = (k_ref[0], k_ref[1], k_ref[2], k_ref[3], k_ref[4])
        # mosaic lacks a u16->f32 cast; bitcast to i16, widen, re-mask
        d_i32 = pltpu.bitcast(d_ref[:, :], jnp.int16).astype(jnp.int32) & 0xFFFF
        z = d_i32.astype(jnp.float32) * s
        u = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1).astype(jnp.float32)
        v = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0)
             + i * tile_h).astype(jnp.float32)
        packed = c_ref[:, :]
        # zero colors where depth is invalid, matching rgbd_to_pointcloud
        inv255 = jnp.where(z > 0, jnp.float32(1.0 / 255.0), 0.0)
        out_ref[0, :, :] = (u - cx) * z * (1.0 / fx)
        out_ref[1, :, :] = (v - cy) * z * (1.0 / fy)
        out_ref[2, :, :] = z
        out_ref[3, :, :] = (packed & 0xFF).astype(jnp.float32) * inv255
        out_ref[4, :, :] = ((packed >> 8) & 0xFF).astype(jnp.float32) * inv255
        out_ref[5, :, :] = ((packed >> 16) & 0xFF).astype(jnp.float32) * inv255

    kvec = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2], scale])
    out = pl.pallas_call(
        kernel,
        grid=(h // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, tile_h, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, h, w), jnp.float32),
    )(kvec, depth_u16, rgb32)
    return out


def masked_median_depth_window(depth_m: jnp.ndarray, mask: jnp.ndarray,
                               u, v, win: int = 25) -> jnp.ndarray:
    """Median of valid depths over MASK-TRUE pixels in a win x win window
    around (u,v); 0.0 when none.

    Robustifies depth lookup at thin structures: a plant leaf tip is
    1-2 px wide, so the plain 5x5 median (median_depth_window) reads the
    background *through* it (measured 7.9 m vs the true 1.07 m on the
    checked-in canopy captures). Restricting the median to plant-mask
    pixels in a wider window anchors the depth to the plant body."""
    h, w = depth_m.shape
    r = max(1, win // 2)
    u = jnp.clip(jnp.asarray(u, jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.asarray(v, jnp.int32), 0, h - 1)
    du = jnp.arange(-r, r + 1)
    uu = jnp.clip(u + du[None, :], 0, w - 1)
    vv = jnp.clip(v + du[:, None], 0, h - 1)
    patch = depth_m[vv, uu]
    mpatch = mask[vv, uu]
    valid = jnp.isfinite(patch) & (patch > 0) & mpatch
    n = jnp.sum(valid)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    vals = jnp.sort(jnp.where(valid, patch, big).reshape(-1))
    lo = vals[jnp.maximum((n - 1) // 2, 0)]
    hi = vals[jnp.maximum(n // 2, 0)]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, 0.0)


def median_depth_window(depth_m: jnp.ndarray, u, v, win: int = 5) -> jnp.ndarray:
    """Median of valid depths in a win x win window around (u,v).

    Matches median_depth (mpa_final_view_with_export.py:76-83) /
    get_depth_at_pixel (canopy_return_upgraded.py:310-348): median over
    finite positive values only; 0.0 when none. u,v may be traced scalars.
    """
    h, w = depth_m.shape
    r = max(1, win // 2)
    k = 2 * r + 1
    u = jnp.clip(jnp.asarray(u, jnp.int32), 0, w - 1)
    v = jnp.clip(jnp.asarray(v, jnp.int32), 0, h - 1)
    # gather k x k patch with edge clamping (reference clips the window to
    # the image, which only changes the valid count at borders; clamped
    # duplicate pixels are also valid there, keeping the median close)
    du = jnp.arange(-r, r + 1)
    uu = jnp.clip(u + du[None, :], 0, w - 1)
    vv = jnp.clip(v + du[:, None], 0, h - 1)
    patch = depth_m[vv, uu]
    valid = jnp.isfinite(patch) & (patch > 0)
    n = jnp.sum(valid)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    vals = jnp.sort(jnp.where(valid, patch, big).reshape(-1))
    lo = vals[jnp.maximum((n - 1) // 2, 0)]
    hi = vals[jnp.maximum(n // 2, 0)]
    med = 0.5 * (lo + hi)
    return jnp.where(n > 0, med, 0.0)
