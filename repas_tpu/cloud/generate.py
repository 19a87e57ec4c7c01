"""Masked colored point-cloud generation pipeline (C11,
create_masked_ply.py:56-186): RGB + depth-meters + binary mask ->
deproject -> voxel downsample -> statistical outlier removal -> normals
toward camera. One fused on-device pass per stage, fixed shapes + masks.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from repas_tpu.cloud.filters import statistical_outlier_mask, voxel_downsample
from repas_tpu.cloud.normals import estimate_normals
from repas_tpu.kernels.pointcloud import rgbd_to_pointcloud


class MaskedCloud(NamedTuple):
    points: jnp.ndarray
    colors: jnp.ndarray
    normals: jnp.ndarray
    valid: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("voxel", "outlier_nb",
                                             "with_normals"))
def create_masked_pointcloud(rgb: jnp.ndarray, depth_m: jnp.ndarray, K,
                             mask: jnp.ndarray | None = None,
                             voxel: float = 0.0,
                             outlier_nb: int = 20,
                             outlier_std: float = 2.0,
                             with_normals: bool = False,
                             min_depth: float = 0.0,
                             max_depth: float = 10.0) -> MaskedCloud:
    """create_masked_pointcloud (create_masked_ply.py:56-107) + the
    downstream filter chain (:163-174). voxel=0 skips downsampling,
    outlier_nb=0 skips outlier removal.

    max_depth defaults to 10 m: real sensors mark invalid pixels with
    saturated u16 (65535 mm) which would otherwise poison voxel grids and
    AABBs; the reference gates ToF validity to 0.25-8 m
    (april_tag_detector_ToF.py:33-34)."""
    pts, cols, valid = rgbd_to_pointcloud(rgb, depth_m, K, mask=mask,
                                          min_depth=min_depth,
                                          max_depth=max_depth)

    if voxel and voxel > 0:
        pts, cols, _, valid = voxel_downsample(pts, valid, voxel,
                                               colors=cols)
    if outlier_nb:
        valid = statistical_outlier_mask(pts, valid,
                                         nb_neighbors=outlier_nb,
                                         std_ratio=outlier_std)
    if with_normals:
        normals, _ = estimate_normals(pts, valid)
    else:
        normals = jnp.zeros_like(pts)
    pts = jnp.where(valid[:, None], pts, 0.0)
    cols = jnp.where(valid[:, None], cols, 0.0)
    return MaskedCloud(points=pts, colors=cols, normals=normals, valid=valid)
