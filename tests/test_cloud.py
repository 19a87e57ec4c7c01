import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.cloud import (aabb_mask, create_masked_pointcloud,
                             estimate_normals, nearest_neighbors,
                             radius_mask, statistical_outlier_mask,
                             tag_frame_aabb_crop, voxel_downsample)
from repas_tpu.cloud.registration import icp_point_to_plane
from repas_tpu.core.config import CropConfig
from repas_tpu.core.transforms import make_T, rodrigues


def test_radius_mask():
    pts = jnp.array([[0.1, 0, 0], [2.0, 0, 0], [0, 0.5, 0.5]])
    m = radius_mask(pts, jnp.ones(3, bool), max_dist=1.0)
    np.testing.assert_array_equal(np.asarray(m), [True, False, True])


def test_voxel_downsample_merges(rng):
    # two tight clusters; grid origin = min point, so place the second
    # cluster mid-cell relative to the first (0.2 apart, voxel 0.08 ->
    # offset land at 2.5 cells, a half-cell away from any boundary)
    a = rng.normal(scale=0.001, size=(50, 3)) + [0.03, 0.03, 0.03]
    b = rng.normal(scale=0.001, size=(50, 3)) + [0.23, 0.03, 0.03]
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    mask = jnp.ones(100, bool)
    out, _, _, valid = voxel_downsample(pts, mask, 0.08)
    v = np.asarray(valid)
    assert v.sum() == 2
    centers = np.asarray(out)[v]
    got = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(got[0], a.mean(axis=0), atol=1e-3)
    np.testing.assert_allclose(got[1], b.mean(axis=0), atol=1e-3)


def test_statistical_outlier(rng):
    pts = rng.normal(scale=0.01, size=(500, 3)).astype(np.float32)
    pts[0] = [5.0, 5.0, 5.0]  # gross outlier
    m = statistical_outlier_mask(jnp.asarray(pts), jnp.ones(500, bool),
                                 nb_neighbors=10, std_ratio=2.0)
    m = np.asarray(m)
    assert not m[0]
    assert m[1:].mean() > 0.9


def test_nearest_neighbors(rng):
    tgt = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    q = tgt[:50] + rng.normal(scale=1e-4, size=(50, 3)).astype(np.float32)
    nn, d = nearest_neighbors(jnp.asarray(tgt), jnp.ones(300, bool),
                              jnp.asarray(q), jnp.ones(50, bool),
                              cell=0.05, dims=(32, 32, 32))
    nn = np.asarray(nn)
    assert (nn == np.arange(50)).mean() > 0.95
    assert np.asarray(d)[nn >= 0].max() < 0.01


def test_normals_plane(rng):
    # points on z=0 plane -> normals along +-z, oriented toward camera at
    # origin... camera at origin lies IN the plane; use camera above
    pts = np.column_stack([rng.uniform(-1, 1, 400), rng.uniform(-1, 1, 400),
                           np.zeros(400)]).astype(np.float32)
    nrm, ok = estimate_normals(jnp.asarray(pts), jnp.ones(400, bool),
                               k=16, radius=0.5, camera=jnp.array([0., 0., 5.]))
    nrm = np.asarray(nrm)[np.asarray(ok)]
    assert len(nrm) > 300
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-2)
    assert (nrm[:, 2] > 0).all()  # toward camera


def test_tag_crop():
    cfg = CropConfig(dx_front=0.1, dx_back=0.1, dy_front=0.1, dy_back=0.1,
                     dz_front=0.1, dz_back=0.1)
    pts = jnp.array([[0.0, 0.0, 0.5], [0.05, 0.0, 0.5], [0.5, 0.5, 2.0]])
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 0.5])
    m, lo, hi, corners = tag_frame_aabb_crop(pts, jnp.ones(3, bool), R, t,
                                             cfg)
    np.testing.assert_array_equal(np.asarray(m), [True, True, False])
    np.testing.assert_allclose(np.asarray(lo), [-0.1, -0.1, 0.4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(hi), [0.1, 0.1, 0.6], atol=1e-6)


def test_create_masked_pointcloud():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 0.8, dtype=np.float32)
    rgb = np.full((48, 64, 3), 200, dtype=np.uint8)
    mask = np.zeros((48, 64), dtype=np.uint8)
    mask[10:30, 20:50] = 1
    out = create_masked_pointcloud(jnp.asarray(rgb), jnp.asarray(depth), K,
                                   mask=jnp.asarray(mask), outlier_nb=0)
    v = np.asarray(out.valid)
    assert v.sum() == 20 * 30
    np.testing.assert_allclose(np.asarray(out.points)[v][:, 2], 0.8,
                               atol=1e-6)


def test_icp_recovers_small_transform(rng):
    # plane + bumps, known small rigid offset
    base = np.column_stack([
        rng.uniform(-0.5, 0.5, 2000), rng.uniform(-0.5, 0.5, 2000),
        np.zeros(2000)]).astype(np.float32)
    base[:, 2] = 0.05 * np.sin(4 * base[:, 0]) + 0.05 * np.cos(3 * base[:, 1])
    rv = np.array([0.01, -0.015, 0.02], dtype=np.float32)
    t = np.array([0.01, 0.005, -0.008], dtype=np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rv)))
    src = (base - t) @ R  # src transformed by (R,t) lands on base
    normals = np.zeros_like(base)
    # analytic normals of the height field
    nx = -0.2 * np.cos(4 * base[:, 0])
    ny = 0.15 * np.sin(3 * base[:, 1])
    nz = np.ones(2000)
    nrm = np.column_stack([nx, ny, nz])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    res = icp_point_to_plane(
        jnp.asarray(src), jnp.ones(2000, bool),
        jnp.asarray(base), jnp.ones(2000, bool), jnp.asarray(nrm),
        max_corr_dist=0.05, max_iters=50, dims=(32, 32, 32))
    T = np.asarray(res.T)
    T_true = np.asarray(make_T(jnp.asarray(R), jnp.asarray(t)))
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=2e-3)
    np.testing.assert_allclose(T[:3, :3], T_true[:3, :3], atol=2e-2)
    assert float(res.fitness) > 0.9
