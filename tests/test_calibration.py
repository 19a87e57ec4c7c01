import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.calib import (calibrate_camera, detect_checkerboard_corners,
                             refine_corners_subpix)
from repas_tpu.core.transforms import rodrigues
from repas_tpu.kernels.project import project_points

K_TRUE = np.array([[760.0, 0, 640.0], [0, 758.0, 360.0], [0, 0, 1.0]])
DIST_TRUE = np.array([0.09, -0.11, 0.001, 0.002, 0.04], dtype=np.float64)


def board_points(cols=9, rows=7, square=0.0127):
    xx, yy = np.meshgrid(np.arange(cols), np.arange(rows))
    return np.column_stack([xx.reshape(-1) * square, yy.reshape(-1) * square,
                            np.zeros(cols * rows)]).astype(np.float32)


def synth_views(n_views, cols=9, rows=7, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    obj = board_points(cols, rows)
    objs, imgs = [], []
    for _ in range(n_views):
        rv = rng.normal(size=3)
        rv = rv / np.linalg.norm(rv) * rng.uniform(0.1, 0.5)
        center = obj.mean(axis=0)
        t = -np.asarray(rodrigues(jnp.asarray(rv.astype(np.float32)))) @ center
        t = np.asarray(t) + [rng.uniform(-0.05, 0.05),
                             rng.uniform(-0.05, 0.05), rng.uniform(0.4, 0.8)]
        uv = np.asarray(project_points(jnp.asarray(obj),
                                       jnp.asarray(rv.astype(np.float32)),
                                       jnp.asarray(t.astype(np.float32)),
                                       K_TRUE, jnp.asarray(DIST_TRUE)))
        uv = uv + rng.normal(scale=noise, size=uv.shape)
        objs.append(obj)
        imgs.append(uv.astype(np.float32))
    return np.stack(objs), np.stack(imgs)


def test_calibrate_noise_free():
    objs, imgs = synth_views(8)
    K, dist, rms, rv, tv = calibrate_camera(objs, imgs, (1280, 720),
                                            iters=60)
    assert rms < 0.05, rms
    np.testing.assert_allclose(K[0, 0], K_TRUE[0, 0], rtol=2e-3)
    np.testing.assert_allclose(K[1, 1], K_TRUE[1, 1], rtol=2e-3)
    np.testing.assert_allclose(K[0, 2], K_TRUE[0, 2], atol=2.0)
    np.testing.assert_allclose(dist[:2], DIST_TRUE[:2], atol=5e-3)


def test_calibrate_with_noise():
    objs, imgs = synth_views(12, noise=0.2, seed=1)
    K, dist, rms, rv, tv = calibrate_camera(objs, imgs, (1280, 720),
                                            iters=60)
    assert rms < 0.4
    np.testing.assert_allclose(K[0, 0], K_TRUE[0, 0], rtol=0.02)
    np.testing.assert_allclose(K[0, 2], K_TRUE[0, 2], atol=10.0)


def render_board(cols=7, rows=5, cell=24, margin=40, angle=0.0):
    """Host-rendered checkerboard; returns (image, inner corners (r*c,2))."""
    h = rows * cell + 2 * margin + cell
    w = cols * cell + 2 * margin + cell
    img = np.full((h, w), 200.0, dtype=np.float32)
    for i in range(rows + 1):
        for j in range(cols + 1):
            if (i + j) % 2 == 0:
                y0 = margin + i * cell
                x0 = margin + j * cell
                img[y0:y0 + cell, x0:x0 + cell] = 40.0
    corners = []
    for i in range(1, rows + 1):
        for j in range(1, cols + 1):
            corners.append([margin + j * cell - 0.5, margin + i * cell - 0.5])
    return img, np.asarray(corners, dtype=np.float32)


def test_detect_checkerboard_corners():
    img, truth = render_board()
    got, ok = detect_checkerboard_corners(jnp.asarray(img), cols=7, rows=5)
    assert bool(ok)
    got = np.asarray(got)
    # row-major board order must match truth order (within a pixel or two)
    np.testing.assert_allclose(got, truth, atol=2.0)
    refined = np.asarray(refine_corners_subpix(jnp.asarray(img),
                                               jnp.asarray(got)))
    err = np.abs(refined - truth).max()
    assert err < 0.35, err
