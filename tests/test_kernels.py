import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.kernels import (align_depth_to_color, deproject_pixels,
                               depth_image_to_points, depth_to_meters,
                               distort_normalized, median_depth_window,
                               project_points, rgbd_to_pointcloud,
                               undistort_points)
from repas_tpu.kernels.pointcloud import fused_pointcloud
from repas_tpu.core.transforms import rodrigues

K = np.array([[600.0, 0, 320.0], [0, 610.0, 240.0], [0, 0, 1.0]])


def test_project_deproject_roundtrip(rng):
    pts = rng.uniform(0.3, 2.0, size=(50, 3)).astype(np.float32)
    pts[:, :2] = rng.uniform(-0.5, 0.5, size=(50, 2))
    uv = project_points(jnp.asarray(pts), jnp.zeros(3), jnp.zeros(3), K)
    back = deproject_pixels(uv, jnp.asarray(pts[:, 2]), K)
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_project_matches_reference_pinhole():
    # canopy_return_upgraded.py:284-308: x = X*fx/Z + cx
    p = jnp.array([[0.1, -0.2, 1.5]])
    uv = np.asarray(project_points(p, jnp.zeros(3), jnp.zeros(3), K))
    assert abs(uv[0, 0] - (0.1 * 600 / 1.5 + 320)) < 1e-4
    assert abs(uv[0, 1] - (-0.2 * 610 / 1.5 + 240)) < 1e-4


def test_project_with_rotation(rng):
    rvec = jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.3)
    tvec = jnp.array([0.05, -0.02, 1.0])
    obj = jnp.asarray(rng.uniform(-0.1, 0.1, size=(8, 3)).astype(np.float32))
    uv = project_points(obj, rvec, tvec, K)
    # manual
    R = np.asarray(rodrigues(rvec))
    cam = np.asarray(obj) @ R.T + np.asarray(tvec)
    expect = np.stack([600 * cam[:, 0] / cam[:, 2] + 320,
                       610 * cam[:, 1] / cam[:, 2] + 240], axis=1)
    np.testing.assert_allclose(np.asarray(uv), expect, atol=1e-3)


def test_distortion_roundtrip(rng):
    dist = jnp.array([0.09, -0.115, 0.0013, 0.002, 0.046, 0, 0, 0])
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32))
    xyd = distort_normalized(xy, dist)
    # undistort via pixel-space helper
    uv = jnp.stack([600 * xyd[:, 0] + 320, 610 * xyd[:, 1] + 240], axis=1)
    back = undistort_points(uv, K, dist, iters=20)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-5)


def test_depth_image_to_points():
    depth = jnp.ones((48, 64), dtype=jnp.float32) * 2.0
    pts = depth_image_to_points(depth, K)
    assert pts.shape == (48, 64, 3)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), 2.0)
    # center pixel maps close to optical axis
    np.testing.assert_allclose(
        np.asarray(pts[24, 32]),
        [(32 - 320) / 600 * 2, (24 - 240) / 610 * 2, 2.0], atol=1e-5)


def test_rgbd_to_pointcloud_masks():
    depth = np.full((8, 16), 1.5, dtype=np.float32)
    depth[0, 0] = 0.0        # invalid
    depth[1, 1] = np.nan     # invalid
    rgb = np.full((8, 16, 3), 128, dtype=np.uint8)
    pts, cols, valid = rgbd_to_pointcloud(jnp.asarray(rgb), jnp.asarray(depth), K)
    assert pts.shape == (128, 3) and valid.shape == (128,)
    v = np.asarray(valid)
    assert not v[0] and not v[17] and v.sum() == 126
    np.testing.assert_allclose(np.asarray(cols)[v], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pts)[0], 0.0)


def test_fused_pointcloud_xla_fallback():
    depth = (np.ones((16, 128)) * 1000).astype(np.uint16)
    rgb = np.zeros((16, 128, 3), dtype=np.uint8)
    out = fused_pointcloud(jnp.asarray(depth), jnp.asarray(rgb), K)
    assert out.shape == (6, 16 * 128)
    np.testing.assert_allclose(np.asarray(out)[2, :], 1.0, atol=1e-6)


def test_median_depth_window():
    depth = np.zeros((20, 20), dtype=np.float32)
    depth[9:12, 9:12] = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 100.0]]
    med = float(median_depth_window(jnp.asarray(depth), 10, 10, win=5))
    # valid values are the 9 nonzero ones; median = 5.0
    assert abs(med - 5.0) < 1e-6
    # empty window -> 0.0
    assert float(median_depth_window(jnp.asarray(depth), 0, 0, win=3)) == 0.0
    # even count: mean of middle two
    depth2 = np.zeros((5, 5), dtype=np.float32)
    depth2[2, 2] = 1.0
    depth2[2, 3] = 3.0
    med2 = float(median_depth_window(jnp.asarray(depth2), 2, 2, win=3))
    assert abs(med2 - 2.0) < 1e-6


def test_align_identity_extrinsics():
    # depth and color share intrinsics + identity extrinsics -> align is
    # (nearly) the identity warp
    depth = np.zeros((48, 64), dtype=np.float32)
    depth[10:30, 20:40] = 1.25
    out = align_depth_to_color(jnp.asarray(depth), K, K, np.eye(3),
                               np.zeros(3), out_shape=(48, 64))
    out = np.asarray(out)
    inner = out[11:29, 21:39]
    np.testing.assert_allclose(inner, 1.25, atol=1e-5)
    assert out[0, 0] == 0.0


def test_align_translation_shifts():
    # translate depth camera 10cm along +x: points land left in color image
    depth = np.full((48, 64), 1.0, dtype=np.float32)
    t = np.array([0.1, 0.0, 0.0])
    out = np.asarray(align_depth_to_color(
        jnp.asarray(depth), K, K, np.eye(3), t, out_shape=(48, 64),
        fill_holes=False))
    # u shift = fx * 0.1 / 1.0 = 60 px -> only columns >= 60 get values
    # (shift is +x so pixels move right by 60)
    assert (out[:, :59] == 0).all()
    assert (out[:, 61:] == 1.0).all()


def test_replay_backend(reference_root):
    from repas_tpu.io.replay import ReplayBackend, select_profile, StreamProfile

    rb = ReplayBackend(
        reference_root / "realsense_d415i/testing_scripts/aligned_outputs",
        intrinsics_json=reference_root /
        "realsense_d415i/april_tag_detection_caliberation/factory_color_intrinsics_1280_720.json")
    frames = rb.read_all()
    assert len(frames) >= 3
    f = frames[0]
    assert f.color.shape == (720, 1280, 3)
    assert f.depth_raw is not None and f.depth_raw.dtype == np.uint16
    assert f.color_intrinsics.width == 1280
    d = f.depth_meters()
    assert d is not None and 0.1 < np.median(d[d > 0]) < 10

    profs = rb.profiles()
    p = select_profile(profs, "color", 1280, 720)
    assert p.stream == "color" and p.width == 1280
    # fallback ladder: non-existent size falls back to default
    p2 = select_profile(profs, "color", 999, 999)
    assert p2.width == 1280
    with pytest.raises(LookupError):
        select_profile(profs, "infrared", 640, 480)


def test_ccl_pallas_parity_interpret(rng):
    """The Pallas CCL kernel (used on TPU backends) is bit-identical to
    the XLA scan formulation; interpret mode exercises the kernel's own
    code path on any backend. Small image — interpret mode is slow."""
    from repas_tpu.kernels.ccl import _connected_components_xla
    from repas_tpu.kernels.ccl_pallas import connected_components_pallas

    mask = jnp.asarray(rng.random((64, 128)) > 0.55)
    ref = np.asarray(_connected_components_xla(mask, iters=5))
    got = np.asarray(connected_components_pallas(mask, iters=5,
                                                 interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_ccl_pallas_tiled_parity_interpret(rng):
    """The band-tiled Pallas CCL (used on TPU for images beyond
    single-block VMEM capacity) matches the XLA path bit-for-bit."""
    from repas_tpu.kernels.ccl import _connected_components_xla
    from repas_tpu.kernels.ccl_pallas import connected_components_pallas_tiled

    mask = jnp.asarray(rng.random((64, 256)) > 0.55)
    ref = np.asarray(_connected_components_xla(mask, iters=5))
    got = np.asarray(connected_components_pallas_tiled(mask, iters=5,
                                                       interpret=True))
    np.testing.assert_array_equal(ref, got)
