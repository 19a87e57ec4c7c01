import os

import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.canopy import (canny_edges, detect_rotate_bar,
                              green_seed_mask, hough_horizontal_bar,
                              measure_plant_height)
from repas_tpu.canopy.segment import apply_green_mask, canopy_level_mark, refine_plant_mask
from repas_tpu.core.config import CanopyConfig
from repas_tpu.kernels.image import (get_rotation_matrix_2d, invert_affine,
                                     rgb_to_hsv_cv, transform_points_2d,
                                     warp_affine)


def test_hsv_matches_opencv_convention():
    # pure green: H=60 in OpenCV's 0-180 scale, S=V=255
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 1] = 255
    hsv = np.asarray(rgb_to_hsv_cv(jnp.asarray(rgb)))
    np.testing.assert_allclose(hsv[0, 0], [60.0, 255.0, 255.0], atol=0.5)
    # gray: S=0
    gray = np.full((1, 1, 3), 77, dtype=np.uint8)
    hsv2 = np.asarray(rgb_to_hsv_cv(jnp.asarray(gray)))
    assert hsv2[0, 0, 1] == 0.0 and hsv2[0, 0, 2] == 77.0


def test_rotation_matrix_roundtrip():
    M = get_rotation_matrix_2d((50, 40), 17.0)
    Mi = invert_affine(M)
    p = jnp.array([10.0, 20.0])
    q = transform_points_2d(M, p)
    back = transform_points_2d(Mi, q)
    np.testing.assert_allclose(np.asarray(back), [10.0, 20.0], atol=1e-4)
    # center is fixed
    c = transform_points_2d(M, jnp.array([50.0, 40.0]))
    np.testing.assert_allclose(np.asarray(c), [50.0, 40.0], atol=1e-4)


def test_canny_detects_step_edge():
    img = np.full((64, 96), 40.0, dtype=np.float32)
    img[32:, :] = 200.0
    e = np.asarray(canny_edges(jnp.asarray(img)))
    rows = np.where(e.any(axis=1))[0]
    assert len(rows) > 0
    assert abs(rows.mean() - 31.5) < 2.5
    assert e[rows].mean() > 0.5  # long horizontal edge rows


def test_hough_finds_tilted_bar():
    h, w = 120, 320
    img = np.full((h, w), 30.0, dtype=np.float32)
    # draw a bright bar at ~5 deg
    xs = np.arange(20, 300)
    ys = (60 + np.tan(np.deg2rad(5.0)) * (xs - 160)).astype(int)
    for dy in range(-3, 4):
        img[ys + dy, xs] = 220.0
    edges = canny_edges(jnp.asarray(img))
    line = hough_horizontal_bar(edges, threshold=40, min_line_frac=0.1)
    assert bool(line.found)
    assert abs(float(line.angle_deg) - 5.0) < 1.5
    assert float(line.coverage) > 0.5


def test_detect_rotate_bar_levels_image():
    h, w = 120, 320
    rgb = np.full((h, w, 3), 30, dtype=np.uint8)
    xs = np.arange(10, 310)
    ys = (60 + np.tan(np.deg2rad(8.0)) * (xs - 160)).astype(int)
    for dy in range(-2, 3):
        rgb[ys + dy, xs] = 220
    line, M, rotated = detect_rotate_bar(jnp.asarray(rgb))
    assert bool(line.found)
    assert abs(float(line.angle_deg) - 8.0) < 1.5
    # after rotation the bar should be horizontal: bar-intensity pixels
    # (220; excludes the 255 white border fill) span few rows
    g = np.asarray(rotated).mean(axis=-1)
    bar_rows = np.where(((g > 180) & (g < 245)).sum(axis=1) > 50)[0]
    assert np.ptp(bar_rows) <= 4


def _plant_scene():
    """240x320 scene: gray bg, green plant blob, bright horizontal bar."""
    rgb = np.full((240, 320, 3), 120, dtype=np.uint8)
    # bar at y=200
    rgb[198:203, 10:310] = 240
    # plant: green blob rows 80..180
    yy, xx = np.mgrid[0:240, 0:320]
    blob = ((yy - 130) ** 2 / 2500 + (xx - 160) ** 2 / 900) < 1.0
    rgb[blob] = [40, 170, 50]
    return rgb, blob


def test_segmentation_and_canopy_mark():
    rgb, blob = _plant_scene()
    seed = green_seed_mask(jnp.asarray(rgb))
    assert np.asarray(seed)[blob].mean() > 0.9
    fg = refine_plant_mask(jnp.asarray(rgb), seed, iters=3)
    plant = apply_green_mask(jnp.asarray(rgb), fg)
    p = np.asarray(plant)
    assert p[blob].mean() > 0.8
    assert p[~blob].mean() < 0.02
    cy, cx, found = canopy_level_mark(plant)
    assert bool(found)
    true_top = np.where(blob.any(axis=1))[0][0]
    assert abs(int(cy) - true_top) <= 3


def test_full_height_pipeline_synthetic():
    rgb, blob = _plant_scene()
    depth = np.full((240, 320), 0.8, dtype=np.float32)
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1.0]])
    res = measure_plant_height(jnp.asarray(rgb), jnp.asarray(depth), K,
                               CanopyConfig(hough_threshold=40))
    assert bool(res.found)
    # expected: bar at y=200, canopy top ~ y=80 -> dy ~ 120 px at 0.8m,
    # f=300 -> height ~ 120*0.8/300 = 0.32 m
    assert abs(float(res.plant_height_m) - 0.32) < 0.03
    # bar Y below center -> positive Y; canopy above -> negative
    assert float(res.bar_3d[1]) > 0 > float(res.canopy_3d[1])


@pytest.mark.skipif(not os.environ.get("REPAS_GOLDEN"),
                    reason="golden canopy run is slow; set REPAS_GOLDEN=1")
def test_golden_canopy_captures(reference_root):
    """Reproduce the recorded canopy_y values on the checked-in captures
    (SURVEY.md §7 parity gate: heights within noise)."""
    from repas_tpu.io.image import read_image

    base = reference_root / "realsense_d415i/canopy_detection/new-captures"
    K = np.array([[907.0, 0, 640.0], [0, 907.0, 360.0], [0, 0, 1.0]])
    stamps = ["2025-11-14T143013", "2025-11-14T143028",
              "2025-11-14T143037", "2025-11-14T143042"]
    for stamp in stamps:
        rgb = read_image(base / f"canopy_capture_{stamp}_HD.png")
        depth = read_image(base / f"depth_snapshot_{stamp}_HD.png")
        truth = float((base / f"canopy_y_{stamp}.txt").read_text())
        res = measure_plant_height(
            jnp.asarray(rgb), jnp.asarray(depth.astype(np.float32) / 1000.0),
            K)
        got = float(res.canopy_3d[1])
        assert abs(got - truth) < 0.02, (stamp, got, truth)
