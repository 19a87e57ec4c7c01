"""Golden tests on the checked-in reference captures (SURVEY.md §4/§7
parity gates). Heavy at 720p — gated behind REPAS_GOLDEN=1; run them on
the TPU backend:

    REPAS_GOLDEN=1 REPAS_TEST_TPU=1 python -m pytest tests/test_golden.py
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(not os.environ.get("REPAS_GOLDEN"),
                                reason="set REPAS_GOLDEN=1 (slow, 720p)")

ALIGNED = "/root/reference/realsense_d415i/testing_scripts/aligned_outputs"
RS_CAL = "/root/reference/realsense_d415i/april_tag_detection_caliberation"


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp
    return jnp


def test_detect_real_captures(reference_root, jnp):
    """Every checked-in aligned capture contains tag 16; the detector
    (with the CLAHE retry ladder the reference also uses on these
    captures) must find it with hamming 0 and margin >= the reference's
    acceptance threshold of 10."""
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect.robust import detect_tags_robust
    from repas_tpu.io.replay import ReplayBackend

    rb = ReplayBackend(reference_root /
                       "realsense_d415i/testing_scripts/aligned_outputs")
    found = 0
    for f in rb.read_all():
        det = detect_tags_robust(jnp.asarray(f.color), DetectorConfig())
        v = np.asarray(det.valid)
        ids = np.asarray(det.ids)[v].tolist()
        if 16 in ids:
            i = np.asarray(det.ids).tolist().index(16)
            assert int(np.asarray(det.hamming)[i]) == 0
            assert float(np.asarray(det.decision_margin)[i]) >= 10.0
            found += 1
    assert found >= 5, f"tag 16 found in only {found} captures"


def test_pose_depth_consistency(reference_root, jnp):
    """PnP z vs aligned-depth z at the tag center (the C25b validation,
    vis_tool_april_tag_pose_validaiton.py): must agree within 5%."""
    from repas_tpu.core.calib import load_intrinsics_json
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect.robust import detect_tags_robust
    from repas_tpu.io.replay import ReplayBackend
    from repas_tpu.kernels.pointcloud import median_depth_window
    from repas_tpu.pose.pnp import solve_pnp_best_order

    intr = load_intrinsics_json(
        f"{RS_CAL}/factory_color_intrinsics_1280_720.json")
    rb = ReplayBackend(reference_root /
                       "realsense_d415i/testing_scripts/aligned_outputs")
    checked = 0
    for f in rb.read_all():
        det = detect_tags_robust(jnp.asarray(f.color), DetectorConfig())
        v = np.asarray(det.valid)
        if not v.any():
            continue
        i = int(np.argmax(np.where(v, np.asarray(det.decision_margin), -1)))
        K = intr.scaled(f.color.shape[1], f.color.shape[0]).K.astype(
            np.float32)
        R, t, err, order = solve_pnp_best_order(
            det.corners[i], K, jnp.zeros(8), 0.0303)
        assert float(err) < 2.0, f"reproj {float(err)} px"
        # depth image is 640x360 aligned; project tag center into it
        # (one capture dir has an extra rgb frame with no depth pair)
        t = np.asarray(t)
        depth = f.depth_meters()
        if depth is None:
            continue
        Kd = intr.scaled(depth.shape[1], depth.shape[0]).K
        u = int(round(Kd[0, 0] * t[0] / t[2] + Kd[0, 2]))
        vpx = int(round(Kd[1, 1] * t[1] / t[2] + Kd[1, 2]))
        z_pcd = float(median_depth_window(jnp.asarray(depth), u, vpx, 5))
        if z_pcd > 0:
            assert abs(z_pcd - t[2]) / z_pcd < 0.05, (t[2], z_pcd)
            checked += 1
    assert checked >= 2


def test_canopy_golden(reference_root, jnp):
    """Reproduce the recorded canopy_y values (SURVEY.md §7 gate)."""
    from repas_tpu.canopy import measure_plant_height
    from repas_tpu.core.config import CanopyConfig
    from repas_tpu.io.image import read_image

    base = reference_root / "realsense_d415i/canopy_detection/new-captures"
    # RealSense 1280x720 factory-ish intrinsics (the exact values the
    # capture session used are not checked in; fx~910 at 720p per
    # three_pose_vertical_translation_validation.py:29-33)
    K = np.array([[912.35, 0, 628.78], [0, 911.78, 348.98], [0, 0, 1.0]])
    ok, results = 0, []
    for stamp in ["2025-11-14T143013", "2025-11-14T143028",
                  "2025-11-14T143037", "2025-11-14T143042"]:
        rgb = read_image(base / f"canopy_capture_{stamp}_HD.png")
        depth = read_image(base / f"depth_snapshot_{stamp}_HD.png")
        truth = float((base / f"canopy_y_{stamp}.txt").read_text())
        res = measure_plant_height(
            jnp.asarray(rgb),
            jnp.asarray(depth.astype(np.float32) / 1000.0), K,
            CanopyConfig())
        got = float(res.canopy_3d[1])
        results.append((stamp, got, truth, bool(res.found)))
        if res.found and abs(got - truth) < 0.025:
            ok += 1
    assert ok >= 2, f"canopy parity too low: {results}"
