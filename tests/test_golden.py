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
    results, errs = [], []
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
        assert res.found, f"canopy bar not found: {stamp}"
        errs.append(abs(got - truth))
    # every capture reproduces the recorded canopy_y within 25 mm (the
    # truth comes from the reference's GrabCut pipeline — a different
    # segmentation algorithm — so a small systematic gap remains);
    # median agreement well under that (measured 2.5-16.3 mm, r2)
    assert max(errs) < 0.025, f"canopy parity: {results}"
    assert float(np.median(errs)) < 0.015, f"canopy parity: {results}"


def test_three_pose_vertical_translation(reference_root, jnp):
    """The strongest checked-in physical ground truth: the camera was
    moved by a known vertical offset between the three aligned captures
    (three_pose_vertical_translation_validation.py:120-177). Gates:

      * every pose solves with sub-2px reprojection,
      * inter-pose rotation is bounded (the rig translated; the gate is
        25 deg, not tighter, because near-fronto planar IPPE carries the
        well-known two-solution ambiguity ~2x tilt apart — the reference
        script asserts nothing about rotation at all, it only prints
        translation deltas — while a corner-order bug shows up as
        90/180 deg and must fail),
      * the dominant translation component is camera-Y (vertical),
        consistent in direction across both steps,
      * delta composition: d13 == d12 + d23 (exactly, by construction)
        and |d13| > |d12|, |d23| (same-direction steps),
      * the PnP z-deltas agree with the aligned-depth z-deltas at the
        projected tag center (two independent sensors of the same
        motion) within 10 mm.
    """
    from repas_tpu.core.calib import load_intrinsics_json
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect.robust import detect_tags_robust
    from repas_tpu.io.replay import ReplayBackend
    from repas_tpu.kernels.pointcloud import median_depth_window
    from repas_tpu.pose.pnp import solve_pnp_ippe_square

    intr = load_intrinsics_json(
        f"{RS_CAL}/factory_color_intrinsics_1280_720.json")
    poses = {}
    for p in (1, 2, 3):
        rb = ReplayBackend(reference_root /
                           f"realsense_d415i/testing_scripts/aligned_outputs"
                           f"/pose {p}")
        frame = None
        for f in rb.read_all():
            if f.depth_meters() is not None:
                frame = f
                break
        assert frame is not None, f"pose {p}: no depth-paired capture"
        det = detect_tags_robust(jnp.asarray(frame.color), DetectorConfig())
        v = np.asarray(det.valid)
        ids = np.asarray(det.ids)
        slots = [j for j in range(len(ids)) if v[j] and ids[j] == 16]
        assert slots, f"pose {p}: tag 16 not found"
        i = slots[0]
        K = intr.scaled(frame.color.shape[1],
                        frame.color.shape[0]).K.astype(np.float32)
        # decoded corners are canonically ordered (decode pins the
        # rotation): IPPE-square directly — the 8-order search ties
        # across the square's 90-degree symmetries and can pick a
        # different (rotated) order per capture
        R, t, err = solve_pnp_ippe_square(
            det.corners[i], K, jnp.zeros(8), 0.0303)
        assert float(err) < 2.0, f"pose {p}: reproj {float(err):.2f} px"
        R, t = np.asarray(R), np.asarray(t)
        depth = frame.depth_meters()
        Kd = intr.scaled(depth.shape[1], depth.shape[0]).K
        u = int(round(Kd[0, 0] * t[0] / t[2] + Kd[0, 2]))
        vv = int(round(Kd[1, 1] * t[1] / t[2] + Kd[1, 2]))
        z = float(median_depth_window(jnp.asarray(depth), u, vv, 5))
        poses[p] = (R, t, z)

    from repas_tpu.core.transforms import rotation_angle_deg
    d12 = poses[2][1] - poses[1][1]
    d23 = poses[3][1] - poses[2][1]
    d13 = poses[3][1] - poses[1][1]
    for a, b, d in ((1, 2, d12), (2, 3, d23)):
        ang = float(rotation_angle_deg(
            jnp.asarray(poses[b][0], jnp.float32),
            jnp.asarray(poses[a][0], jnp.float32)))
        assert ang < 25.0, f"rotation {a}->{b} = {ang:.2f} deg"
        # vertical rig: Y dominates the in-plane translation
        assert abs(d[1]) > abs(d[0]), f"{a}->{b}: {d}"
    # same direction, accumulating magnitude
    assert d12[1] * d23[1] > 0, (d12, d23)
    assert abs(d13[1]) > max(abs(d12[1]), abs(d23[1]))
    np.testing.assert_allclose(d13, d12 + d23, atol=1e-9)
    # PnP z-motion vs depth z-motion: two sensors, same physical move
    for (a, b) in ((1, 2), (2, 3), (1, 3)):
        dz_pnp = poses[b][1][2] - poses[a][1][2]
        dz_depth = poses[b][2] - poses[a][2]
        assert abs(dz_pnp - dz_depth) < 0.010, (
            f"{a}->{b}: PnP dz {dz_pnp:.4f} vs depth dz {dz_depth:.4f}")
