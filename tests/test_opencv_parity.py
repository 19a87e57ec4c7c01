"""Direct numerical parity vs OpenCV (the reference's actual solver,
N2) — runnable here because the image ships opencv-python. Each test
compares our JAX solver against the cv2 call the reference makes.
Skipped wholesale where cv2 is unavailable."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from repas_tpu.core.transforms import rodrigues, rotation_angle_deg  # noqa: E402
from repas_tpu.kernels.project import project_points  # noqa: E402
from repas_tpu.pose.pnp import (solve_pnp_best_order,  # noqa: E402
                                solve_pnp_sqpnp, square_object_points)

K = np.array([[912.35, 0, 628.78], [0, 911.78, 348.98], [0, 0, 1.0]])
DIST5 = np.array([0.12, -0.25, 0.001, -0.002, 0.08])
TAG = 0.0303


def _pose(rng):
    rvec = rng.uniform(-0.3, 0.3, 3)
    rvec[2] = rng.uniform(-1.0, 1.0)
    tvec = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                     rng.uniform(0.4, 0.9)])
    return rvec.astype(np.float64), tvec.astype(np.float64)


def test_project_points_parity(rng):
    """projectPoints incl. the 5-coeff Brown-Conrady model
    (checkerboard_callibration.py coeffs usage :241-255)."""
    obj = rng.uniform(-0.1, 0.1, size=(24, 3))
    for _ in range(5):
        rvec, tvec = _pose(rng)
        want, _ = cv2.projectPoints(obj, rvec, tvec, K, DIST5)
        got = np.asarray(project_points(
            jnp.asarray(obj, jnp.float64), jnp.asarray(rvec),
            jnp.asarray(tvec), jnp.asarray(K),
            jnp.asarray(np.concatenate([DIST5, np.zeros(3)]))))
        # f32 pipeline at ~1000 px coordinate scale
        np.testing.assert_allclose(got, want.reshape(-1, 2), atol=2e-3)


def test_rodrigues_parity(rng):
    for _ in range(5):
        rvec, _ = _pose(rng)
        want, _ = cv2.Rodrigues(rvec)
        got = np.asarray(rodrigues(jnp.asarray(rvec)))
        np.testing.assert_allclose(got, want, atol=2e-6)  # f32 solver


def test_ippe_square_pose_parity(rng):
    """solve_pnp_ippe_square vs cv2 SOLVEPNP_IPPE_SQUARE on exact corners
    in the canonical order (final_view.py:206-209): <0.1 deg / <1 mm —
    the BASELINE north-star tolerance on clean geometry. (The 8-order
    search cannot be compared on exact data: a square's 90-degree
    symmetry makes all rotated orders exact ties at zero reprojection —
    in the pipeline the decode stage pins the order, detector.py:277.)"""
    from repas_tpu.pose.pnp import solve_pnp_ippe_square

    # cv2's IPPE_SQUARE requires ITS canonical object ordering
    # ((-h,+h),(h,+h),(h,-h),(-h,-h)); ours is TL=(-h,-h) y-down
    # (final_view_with_cad.py:191-194) — the same four points, reversed.
    h = TAG / 2.0
    obj_cv = np.array([[-h, h, 0], [h, h, 0], [h, -h, 0], [-h, -h, 0]])
    for _ in range(8):
        rvec, tvec = _pose(rng)
        img_cv, _ = cv2.projectPoints(obj_cv, rvec, tvec, K, np.zeros(5))
        img_cv = img_cv.reshape(-1, 2)
        okref, rv_ref, tv_ref = cv2.solvePnP(
            obj_cv, img_cv, K, np.zeros(5),
            flags=cv2.SOLVEPNP_IPPE_SQUARE)
        assert okref
        R_ref, _ = cv2.Rodrigues(rv_ref)
        R, t, err = solve_pnp_ippe_square(
            jnp.asarray(img_cv[::-1].copy(), jnp.float32),
            jnp.asarray(K, jnp.float32), jnp.zeros(8), TAG)
        ang = float(rotation_angle_deg(
            jnp.asarray(np.asarray(R), jnp.float32),
            jnp.asarray(R_ref, jnp.float32)))
        assert ang < 0.1, ang
        assert np.linalg.norm(np.asarray(t) - tv_ref.ravel()) < 1e-3
        assert float(err) < 0.05


def test_sqpnp_parity(rng):
    """General-PnP parity (mpe_final_view_tag_bundle_with_cad.py:278-284
    uses SOLVEPNP_SQPNP on stacked multi-tag points)."""
    obj = rng.uniform(-0.08, 0.08, size=(12, 3))
    obj[:, 2] *= 0.3
    for _ in range(5):
        rvec, tvec = _pose(rng)
        img, _ = cv2.projectPoints(obj, rvec, tvec, K, np.zeros(5))
        img = img.reshape(-1, 2)
        okref, rv_ref, tv_ref = cv2.solvePnP(
            obj, img, K, np.zeros(5), flags=cv2.SOLVEPNP_SQPNP)
        assert okref
        R_ref, _ = cv2.Rodrigues(rv_ref)
        R, t, err = solve_pnp_sqpnp(
            jnp.asarray(obj, jnp.float32), jnp.asarray(img, jnp.float32),
            jnp.asarray(K, jnp.float32))
        ang = float(rotation_angle_deg(
            jnp.asarray(np.asarray(R), jnp.float32),
            jnp.asarray(R_ref, jnp.float32)))
        assert ang < 0.1, ang
        assert np.linalg.norm(np.asarray(t) - tv_ref.ravel()) < 1e-3


def test_undistort_points_parity(rng):
    from repas_tpu.kernels.project import undistort_points

    uv = np.column_stack([rng.uniform(100, 1180, 30),
                          rng.uniform(60, 660, 30)])
    want = cv2.undistortPoints(
        uv.reshape(-1, 1, 2), K, DIST5).reshape(-1, 2)
    got = np.asarray(undistort_points(
        jnp.asarray(uv), jnp.asarray(K),
        jnp.asarray(np.concatenate([DIST5, np.zeros(3)])), iters=50))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_detector_corners_vs_aruco(rng):
    """Corner positions of our detector vs cv2's ArUco AprilTag detector
    on a clean synthetic render: same tag, same image, corner sets match
    within half a pixel (different subpixel refiners)."""
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect import detect_tags
    from repas_tpu.detect.render import render_tag

    img = render_tag(16, cell_px=16)
    det = detect_tags(jnp.asarray(img), DetectorConfig())
    assert bool(det.valid[0]) and int(det.ids[0]) == 16
    ours = np.asarray(det.corners[0])

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    ar = cv2.aruco.ArucoDetector(d, cv2.aruco.DetectorParameters())
    corners, ids, _ = ar.detectMarkers(
        np.clip(img, 0, 255).astype(np.uint8))
    assert ids is not None and 16 in ids.ravel()
    theirs = corners[list(ids.ravel()).index(16)][0]
    # order-independent comparison (corner origin conventions differ by
    # the stored rotation; match as sets)
    dmat = np.linalg.norm(ours[:, None, :] - theirs[None, :, :], axis=-1)
    # aruco places corners ~a half-pixel diagonal inward of the border
    # edge (pixel-center convention; measured uniform 0.88 px on a clean
    # render where our corners sit <0.1 px from geometric truth) — gate
    # at 1.3 px to catch real disagreement, not the convention offset
    assert dmat.min(axis=1).max() < 1.3, dmat.min(axis=1)


def test_calibrate_camera_parity(rng):
    """Zhang+LM calibrateCamera vs cv2.calibrateCamera on synthetic
    checkerboard views with known K and distortion
    (checkerboard_callibration.py:241-255 is the reference call)."""
    from repas_tpu.calib.checkerboard import calibrate_camera

    K_true = np.array([[880.0, 0, 630.0], [0, 875.0, 350.0], [0, 0, 1.0]])
    dist_true = np.array([0.08, -0.15, 0.001, -0.0015, 0.05])
    cols, rows, sq = 9, 6, 0.024
    obj = np.zeros((cols * rows, 3))
    obj[:, :2] = (np.mgrid[0:cols, 0:rows].T.reshape(-1, 2)) * sq

    objs, imgs = [], []
    for v in range(8):
        rvec = rng.uniform(-0.35, 0.35, 3)
        tvec = np.array([rng.uniform(-0.06, 0.06),
                         rng.uniform(-0.04, 0.04),
                         rng.uniform(0.35, 0.6)])
        tvec[:2] -= (obj[:, :2].mean(0) * 0.9)
        uv, _ = cv2.projectPoints(obj, rvec, tvec, K_true, dist_true)
        uv = uv.reshape(-1, 2) + rng.normal(scale=0.05, size=(len(obj), 2))
        if (uv < 0).any() or (uv[:, 0] > 1280).any() or (uv[:, 1] > 720).any():
            continue
        objs.append(obj)
        imgs.append(uv)
    assert len(objs) >= 5

    o = np.asarray(objs, np.float32)
    i = np.asarray(imgs, np.float32)
    K_ours, dist_ours, rms_ours, _, _ = calibrate_camera(o, i, (1280, 720))
    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        o, i.astype(np.float32)[:, :, None, :], (1280, 720), None, None)

    # both recover the true camera; compare against truth AND each other
    assert abs(K_ours[0, 0] - K_true[0, 0]) < 2.0
    assert abs(K_ours[1, 1] - K_true[1, 1]) < 2.0
    assert abs(K_ours[0, 2] - K_true[0, 2]) < 2.0
    assert abs(K_ours[1, 2] - K_true[1, 2]) < 2.0
    np.testing.assert_allclose(K_ours[:2], K_cv[:2], atol=3.0)
    np.testing.assert_allclose(dist_ours[:2], dist_cv.ravel()[:2], atol=0.02)
    assert rms_ours < 0.2 and rms_cv < 0.2


def test_canny_hough_bar_parity(rng):
    """Canny + dominant-horizontal-line extraction vs cv2.Canny +
    HoughLinesP on a synthetic rotated-bar scene (the canopy bar
    detector's job, canopy_return_upgraded.py Canny/Hough usage)."""
    from repas_tpu.canopy.bar import canny_edges, hough_horizontal_bar

    h, w = 360, 640
    img = np.full((h, w), 40.0, np.float32)
    img += rng.normal(scale=2.0, size=(h, w))
    # a bright bar ~5 px thick at 4 deg through the image center
    yy, xx = np.mgrid[0:h, 0:w]
    angle = np.radians(4.0)
    d = (yy - 180) * np.cos(angle) - (xx - 320) * np.sin(angle)
    img[np.abs(d) < 3] = 220.0
    u8 = np.clip(img, 0, 255).astype(np.uint8)

    ours = np.asarray(canny_edges(jnp.asarray(img), 50.0, 150.0))
    cv = cv2.Canny(u8, 50, 150)
    # edge maps agree on the bar boundary (different NMS tie-breaks ->
    # compare dilated overlap, not pixel identity)
    cv_d = cv2.dilate(cv, np.ones((3, 3), np.uint8)) > 0
    ours_on_cv = (ours > 0) & cv_d
    agree = ours_on_cv.sum() / max((ours > 0).sum(), 1)
    assert agree > 0.9, f"only {agree:.2%} of our edges near cv2's"

    line = hough_horizontal_bar(jnp.asarray(ours))
    segs = cv2.HoughLinesP(cv, 1, np.pi / 180, 50, minLineLength=64,
                           maxLineGap=8)
    assert segs is not None
    # cv2's longest qualifying near-horizontal segment
    best, blen = None, 0
    for seg in np.asarray(segs).reshape(-1, 4):
        x1, y1, x2, y2 = [float(v) for v in seg]
        a = np.degrees(np.arctan2(y2 - y1, x2 - x1))
        ln = np.hypot(x2 - x1, y2 - y1)
        if abs(a) < 20 and ln > blen:
            best, blen = (x1, y1, x2, y2), ln
    assert best is not None
    y_cv = (best[1] + best[3]) / 2
    assert bool(line.found)
    y_ours = float(line.p0[1] + line.p1[1]) / 2
    # the bar has TWO boundary edges ~6 px apart; either detector may
    # lock onto either edge — compare within the bar thickness
    assert abs(y_ours - y_cv) < 8.0, (y_ours, y_cv)
    assert abs(abs(float(line.angle_deg)) - 4.0) < 1.5


def test_detector_real_capture_vs_aruco():
    """Cross-check on a REAL capture (not synthetic): where cv2.aruco
    also finds tag 16, our corners agree within ~1.5 px (SURVEY §6
    tolerance-parity row, real-data version)."""
    import pathlib
    cap = pathlib.Path("/root/reference/realsense_d415i/testing_scripts/"
                       "aligned_outputs/pose 1")
    if not cap.exists():
        pytest.skip("reference captures not mounted")
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect.robust import detect_tags_robust
    from repas_tpu.io.image import read_image

    rgbs = sorted(cap.glob("rgb_*.png"))
    img = read_image(rgbs[0])
    gray8 = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    par = cv2.aruco.DetectorParameters()
    par.cornerRefinementMethod = cv2.aruco.CORNER_REFINE_SUBPIX
    corners_cv, ids_cv, _ = cv2.aruco.ArucoDetector(d, par).detectMarkers(gray8)
    if ids_cv is None or 16 not in ids_cv.ravel():
        pytest.skip("cv2.aruco did not find tag 16 on this capture")
    theirs = corners_cv[list(ids_cv.ravel()).index(16)][0]

    det = detect_tags_robust(jnp.asarray(img), DetectorConfig())
    v = np.asarray(det.valid)
    ids = np.asarray(det.ids)
    assert 16 in ids[v]
    ours = np.asarray(det.corners)[list(ids).index(16)]
    dmat = np.linalg.norm(ours[:, None, :] - theirs[None, :, :], axis=-1)
    assert dmat.min(axis=1).max() < 1.5, dmat.min(axis=1)
