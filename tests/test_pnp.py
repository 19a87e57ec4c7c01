import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.core.transforms import rodrigues, rotation_angle_deg
from repas_tpu.kernels.project import project_points
from repas_tpu.pose import (refine_pnp_gn, solve_pnp_best_order,
                            solve_pnp_ippe_square, solve_pnp_sqpnp,
                            solve_tag_bundle, square_object_points)
from repas_tpu.pose.pnp import SQUARE_ORDERS

K = np.array([[748.9, 0, 639.87], [0, 748.35, 361.95], [0, 0, 1.0]],
             dtype=np.float32)
DIST0 = np.zeros(8, dtype=np.float32)
TAG = 0.0303


def synth_pose(rng, max_angle=0.6):
    rvec = rng.normal(size=3)
    rvec = rvec / np.linalg.norm(rvec) * rng.uniform(0.05, max_angle)
    t = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.15, 0.15),
                  rng.uniform(0.4, 1.5)])
    return rvec.astype(np.float32), t.astype(np.float32)


def project_corners(rvec, t, dist=DIST0, tag=TAG):
    obj = square_object_points(tag)
    return project_points(obj, jnp.asarray(rvec), jnp.asarray(t), K, dist)


def test_ippe_square_exact(rng):
    """Noise-free synthetic corners must recover pose to sub-mm/sub-0.01deg."""
    for i in range(10):
        rvec, t = synth_pose(rng)
        img = project_corners(rvec, t)
        R, t_hat, err = solve_pnp_ippe_square(img, K, DIST0, TAG)
        R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
        assert float(err) < 0.05, f"case {i}: reproj {err}"
        assert np.linalg.norm(np.asarray(t_hat) - t) < 1e-3, f"case {i}"
        ang = float(rotation_angle_deg(jnp.asarray(R_true), R))
        assert ang < 0.1, f"case {i}: rotation off by {ang} deg"


def test_ippe_square_with_distortion(rng):
    dist = np.array([0.092, -0.115, 0.0014, 0.002, 0.046, 0, 0, 0],
                    dtype=np.float32)
    for i in range(5):
        rvec, t = synth_pose(rng)
        img = project_corners(rvec, t, dist=dist)
        R, t_hat, err = solve_pnp_ippe_square(img, K, dist, TAG)
        assert float(err) < 0.05
        assert np.linalg.norm(np.asarray(t_hat) - t) < 2e-3


def test_ippe_square_noisy(rng):
    """0.2px corner noise -> pose within a few mm / a degree."""
    errs_t, errs_r = [], []
    for i in range(10):
        rvec, t = synth_pose(rng)
        img = project_corners(rvec, t) + rng.normal(scale=0.2, size=(4, 2)).astype(np.float32)
        R, t_hat, err = solve_pnp_ippe_square(img, K, DIST0, TAG)
        errs_t.append(np.linalg.norm(np.asarray(t_hat) - t))
        R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
        errs_r.append(float(rotation_angle_deg(jnp.asarray(R_true), R)))
    # 0.2 px noise on a 30 mm tag at up to 1.5 m propagates to ~2 cm depth
    # uncertainty (z^2 / (f * s) * sigma) and several degrees of planar
    # ambiguity wobble; median over poses stays within those bounds
    assert np.median(errs_t) < 2.5e-2
    assert np.median(errs_r) < 6.0


def test_best_order_recovers_permutation(rng):
    """Feed corners in a rotated order; the 8-order search must still find
    a consistent, low-error pose (C3 semantics)."""
    rvec, t = synth_pose(rng)
    img = np.asarray(project_corners(rvec, t))
    for k, order in enumerate(np.asarray(SQUARE_ORDERS)):
        permuted = jnp.asarray(img[order])
        R, t_hat, err, best = solve_pnp_best_order(permuted, K, DIST0, TAG)
        assert float(err) < 0.05, f"order {k}: err {err}"
        assert float(t_hat[2]) > 0
        np.testing.assert_allclose(np.asarray(t_hat), t, atol=2e-3)


def test_best_order_z_penalty(rng):
    rvec, t = synth_pose(rng)
    img = project_corners(rvec, t)
    R, t_hat, err, best = solve_pnp_best_order(img, K, DIST0, TAG)
    assert float(t_hat[2]) > 0


def test_gn_refine_converges(rng):
    rvec, t = synth_pose(rng)
    img = project_corners(rvec, t)
    obj = square_object_points(TAG)
    rv0 = rvec + rng.normal(scale=0.05, size=3).astype(np.float32)
    t0 = t + rng.normal(scale=0.02, size=3).astype(np.float32)
    rv, t_hat, err = refine_pnp_gn(obj, img, jnp.asarray(rv0),
                                   jnp.asarray(t0), K, iters=25)
    assert float(err) < 1e-2
    np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-3)


def test_sqpnp_general_points(rng):
    """Non-planar point set: SQPnP-style solver recovers the pose."""
    rvec, t = synth_pose(rng)
    obj = rng.uniform(-0.1, 0.1, size=(10, 3)).astype(np.float32)
    img = project_points(jnp.asarray(obj), jnp.asarray(rvec),
                         jnp.asarray(t), K, DIST0)
    R, t_hat, err = solve_pnp_sqpnp(jnp.asarray(obj), img, K, DIST0)
    assert float(err) < 0.05
    np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-3)
    R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
    assert float(rotation_angle_deg(jnp.asarray(R_true), R)) < 0.1


def test_sqpnp_weights_mask_outliers(rng):
    rvec, t = synth_pose(rng)
    obj = rng.uniform(-0.1, 0.1, size=(12, 3)).astype(np.float32)
    img = np.array(project_points(jnp.asarray(obj), jnp.asarray(rvec),
                                  jnp.asarray(t), K, DIST0))
    img[10] += 300.0  # gross outliers
    img[11] -= 250.0
    w = np.ones(12, np.float32)
    w[10:] = 0.0
    R, t_hat, err = solve_pnp_sqpnp(jnp.asarray(obj), jnp.asarray(img), K,
                                    DIST0, weights=jnp.asarray(w))
    assert float(err) < 0.05
    np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-3)


def test_tag_bundle(rng):
    """3-tag planar layout, one camera pose; masked slot ignored."""
    rvec, t = synth_pose(rng, max_angle=0.4)
    centers = np.array([[0.0, 0.0, 0.0], [0.12, 0.0, 0.0],
                        [0.0, 0.10, 0.0], [9.9, 9.9, 0.0]], dtype=np.float32)
    h = TAG / 2
    offs = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]],
                    dtype=np.float32)
    corners, centers_px = [], []
    for c in centers:
        obj = c[None] + offs
        corners.append(np.asarray(project_points(
            jnp.asarray(obj), jnp.asarray(rvec), jnp.asarray(t), K, DIST0)))
        centers_px.append(np.asarray(project_points(
            jnp.asarray(c[None]), jnp.asarray(rvec), jnp.asarray(t), K,
            DIST0))[0])
    corners = np.stack(corners)
    centers_px = np.stack(centers_px)
    corners[3] = 0.0  # masked slot holds garbage
    centers_px[3] = 0.0
    valid = np.array([True, True, True, False])
    R, t_hat, err = solve_tag_bundle(jnp.asarray(corners),
                                     jnp.asarray(centers_px),
                                     jnp.asarray(valid),
                                     jnp.asarray(centers), TAG, K)
    assert float(err) < 0.05
    np.testing.assert_allclose(np.asarray(t_hat), t, atol=1e-3)
    R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
    assert float(rotation_angle_deg(jnp.asarray(R_true), R)) < 0.1


def test_fusion_finite_with_empty_slots(rng):
    """Regression (ADVICE r1, high): invalid detection slots carry degenerate
    corners; the singular IPPE solve yields NaN which must not leak into
    R_avg / weights / anchors when fewer tags than max_detections are found."""
    from repas_tpu.pose.fusion import fuse_tag_poses

    rvec, t = synth_pose(rng)
    img = np.asarray(project_corners(rvec, t))
    n = 4  # capacity 4, only 1 valid
    corners = np.zeros((n, 4, 2), np.float32)
    corners[0] = img
    ids = np.array([16, -1, -1, -1], np.int32)
    areas = np.array([900.0, 0, 0, 0], np.float32)
    valid = np.array([True, False, False, False])
    depth_m = np.full((120, 160), float(t[2]), np.float32)
    Ks = np.array([[96.0, 0, 80], [0, 96.0, 60], [0, 0, 1]], np.float32)
    # reproject with the small-K camera so corners land inside depth_m
    obj = square_object_points(TAG)
    corners[0] = np.asarray(project_points(
        obj, jnp.asarray(rvec), jnp.asarray(t), Ks, DIST0))
    pose = fuse_tag_poses(jnp.asarray(corners), jnp.asarray(ids),
                          jnp.asarray(areas), jnp.asarray(valid),
                          jnp.asarray(depth_m), Ks, DIST0, TAG)
    for name in ("R_avg", "anchor_t", "anchor_P_depth", "R", "t",
                 "P_depth", "weights", "err_px"):
        arr = np.asarray(getattr(pose, name))
        assert np.isfinite(arr).all(), f"{name} has non-finite values: {arr}"
    # the single valid tag defines the average exactly
    R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
    assert float(rotation_angle_deg(jnp.asarray(R_true), pose.R_avg)) < 0.2
    assert int(pose.anchor_idx) == 0
    # masked slots carry zero weight
    assert np.asarray(pose.weights)[1:].max() == 0.0


def test_detector_pose_matches_pnp(rng):
    """The homography detector pose (estimate_tag_pose equivalent) agrees
    with the refined IPPE solve on clean corners; 3-way compared in
    apps/validate_pose threeway (final_view.py:305-365)."""
    from repas_tpu.pose.pnp import detector_pose

    for _ in range(5):
        rvec, t = synth_pose(rng, max_angle=0.5)
        img = project_corners(rvec, t)
        R, t_hat, err = detector_pose(img, K, TAG)
        assert float(err) < 0.2          # closed-form, no polish
        np.testing.assert_allclose(np.asarray(t_hat), t, atol=2e-3)
        R_true = np.asarray(rodrigues(jnp.asarray(rvec)))
        assert float(rotation_angle_deg(jnp.asarray(R_true),
                                        jnp.asarray(np.asarray(R)))) < 1.0


def test_homography_seed_sign_invariance(rng):
    """The SQPnP planar homography seed must recover R for BOTH SVD signs
    of H (the sign is arbitrary; ADVICE r2: flipping the whole stacked
    matrix made it improper and ~180 deg off for negated H)."""
    from repas_tpu.pose.pnp import _rotation_from_homography

    for i in range(10):
        rvec, t = synth_pose(rng)
        R = np.asarray(rodrigues(jnp.asarray(rvec)))
        H = np.stack([R[:, 0], R[:, 1], t], axis=1)
        for sgn in (1.0, -1.0):
            R_h = np.asarray(_rotation_from_homography(
                jnp.asarray(sgn * H, jnp.float32)))
            assert np.linalg.det(R_h) > 0.5, f"case {i} sgn {sgn}: improper"
            ang = float(rotation_angle_deg(jnp.asarray(R),
                                           jnp.asarray(R_h)))
            assert ang < 0.1, f"case {i} sgn {sgn}: {ang} deg off"
