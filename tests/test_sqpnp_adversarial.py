"""Adversarial SQPnP sweep vs cv2.SOLVEPNP_SQPNP (VERDICT r3 next #7).

The reference's bundle solve delegates to OpenCV's SQPnP
(mpe_final_view_tag_bundle_with_cad.py:278-284). The repo's solver
(pose/pnp.py solve_pnp_sqpnp) is an eigenvector-seed + GN formulation,
not the SQP manifold walk, so parity is established empirically: 1000
random configurations across the four regimes the C++ solver is known
to be stressed by — planar layouts, near-planar layouts, wide-FOV
cameras, and high pixel noise.

Acceptance per case: pose agreement within 1 mm / 0.1 deg, OR the repo
solution reprojects the observations at least as well as cv2's (under
noise the cost surface has near-ties; matching or beating the oracle's
objective value is the honest contract, same escape the reference's own
best-order search uses — it scores by reprojection error, not by pose).
"""
from __future__ import annotations

import zlib

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.pose.pnp import solve_pnp_sqpnp

W_IMG, H_IMG = 640, 480
N_PTS = 8
N_PER_FAMILY = 250


def _random_pose(rng):
    v = rng.normal(size=3)
    ang = rng.uniform(0.05, 1.2)
    rvec = v / np.linalg.norm(v) * ang
    R, _ = cv2.Rodrigues(rvec)
    t = np.array([rng.uniform(-0.08, 0.08), rng.uniform(-0.08, 0.08),
                  rng.uniform(0.35, 1.6)])
    return R, t


def _make_case(rng, family):
    if family == "wide_fov":
        fx = fy = rng.uniform(260.0, 340.0)       # ~90-100 deg HFOV
    else:
        fx = rng.uniform(560.0, 660.0)
        fy = fx * rng.uniform(0.995, 1.005)
    K = np.array([[fx, 0, W_IMG / 2], [0, fy, H_IMG / 2], [0, 0, 1.0]])

    spread = 0.12
    obj = rng.uniform(-spread, spread, (N_PTS, 3))
    if family == "planar":
        obj[:, 2] = 0.0
    elif family == "near_planar":
        obj[:, 2] = rng.normal(scale=0.002, size=N_PTS)
    else:
        obj[:, 2] *= 0.5

    for _ in range(64):
        R, t = _random_pose(rng)
        cam = obj @ R.T + t
        if np.any(cam[:, 2] < 0.05):
            continue
        uv = cam[:, :2] / cam[:, 2:3]
        uv = uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        if uv.min() < 8 or uv[:, 0].max() > W_IMG - 8 \
                or uv[:, 1].max() > H_IMG - 8:
            continue
        # reject degenerate projected spreads (both solvers are unstable
        # there and the comparison measures noise, not parity)
        if np.ptp(uv[:, 0]) < 40 or np.ptp(uv[:, 1]) < 40:
            continue
        break
    else:
        return None

    noise = {"planar": 0.1, "near_planar": 0.1,
             "wide_fov": 0.3, "high_noise": 2.0}[family]
    uv_n = uv + rng.normal(scale=noise, size=uv.shape)
    return K, obj, uv_n, R, t


def _reproj_err(obj, uv, K, rvec, tvec):
    """RMS reprojection error — the least-squares objective both solvers
    optimize (ours explicitly via LM; SQPnP's object-space QP is its
    first-order proxy). Mean-of-norms is NOT the optimized quantity and
    ranks near-tie optima arbitrarily: measured on these sweeps the repo
    solver beats cv2's RMS in 60/60 sampled cases per family while
    'losing' mean-norm on ~25% of them by <0.03 px."""
    proj, _ = cv2.projectPoints(obj.astype(np.float64), rvec, tvec,
                                K.astype(np.float64), None)
    d = np.linalg.norm(proj[:, 0] - uv, axis=1)
    return float(np.sqrt(np.mean(d ** 2)))


@pytest.mark.parametrize("family",
                         ["planar", "near_planar", "wide_fov", "high_noise"])
def test_sqpnp_adversarial_vs_cv2(family):
    # crc32, not hash(): Python string hashing is salted per process, so
    # hash(family) drew a different 1000-case sweep every run and failures
    # were unreproducible (ADVICE r4)
    rng = np.random.default_rng(zlib.crc32(family.encode()))
    cases = []
    for _ in range(20 * N_PER_FAMILY):
        if len(cases) >= N_PER_FAMILY:
            break
        c = _make_case(rng, family)
        if c is not None:
            cases.append(c)
    assert len(cases) == N_PER_FAMILY, \
        f"case generation exhausted at {len(cases)}/{N_PER_FAMILY}"

    Ks = np.stack([c[0] for c in cases]).astype(np.float32)
    objs = np.stack([c[1] for c in cases]).astype(np.float32)
    uvs = np.stack([c[2] for c in cases]).astype(np.float32)

    # 60 LM iterations: at 2 px noise the curvature near the optimum is
    # shallow and 20 iters leaves ~0.1 px of RMS on the table (case 98 of
    # the crc32 high_noise sweep converges 3.047 -> 2.924 between 20 and
    # 60 iters, crossing below cv2's 2.932) — the contract is "at least
    # as good as cv2's objective", so run the refiner to convergence
    solve = jax.jit(jax.vmap(
        lambda o, u, K: solve_pnp_sqpnp(o, u, K, refine_iters=60)))
    R_j, t_j, err_j = map(np.asarray, solve(objs, uvs, Ks))

    n_pose_match = 0
    n_obj_match = 0
    failures = []
    for i, (K, obj, uv, R_true, t_true) in enumerate(cases):
        ok_cv, rvec_cv, tvec_cv = cv2.solvePnP(
            obj.astype(np.float64), uv.astype(np.float64),
            K.astype(np.float64), None, flags=cv2.SOLVEPNP_SQPNP)
        assert ok_cv
        R_cv, _ = cv2.Rodrigues(rvec_cv)

        dt_mm = np.linalg.norm(t_j[i] - tvec_cv[:, 0]) * 1e3
        cosang = (np.trace(R_cv.T @ R_j[i]) - 1) / 2
        dr_deg = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
        pose_match = dt_mm < 1.0 and dr_deg < 0.1
        if pose_match:
            n_pose_match += 1
            continue

        rvec_j, _ = cv2.Rodrigues(R_j[i].astype(np.float64))
        e_j = _reproj_err(obj, uv, K, rvec_j, t_j[i].astype(np.float64))
        e_cv = _reproj_err(obj, uv, K, rvec_cv, tvec_cv)
        if e_j <= e_cv + 1e-3:
            n_obj_match += 1
        else:
            failures.append((i, dt_mm, dr_deg, e_j, e_cv))

    assert not failures, (
        f"{family}: {len(failures)}/{N_PER_FAMILY} cases where the repo "
        f"solution neither matches cv2's pose (<1mm/0.1deg) nor its "
        f"reprojection objective; first: {failures[:3]} "
        f"(pose-matched {n_pose_match}, objective-matched {n_obj_match})")
    # the disjunction must not be carried by the escape clause alone:
    # in the clean regimes the poses themselves must agree
    if family in ("planar", "near_planar"):
        assert n_pose_match >= 0.9 * N_PER_FAMILY, (n_pose_match,
                                                    N_PER_FAMILY)
