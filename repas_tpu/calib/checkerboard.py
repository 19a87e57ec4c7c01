"""Checkerboard camera calibration (C18, checkerboard_callibration.py).

Replaces the OpenCV calibration path:
  * findChessboardCornersSB + cornerSubPix (lines 109-127) -> saddle-point
    response (Hessian determinant) + NMS + homography-guided grid ordering,
    then the classic gradient-orthogonality subpixel iteration
  * calibrateCamera (lines 229-254, criteria 100 iters / 1e-6) -> Zhang
    closed-form init (homography -> image-of-absolute-conic -> K) + batched
    Levenberg-Marquardt over intrinsics, distortion and all per-view
    extrinsics, residuals = all reprojection errors at once (one big
    device-side least squares, matching the BASELINE.json "batched JAX
    least-squares path").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from repas_tpu.core.transforms import rodrigues, rodrigues_inv
from repas_tpu.kernels.image import bilinear_sample, gaussian_blur, sobel
from repas_tpu.kernels.project import project_points


# ---------------------------------------------------------------------------
# corner detection
# ---------------------------------------------------------------------------

def _saddle_response(gray: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """Negative Hessian determinant: large where the image has a saddle
    (checkerboard X-corners)."""
    g = gaussian_blur(gray, sigma)
    gx, gy = sobel(g)
    gxx, gxy = sobel(gx)
    gyx, gyy = sobel(gy)
    return gxy * gyx - gxx * gyy      # -det(H) > 0 at saddles


def _nms_topk(resp: jnp.ndarray, k: int, radius: int = 4):
    """Non-max suppression + top-k peak extraction. Returns (k,2) uv, (k,)
    scores."""
    size = 2 * radius + 1
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                               (size, size), (1, 1), "SAME")
    peaks = jnp.where((resp >= mx) & (resp > 0), resp, 0.0)
    h, w = resp.shape
    flat = peaks.reshape(-1)
    scores, idx = jax.lax.top_k(flat, k)
    uv = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], axis=1)
    return uv, scores


def detect_checkerboard_corners(gray: jnp.ndarray, cols: int, rows: int,
                                sigma: float = 1.5):
    """Detect and grid-order the inner corners of a checkerboard.

    Returns (corners (rows*cols, 2) float32 in row-major board order,
    ok bool). Ordering: the 4 extremal detections seed a homography from
    board grid coords; each grid node snaps to its nearest detection; a
    second homography fit refines the assignment.
    """
    n = rows * cols
    resp = _saddle_response(gray, sigma)
    # X-corner quadrant test: at a true checkerboard corner the two
    # diagonals disagree in intensity with the SAME signed difference
    # (q1-q3 and q2-q4 both = A-B); at board-boundary L-corners one of the
    # two differences vanishes. Gates out the outer-edge saddles that
    # would corrupt the extremal grid seeding.
    g = gaussian_blur(gray, 1.0)
    r = 3
    p = jnp.pad(g, r, mode="edge")
    h, w = gray.shape
    q1 = p[0:h, 0:w]                  # (-r,-r)
    q2 = p[2 * r:, 2 * r:][:h, :w]    # (+r,+r)
    q3 = p[2 * r:, 0:w][:h, :]        # (+r,-r) -> (x-r, y+r)
    q4 = p[0:h, 2 * r:][:, :w]        # (-r,+r)
    d13 = q1 - q3
    d24 = q2 - q4
    xcorner = jnp.minimum(jnp.abs(d13), jnp.abs(d24)) * (
        jnp.sign(d13) == jnp.sign(d24))
    resp = jnp.where(xcorner > 10.0, resp, 0.0)
    uv, scores = _nms_topk(resp, n + n // 2)      # some headroom
    valid = scores > 0.05 * scores[0]
    uv = jnp.where(valid[:, None], uv, jnp.nan)

    # extremal seeds (TL, TR, BR, BL in board orientation)
    s = uv[:, 0] + uv[:, 1]
    d = uv[:, 0] - uv[:, 1]
    tl = uv[jnp.nanargmin(s)]
    br = uv[jnp.nanargmax(s)]
    tr = uv[jnp.nanargmax(d)]
    bl = uv[jnp.nanargmin(d)]
    quad = jnp.stack([tl, tr, br, bl])

    # homography: board grid (x=col in [0,cols-1], y=row) -> image
    src = jnp.array([[0.0, 0.0], [cols - 1.0, 0.0],
                     [cols - 1.0, rows - 1.0], [0.0, rows - 1.0]])

    def fit_h(src_pts, dst_pts, w=None):
        m = src_pts.shape[0]
        ww = jnp.ones(m) if w is None else w
        x, y = src_pts[:, 0], src_pts[:, 1]
        u, v = dst_pts[:, 0], dst_pts[:, 1]
        zero = jnp.zeros_like(x)
        one = jnp.ones_like(x)
        ru = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], 1)
        rv = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], 1)
        A = jnp.concatenate([ru * ww[:, None], rv * ww[:, None]], 0)
        b = jnp.concatenate([u * ww, v * ww], 0)
        sol, *_ = jnp.linalg.lstsq(A, b)
        return jnp.concatenate([sol, jnp.ones(1)]).reshape(3, 3)

    H = fit_h(src, quad)

    gx, gy = jnp.meshgrid(jnp.arange(cols, dtype=jnp.float32),
                          jnp.arange(rows, dtype=jnp.float32), indexing="xy")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], 1)   # (n,2) row-major

    def snap(H):
        p = jnp.concatenate([grid, jnp.ones((n, 1))], 1) @ H.T
        pred = p[:, :2] / p[:, 2:3]
        d2 = jnp.sum((pred[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
        j = jnp.argmin(d2, axis=1)
        return uv[j], jnp.take_along_axis(d2, j[:, None], 1)[:, 0], pred

    snapped, d2, pred = snap(H)
    # refit with all snapped points, snap again
    H2 = fit_h(grid, snapped)
    snapped, d2, pred = snap(H2)

    # sanity: every node found a nearby unique corner
    med = jnp.median(jnp.sqrt(d2))
    ok = jnp.all(jnp.sqrt(d2) < jnp.maximum(4.0 * med, 3.0))
    return snapped, ok


@functools.partial(jax.jit, static_argnames=("win", "iters"))
def refine_corners_subpix(gray: jnp.ndarray, corners: jnp.ndarray,
                          win: int = 5, iters: int = 20):
    """cornerSubPix equivalent (checkerboard_callibration.py:120-127).

    Iterates q <- solve(sum w g g^T, sum w g g^T p) over a (2win+1)^2
    window with gradient outer-products g g^T — the classic orthogonality
    condition. Criteria default mirrors the reference (50 iters, 1e-4 —
    we run a fixed count; convergence is quadratic).
    """
    gx, gy = sobel(gray)
    r = win
    offs = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                                  jnp.arange(-r, r + 1, dtype=jnp.float32),
                                  indexing="xy"), -1).reshape(-1, 2)
    # Gaussian-ish window weights
    wgt = jnp.exp(-0.5 * jnp.sum((offs / (r * 0.6)) ** 2, axis=1))

    def refine_one(q0):
        def body(_, q):
            p = q[None, :] + offs                       # (M,2)
            Ix = bilinear_sample(gx, p)
            Iy = bilinear_sample(gy, p)
            a = jnp.sum(wgt * Ix * Ix)
            b = jnp.sum(wgt * Ix * Iy)
            c = jnp.sum(wgt * Iy * Iy)
            bx = jnp.sum(wgt * (Ix * Ix * p[:, 0] + Ix * Iy * p[:, 1]))
            by = jnp.sum(wgt * (Ix * Iy * p[:, 0] + Iy * Iy * p[:, 1]))
            det = a * c - b * b
            qx = (c * bx - b * by) / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
            qy = (a * by - b * bx) / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
            q_new = jnp.stack([qx, qy])
            # clamp runaway steps
            step = q_new - q
            lim = 2.0
            step = jnp.clip(step, -lim, lim)
            return q + step

        return jax.lax.fori_loop(0, iters, body, q0)

    return jax.vmap(refine_one)(corners)


# ---------------------------------------------------------------------------
# Zhang init + batched LM
# ---------------------------------------------------------------------------

def _homography_dlt(obj_xy: np.ndarray, img_xy: np.ndarray) -> np.ndarray:
    """Normalized DLT homography (host-side, per view, float64)."""
    def norm_T(p):
        c = p.mean(axis=0)
        s = np.sqrt(2) / np.mean(np.linalg.norm(p - c, axis=1))
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])
        return T

    To = norm_T(obj_xy)
    Ti = norm_T(img_xy)
    o = (np.column_stack([obj_xy, np.ones(len(obj_xy))]) @ To.T)[:, :2]
    i = (np.column_stack([img_xy, np.ones(len(img_xy))]) @ Ti.T)[:, :2]
    A = []
    for (x, y), (u, v) in zip(o, i):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    return np.linalg.inv(Ti) @ H @ To


def _zhang_init(Hs: list[np.ndarray]) -> np.ndarray:
    """Closed-form K from >=3 homographies (Zhang 2000)."""
    def v(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j]])

    V = []
    for H in Hs:
        V.append(v(H, 0, 1))
        V.append(v(H, 0, 0) - v(H, 1, 1))
    _, _, Vt = np.linalg.svd(np.asarray(V))
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])


def calibrate_camera(obj_pts: np.ndarray, img_pts: np.ndarray,
                     image_size: tuple[int, int], iters: int = 100,
                     n_dist: int = 5):
    """Batched-LM calibrateCamera.

    obj_pts (V,N,3) board points (z=0), img_pts (V,N,2) detected corners.
    Returns (K (3,3), dist (8,), rms, rvecs (V,3), tvecs (V,3)).
    """
    V, N = img_pts.shape[:2]
    Hs = [_homography_dlt(obj_pts[i, :, :2], img_pts[i]) for i in range(V)]
    K0 = _zhang_init(Hs)

    rvecs, tvecs = [], []
    Kinv = np.linalg.inv(K0)
    for H in Hs:
        h1, h2, h3 = (Kinv @ H).T
        lam = 1.0 / np.linalg.norm(h1)
        if (lam * h3)[2] < 0:       # board must be in front of the camera
            lam = -lam
        r1 = lam * h1
        r2 = lam * h2
        r3 = np.cross(r1, r2)
        Rm = np.column_stack([r1, r2, r3])
        U, _, Vt = np.linalg.svd(Rm)
        Rm = U @ np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))]) @ Vt
        rvecs.append(np.asarray(rodrigues_inv(jnp.asarray(Rm, jnp.float32))))
        tvecs.append(lam * h3)
    rvecs = np.asarray(rvecs, dtype=np.float32)
    tvecs = np.asarray(tvecs, dtype=np.float32)

    # pack params: [fx,fy,cx,cy, dist(n_dist), rvecs(V*3), tvecs(V*3)]
    p0 = jnp.concatenate([
        jnp.asarray([K0[0, 0], K0[1, 1], K0[0, 2], K0[1, 2]], jnp.float32),
        jnp.zeros(n_dist, jnp.float32),
        jnp.asarray(rvecs).reshape(-1),
        jnp.asarray(tvecs).reshape(-1)])

    obj = jnp.asarray(obj_pts, jnp.float32)
    img = jnp.asarray(img_pts, jnp.float32)

    def unpack(p):
        K = jnp.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
        dist = jnp.concatenate([p[4:4 + n_dist],
                                jnp.zeros(8 - n_dist)])
        rv = p[4 + n_dist:4 + n_dist + 3 * V].reshape(V, 3)
        tv = p[4 + n_dist + 3 * V:].reshape(V, 3)
        return K, dist, rv, tv

    def residuals(p):
        K, dist, rv, tv = unpack(p)
        proj = jax.vmap(lambda o, r, t: project_points(o, r, t, K, dist)
                        )(obj, rv, tv)
        return (proj - img).reshape(-1)

    jac = jax.jacfwd(residuals)

    @jax.jit
    def lm(p0):
        def body(carry, _):
            p, lam = carry
            r = residuals(p)
            J = jac(p)
            JTJ = J.T @ J
            g = J.T @ r
            # Jacobi column scaling: parameters span 4 orders of magnitude
            # (fx ~ 1e3 vs k3 ~ 1e-2), fatal for an f32 normal-equation
            # solve without preconditioning
            d = jnp.sqrt(jnp.clip(jnp.diag(JTJ), 1e-12, None))
            Dinv = 1.0 / d
            A = JTJ * Dinv[:, None] * Dinv[None, :]
            b = g * Dinv
            y = jnp.linalg.solve(
                A + lam * jnp.eye(A.shape[0], dtype=A.dtype), b)
            step = y * Dinv
            p_new = p - step
            better = jnp.sum(residuals(p_new) ** 2) < jnp.sum(r ** 2)
            lam_new = jnp.where(better, jnp.maximum(lam * 0.3, 1e-10),
                                jnp.minimum(lam * 5.0, 1e3))
            p = jnp.where(better, p_new, p)
            return (p, lam_new), None

        (p, _), _ = jax.lax.scan(body, (p0, jnp.float32(1e-3)), None,
                                 length=iters)
        return p

    p = lm(p0)
    K, dist, rv, tv = unpack(p)
    r = residuals(p)
    rms = float(jnp.sqrt(jnp.mean(r ** 2)))
    return (np.asarray(K, dtype=np.float64), np.asarray(dist),
            rms, np.asarray(rv), np.asarray(tv))
