"""Point-to-plane ICP + transform provenance (C14, mpa_icp_export.py).

Open3D's registration_icp(point-to-plane) call (mpa_icp_export.py:187-197)
becomes a `lax.while_loop` whose body does:
  1. grid-hash 1-NN correspondence search on device          (cloud.knn)
  2. distance gating at max_corr_dist
  3. linearized point-to-plane solve: minimize
     sum ((R p + t - q) . n)^2 with R ~ I + [w]x -> one 6x6 solve
  4. SE(3) update composition
with fitness / inlier RMSE tracked exactly like Open3D reports them.

The ICP config defaults mirror the reference (max dist 0.05 m, 100 iters,
relative tolerance 1e-6, 50k CAD samples, 5 mm scene voxel;
mpa_icp_export.py:38-44).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from repas_tpu.cloud.knn import grid2_build, grid2_query
from repas_tpu.core.transforms import make_T, rodrigues


class ICPResult(NamedTuple):
    T: jnp.ndarray            # (4,4) source -> target refinement
    fitness: jnp.ndarray      # matched fraction of source points
    inlier_rmse: jnp.ndarray  # RMSE over matched pairs
    iterations: jnp.ndarray   # iterations actually run


@functools.partial(jax.jit,
                   static_argnames=("max_iters", "dims", "slots"))
def icp_point_to_plane(src: jnp.ndarray, src_mask: jnp.ndarray,
                       tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                       tgt_normals: jnp.ndarray,
                       max_corr_dist: float = 0.05,
                       max_iters: int = 100,
                       rel_tol: float = 1e-6,
                       T_init=None,
                       dims: tuple = (64, 64, 64),
                       slots: int = 4) -> ICPResult:
    """src (S,3)+mask, tgt (T,3)+mask+normals. Returns ICPResult."""
    f32 = jnp.float32
    src = src.astype(f32)
    tgt = tgt.astype(f32)
    T0 = jnp.eye(4, dtype=f32) if T_init is None else jnp.asarray(T_init, f32)

    # Two-level grid: coarse cell = max_corr_dist guarantees radius
    # coverage; fine cell = max_corr_dist/4 keeps NN unbiased when the
    # target is much denser than the radius (5 mm voxel vs 5 cm radius).
    gh = grid2_build(tgt, tgt_mask, max_corr_dist, coarse_dims=dims,
                     coarse_slots=4 * slots, fine_slots=2 * slots)

    def correspondences(T):
        p = src @ T[:3, :3].T + T[:3, 3]
        nn, dist = grid2_query(gh, tgt, p, src_mask, coarse_dims=dims)
        ok = src_mask & (nn >= 0) & (dist <= max_corr_dist)
        q = tgt[jnp.maximum(nn, 0)]
        n = tgt_normals[jnp.maximum(nn, 0)]
        return p, q, n, ok, dist

    def step(carry):
        T, prev_rmse, prev_fit, it, done = carry
        p, q, n, ok, dist = correspondences(T)
        w = ok.astype(f32)
        r = jnp.sum((p - q) * n, axis=1)                     # (S,)
        cxn = jnp.cross(p, n)                                # (S,3)
        J = jnp.concatenate([cxn, n], axis=1)                # (S,6)
        Jw = J * w[:, None]
        A = J.T @ Jw + 1e-9 * jnp.eye(6, dtype=f32)
        b = Jw.T @ r
        x = jnp.linalg.solve(A, b)
        dT = make_T(rodrigues(-x[:3]), -x[3:])
        T_new = dT @ T

        m = jnp.maximum(jnp.sum(w), 1.0)
        rmse = jnp.sqrt(jnp.sum(w * dist * dist) / m)
        fit = jnp.sum(w) / jnp.maximum(jnp.sum(src_mask), 1)
        converged = (jnp.abs(prev_rmse - rmse) < rel_tol * jnp.maximum(prev_rmse, 1e-12)) & \
                    (jnp.abs(prev_fit - fit) < rel_tol)
        return (T_new, rmse, fit, it + 1, done | converged)

    def cond(carry):
        _, _, _, it, done = carry
        return (it < max_iters) & (~done)

    init = (T0, jnp.asarray(jnp.inf, f32), jnp.asarray(0.0, f32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    T, rmse, fit, it, _ = jax.lax.while_loop(cond, step, init)

    # final metrics at the converged transform (Open3D evaluates once more)
    p, q, n, ok, dist = correspondences(T)
    w = ok.astype(f32)
    m = jnp.maximum(jnp.sum(w), 1.0)
    rmse = jnp.sqrt(jnp.sum(w * dist * dist) / m)
    fit = jnp.sum(w) / jnp.maximum(jnp.sum(src_mask), 1)
    return ICPResult(T=T, fitness=fit, inlier_rmse=rmse, iterations=it)


def evaluate_registration(src, src_mask, tgt, tgt_mask, T,
                          max_corr_dist: float = 0.05,
                          dims: tuple = (64, 64, 64)):
    """Open3D evaluate_registration equivalent: fitness + inlier RMSE of a
    given transform."""
    f32 = jnp.float32
    gh = grid2_build(tgt.astype(f32), tgt_mask, max_corr_dist,
                     coarse_dims=dims)
    p = src.astype(f32) @ jnp.asarray(T, f32)[:3, :3].T + jnp.asarray(T, f32)[:3, 3]
    nn, dist = grid2_query(gh, tgt.astype(f32), p, src_mask,
                           coarse_dims=dims)
    ok = src_mask & (nn >= 0) & (dist <= max_corr_dist)
    w = ok.astype(f32)
    m = jnp.maximum(jnp.sum(w), 1.0)
    return (jnp.sum(w) / jnp.maximum(jnp.sum(src_mask), 1),
            jnp.sqrt(jnp.sum(w * dist * dist) / m))


def _aabb_diag(src, src_mask, tgt, tgt_mask):
    """Diagonal of the combined AABB (auto_voxel_from_meshes,
    icp_cad_model.py:53-62) — one 6-scalar host pull."""
    big = jnp.concatenate([jnp.where(src_mask[:, None], src, jnp.inf),
                           jnp.where(tgt_mask[:, None], tgt, jnp.inf)])
    small = jnp.concatenate([jnp.where(src_mask[:, None], src, -jnp.inf),
                             jnp.where(tgt_mask[:, None], tgt, -jnp.inf)])
    lo = jnp.min(big, axis=0)
    hi = jnp.max(small, axis=0)
    return float(jnp.linalg.norm(hi - lo))


def global_register_fpfh(src, src_mask, tgt, tgt_mask, voxel: float,
                         capacity: int = 8192, n_hypotheses: int = 8192,
                         edge_check: float = 0.9, seed: int = 0):
    """Global registration at the reference's scales (preprocess_pcd +
    RANSAC, icp_cad_model.py:44-90): voxel downsample BOTH clouds, then
    normals at 2*voxel, FPFH at 5*voxel, feature matching, and batched
    3-point RANSAC with edge-length 0.9 + distance 2.5*voxel checkers.

    The downsample is the load-bearing step the scales hang off: FPFH on
    the RAW dense cloud is degenerate (at 1M points / ~1 mm spacing a
    k-NN neighborhood spans a few mm of locally-planar surface, every
    descriptor looks alike, and matching is random — measured fitness
    0.003; the r3/r4 bench nulls were exactly this). Downsampled points
    are compacted to `capacity` static slots so every downstream stage
    costs O(capacity), not O(N).

    Returns (T (4,4) np, fitness float, n_down int — if n_down exceeds
    capacity the extra voxels were dropped; raise capacity)."""
    import jax as _jax
    import numpy as np

    from repas_tpu.cloud.filters import compact_masked, voxel_downsample
    from repas_tpu.cloud.fpfh import (fpfh_features, match_features,
                                      ransac_registration)
    from repas_tpu.cloud.normals import estimate_normals_grid

    clouds = []
    n_down = 0
    for pts, mask in ((src, src_mask), (tgt, tgt_mask)):
        pd, _, _, md = voxel_downsample(jnp.asarray(pts, jnp.float32),
                                        mask, voxel)
        pc, mc, nv = compact_masked(pd, md, capacity)
        n_down = max(n_down, int(nv))
        nrm, _ = estimate_normals_grid(pc, mc, k=24, radius=2.0 * voxel,
                                       dims=(32, 32, 32), slots=32)
        feat = fpfh_features(pc, nrm, mc, radius=5.0 * voxel, k=48,
                             dims=(32, 32, 32), slots=32)
        clouds.append((pc, mc, feat))
    (sp, sm, sf), (tp, tm, tf) = clouds
    corr, _ = match_features(sf, sm, tf, tm, chunk=1024)
    T, fitness = ransac_registration(sp, sm, tp, tm, corr,
                                     dist_thresh=2.5 * voxel,
                                     edge_check=edge_check,
                                     n_hypotheses=n_hypotheses,
                                     key=_jax.random.PRNGKey(seed))
    return np.asarray(T, np.float64), float(fitness), n_down


def register_clouds(src, src_mask, tgt, tgt_mask, voxel: float | None = None,
                    capacity: int = 8192, n_hypotheses: int = 8192,
                    icp_iters: int = 100, seed: int = 0,
                    icp_dims: tuple = (64, 64, 64)):
    """The reference's complete two-stage alignment
    (align_postop_to_preop, icp_cad_model.py:62-96): voxel = 2% of the
    combined AABB diagonal (floored at 1 mm), FPFH+RANSAC global init on
    the downsampled clouds, then point-to-plane ICP on the FULL dense
    clouds at 1.5*voxel correspondence distance, 100 iterations.

    Returns (ICPResult, ransac_fitness, voxel). Host-orchestrated: each
    stage is its own jitted program (the stages have incompatible shapes
    — capacity-compact vs full-N — and a single fused program would
    recompile per cloud size for no reuse)."""
    from repas_tpu.cloud.normals import estimate_normals_grid

    src = jnp.asarray(src, jnp.float32)
    tgt = jnp.asarray(tgt, jnp.float32)
    if voxel is None:
        voxel = max(0.02 * _aabb_diag(src, src_mask, tgt, tgt_mask), 1e-3)
    T0, fit_g, n_down = global_register_fpfh(
        src, src_mask, tgt, tgt_mask, voxel, capacity=capacity,
        n_hypotheses=n_hypotheses, seed=seed)
    nrm_t, _ = estimate_normals_grid(tgt, tgt_mask, k=16,
                                     radius=2.0 * voxel)
    res = icp_point_to_plane(src, src_mask, tgt, tgt_mask, nrm_t,
                             max_corr_dist=1.5 * voxel,
                             max_iters=icp_iters, T_init=T0,
                             dims=icp_dims)
    return res, fit_g, voxel
