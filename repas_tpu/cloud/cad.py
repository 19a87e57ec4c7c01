"""CAD placement + refinement pipelines (C13/C14/C16).

Host-side orchestration with on-device math, mirroring:
  * place_cad_at_anchor — the origin-tracking placement of
    mpa_final_view_with_export.py:387-459: scale (units->m) about the
    original centroid, rotate by R_avg about the CAD origin, translate the
    origin to the anchor P_depth, optional ZYX pre-rotation about the
    anchor. Every step is recorded as an accumulated 4x4 (the provenance
    contract of mpa_icp_export.py:88-107,414-460).
  * refine_with_icp — mpa_icp_export.py:166-208: sample CAD surface (50k),
    voxel the scene (5 mm), estimate normals, point-to-plane ICP, report
    fitness / RMSE / delta-rotation / delta-translation.
  * apply_pose_txt — export_6dof.py: load validated 4x4, scale CAD,
    transform, export.
"""
from __future__ import annotations

from dataclasses import dataclass, field
import numpy as np
import jax.numpy as jnp

from repas_tpu.cloud.filters import voxel_downsample
from repas_tpu.cloud.normals import estimate_normals
from repas_tpu.cloud.registration import ICPResult, icp_point_to_plane
from repas_tpu.core.config import CadConfig, ICPConfig
from repas_tpu.core.transforms import (T_rotate_about_point,
                                       T_scale_about_point, T_translate,
                                       euler_zyx_to_R, rotation_angle_deg)
from repas_tpu.io.ply import PointCloud, TriangleMesh


@dataclass
class PlacementResult:
    T_cad_world: np.ndarray                 # accumulated 4x4
    steps: list = field(default_factory=list)  # [(name, 4x4), ...]
    origin_world: np.ndarray = None         # CAD origin after placement

    def record(self, name: str, T: np.ndarray):
        self.steps.append((name, np.asarray(T)))
        self.T_cad_world = np.asarray(T) @ self.T_cad_world

    def provenance(self) -> dict:
        return {
            "transform_order": [n for n, _ in self.steps],
            "transforms": {n: t.tolist() for n, t in self.steps},
            "T_cad_world": np.asarray(self.T_cad_world).tolist(),
        }


def place_cad_at_anchor(cad, R_avg, anchor_P_depth,
                        cfg: CadConfig = CadConfig()) -> PlacementResult:
    """Compute the CAD->world transform (does not mutate `cad`).

    Follows mpa_final_view_with_export.py:387-438 exactly:
      centroid c0 (CAD units) -> scale S about c0 -> the CAD origin is now
      at c0 + (-c0 * S) = c0 (1 - S) -> rotate R_avg about that origin ->
      translate origin to anchor -> optional ZYX pre-rot about anchor.
    """
    verts = cad.vertices if isinstance(cad, TriangleMesh) else cad.points
    c0 = np.asarray(verts).mean(axis=0)
    S = float(cfg.units_to_meters)

    res = PlacementResult(T_cad_world=np.eye(4))
    T_s = np.asarray(T_scale_about_point(S, jnp.asarray(c0, jnp.float64)))
    res.record("scale_about_centroid", T_s)

    origin_local = c0 * (1.0 - S)       # where (0,0,0) landed after scaling
    R_avg = np.asarray(R_avg, dtype=np.float64)
    T_r = np.asarray(T_rotate_about_point(jnp.asarray(R_avg),
                                          jnp.asarray(origin_local)))
    res.record("rotate_Ravg_about_origin", T_r)

    anchor = np.asarray(anchor_P_depth, dtype=np.float64)
    T_t = np.asarray(T_translate(jnp.asarray(anchor - origin_local)))
    res.record("translate_origin_to_anchor", T_t)

    if any(abs(a) > 1e-6 for a in cfg.pre_rot_deg_zyx):
        Rpre = np.asarray(euler_zyx_to_R(*cfg.pre_rot_deg_zyx),
                          dtype=np.float64)
        T_p = np.asarray(T_rotate_about_point(jnp.asarray(Rpre),
                                              jnp.asarray(anchor)))
        res.record("pre_rot_zyx_about_anchor", T_p)

    res.origin_world = anchor
    return res


def transform_geometry(cad, T: np.ndarray):
    return cad.transformed(np.asarray(T))


def refine_with_icp(cad, scene: PointCloud, cfg: ICPConfig = ICPConfig(),
                    seed: int = 0):
    """mpa_icp_export.py:166-208 semantics. Returns (ICPResult-as-dict,
    T_icp 4x4 numpy)."""
    if isinstance(cad, TriangleMesh):
        src_pc = cad.sample_points_uniformly(cfg.cad_samples, seed=seed)
        src = src_pc.points
    else:
        src = cad.points
        if len(src) > cfg.cad_samples:
            idx = np.random.default_rng(seed).choice(
                len(src), cfg.cad_samples, replace=False)
            src = src[idx]
    src = jnp.asarray(src, jnp.float32)
    src_mask = jnp.ones(src.shape[0], bool)

    tgt = jnp.asarray(scene.points, jnp.float32)
    tgt_mask = jnp.ones(tgt.shape[0], bool)
    if cfg.scene_voxel > 0:
        tgt, _, _, tgt_mask = voxel_downsample(tgt, tgt_mask,
                                               cfg.scene_voxel)
    normals, _ = estimate_normals(tgt, tgt_mask, k=cfg.normal_max_nn,
                                  radius=cfg.normal_radius)

    result = icp_point_to_plane(
        src, src_mask, tgt, tgt_mask, normals,
        max_corr_dist=cfg.max_corr_dist, max_iters=cfg.max_iters,
        rel_tol=cfg.rel_tol)
    T = np.asarray(result.T, dtype=np.float64)
    dR = float(rotation_angle_deg(jnp.eye(3), jnp.asarray(T[:3, :3],
                                                          jnp.float32)))
    report = {
        "fitness": float(result.fitness),
        "inlier_rmse": float(result.inlier_rmse),
        "iterations": int(result.iterations),
        "delta_rotation_deg": dR,
        "delta_translation_mm": float(np.linalg.norm(T[:3, 3]) * 1000.0),
    }
    return report, T


def apply_pose_txt(cad, T: np.ndarray, units_to_meters: float = 0.001):
    """export_6dof.py pipeline: scale CAD units->meters about the origin,
    then apply the validated 4x4. Returns (geometry, T_total)."""
    S = np.eye(4) * units_to_meters
    S[3, 3] = 1.0
    T_total = np.asarray(T, dtype=np.float64) @ S
    return cad.transformed(T_total), T_total
