"""CLI entry points mirroring the reference scripts (SURVEY.md §7).

Run as `python -m repas_tpu.apps.<command>`:
  detect_tags, estimate_pose, capture_aligned, generate_pointcloud,
  crop_scene, place_cad, refine_icp, apply_6dof, calibrate, detect_canopy,
  ply_to_stl, error_report, validate_pose, fetch_intrinsics
"""
