from repas_tpu.pose.pnp import (
    solve_pnp_ippe_square,
    solve_pnp_best_order,
    solve_pnp_sqpnp,
    refine_pnp_gn,
    SQUARE_ORDERS,
    square_object_points,
)
from repas_tpu.pose.depth_correct import depth_corrected_translation, z_scale_correction
from repas_tpu.pose.fusion import fuse_tag_poses, FusedPose
from repas_tpu.pose.bundle import solve_tag_bundle
from repas_tpu.pose.track import TagTracker, TrackerConfig, TrackResult

__all__ = [
    "solve_pnp_ippe_square", "solve_pnp_best_order", "solve_pnp_sqpnp",
    "refine_pnp_gn", "SQUARE_ORDERS", "square_object_points",
    "depth_corrected_translation", "z_scale_correction", "fuse_tag_poses",
    "FusedPose", "solve_tag_bundle", "TagTracker", "TrackerConfig",
    "TrackResult",
]
