from repas_tpu.kernels.project import (
    project_points,
    deproject_pixels,
    undistort_points,
    distort_normalized,
)
from repas_tpu.kernels.pointcloud import (
    depth_to_meters,
    depth_image_to_points,
    rgbd_to_pointcloud,
    median_depth_window,
)
from repas_tpu.kernels.align import align_depth_to_color

__all__ = [
    "project_points", "deproject_pixels", "undistort_points",
    "distort_normalized", "depth_to_meters", "depth_image_to_points",
    "rgbd_to_pointcloud", "median_depth_window", "align_depth_to_color",
]
