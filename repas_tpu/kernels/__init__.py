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
from repas_tpu.kernels.ccl import connected_components, top_k_components
from repas_tpu.kernels.color import frame_to_rgb, nv12_to_rgb, yuyv_to_rgb
from repas_tpu.kernels import image

__all__ = [
    "project_points", "deproject_pixels", "undistort_points",
    "distort_normalized", "depth_to_meters", "depth_image_to_points",
    "rgbd_to_pointcloud", "median_depth_window", "align_depth_to_color",
    "connected_components", "top_k_components", "frame_to_rgb",
    "nv12_to_rgb", "yuyv_to_rgb", "image",
]
