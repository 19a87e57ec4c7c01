from repas_tpu.viz.scene import (draw_detections, plot_pointcloud,
                                 save_pointcloud_views, make_xy_grid_lines,
                                 axes_points)

__all__ = ["draw_detections", "plot_pointcloud", "save_pointcloud_views",
           "make_xy_grid_lines", "axes_points"]
