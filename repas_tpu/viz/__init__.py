from repas_tpu.viz.scene import (draw_detections, draw_reprojection_compare, plot_pointcloud,
                                 save_pointcloud_views, make_xy_grid_lines,
                                 axes_points, sphere_points,
                                 aabb_wireframe_segments, line_points,
                                 save_color_scale)
from repas_tpu.viz.render import (render_pointcloud, look_at, orbit_views,
                                  rasterize_segments)
from repas_tpu.viz.html_viewer import write_html_viewer

__all__ = ["draw_detections", "draw_reprojection_compare", "plot_pointcloud", "save_pointcloud_views",
           "make_xy_grid_lines", "axes_points", "sphere_points",
           "aabb_wireframe_segments", "line_points", "save_color_scale",
           "render_pointcloud", "look_at", "orbit_views",
           "rasterize_segments", "write_html_viewer"]
