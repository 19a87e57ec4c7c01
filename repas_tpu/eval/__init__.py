from repas_tpu.eval.reports import (correspondence_report, load_picked_points,
                                    point_to_mesh_distances,
                                    point_to_mesh_signed_distances,
                                    surface_error_report)

__all__ = ["correspondence_report", "load_picked_points",
           "point_to_mesh_distances", "point_to_mesh_signed_distances",
           "surface_error_report"]
