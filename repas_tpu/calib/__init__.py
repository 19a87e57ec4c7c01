from repas_tpu.calib.checkerboard import (detect_checkerboard_corners,
                                          refine_corners_subpix,
                                          calibrate_camera)

__all__ = ["detect_checkerboard_corners", "refine_corners_subpix",
           "calibrate_camera"]
