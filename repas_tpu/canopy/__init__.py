from repas_tpu.canopy.bar import (canny_edges, detect_bar,
                                 detect_rotate_bar, hough_horizontal_bar)
from repas_tpu.canopy.segment import green_seed_mask, refine_plant_mask, apply_green_mask
from repas_tpu.canopy.height import measure_plant_height, CanopyResult

__all__ = [
    "canny_edges", "hough_horizontal_bar", "detect_rotate_bar", "detect_bar",
    "green_seed_mask", "refine_plant_mask", "apply_green_mask",
    "measure_plant_height", "CanopyResult",
]
