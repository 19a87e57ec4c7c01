from repas_tpu.detect.tag_families import TAG36H11_CODES, tag_family_bits, rotation_perms
from repas_tpu.detect.detector import Detections, detect_tags, detect_tags_batch
from repas_tpu.detect.render import render_tag

__all__ = [
    "TAG36H11_CODES", "tag_family_bits", "rotation_perms",
    "Detections", "detect_tags", "detect_tags_batch", "render_tag",
]
