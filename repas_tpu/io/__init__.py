from repas_tpu.io.image import read_image, write_image, read_depth_png, write_depth_png
from repas_tpu.io.ply import PointCloud, TriangleMesh, read_ply, write_ply, read_stl, write_stl, read_geometry
from repas_tpu.io.pose_txt import load_transform_txt, save_transform_txt
from repas_tpu.io.meta import write_meta, read_meta

__all__ = [
    "read_image", "write_image", "read_depth_png", "write_depth_png",
    "PointCloud", "TriangleMesh", "read_ply", "write_ply", "read_stl",
    "write_stl", "read_geometry", "load_transform_txt", "save_transform_txt",
    "write_meta", "read_meta",
]
