import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.eval import (correspondence_report, load_picked_points,
                            point_to_mesh_distances, surface_error_report)
from repas_tpu.io.ply import TriangleMesh


def test_picked_points_xml(tmp_path):
    pp = """<?xml version="1.0" encoding="UTF-8"?>
<PickedPoints>
 <point x="1.5" y="2.5" z="3.5" name="a" active="1"/>
 <point x="-1" y="0" z="2" name="b" active="1"/>
</PickedPoints>"""
    p = tmp_path / "picks.pp"
    p.write_text(pp)
    pts = load_picked_points(p)
    np.testing.assert_allclose(pts, [[1.5, 2.5, 3.5], [-1, 0, 2]])


def test_correspondence_report(tmp_path):
    ref = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]])
    meas = ref + np.array([[0.002, 0, 0], [0.002, 0.001, 0],
                           [0.003, 0, 0.004]])
    rep = correspondence_report(ref, meas,
                                txt_path=tmp_path / "e.txt",
                                csv_path=tmp_path / "e.csv")
    assert rep["points"][0]["grade"] == "EXCELLENT"
    assert abs(rep["points"][0]["euclidean_mm"] - 2.0) < 1e-9
    assert rep["systematic_bias"]  # all offsets share +x
    txt = (tmp_path / "e.txt").read_text()
    assert "POINT CORRESPONDENCE" in txt and "EXCELLENT" in txt
    csv = (tmp_path / "e.csv").read_text().splitlines()
    assert csv[0].startswith("label,dx_mm")
    assert len(csv) == 4


def test_point_to_mesh_distances():
    # unit square in z=0 plane, two triangles
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]]),
        triangles=np.array([[0, 1, 2], [0, 2, 3]]))
    pts = jnp.array([[0.5, 0.5, 0.3],    # above interior -> 0.3
                     [2.0, 0.5, 0.0],    # beyond edge -> 1.0
                     [0.25, 0.25, 0.0]]) # on surface -> 0
    d = np.asarray(point_to_mesh_distances(
        pts, jnp.asarray(mesh.vertices, jnp.float32),
        jnp.asarray(mesh.triangles, jnp.int32), chunk=8))
    np.testing.assert_allclose(d, [0.3, 1.0, 0.0], atol=1e-5)


def test_surface_error_report(tmp_path, rng):
    d = np.abs(rng.normal(scale=0.005, size=2000))
    rep = surface_error_report(d, txt_path=tmp_path / "a.txt",
                               png_path=tmp_path / "h.png")
    assert rep["count"] == 2000
    assert 3.0 < rep["mean_mm"] < 6.0
    assert (tmp_path / "h.png").exists()
    assert "ALIGNMENT" in (tmp_path / "a.txt").read_text()


def test_reconstruct_sphere(rng):
    from repas_tpu.cloud.reconstruct import reconstruct_surface
    from repas_tpu.io.ply import PointCloud

    # oriented sphere samples
    v = rng.normal(size=(4000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = PointCloud(points=(v * 0.1).astype(np.float32),
                    normals=v.astype(np.float32))
    mesh = reconstruct_surface(pc, dim=48)
    assert len(mesh.triangles) > 200
    r = np.linalg.norm(mesh.vertices, axis=1)
    # reconstructed surface close to the true radius
    assert abs(np.median(r) - 0.1) < 0.015


def test_viz_scene_builders(tmp_path):
    from repas_tpu.viz.scene import (aabb_wireframe_segments, line_points,
                                     save_color_scale, sphere_points)

    s = sphere_points([1.0, 2.0, 3.0], radius=0.01, n=32)
    np.testing.assert_allclose(
        np.linalg.norm(s - [1, 2, 3], axis=1), 0.01, atol=1e-9)
    w = aabb_wireframe_segments([0, 0, 0], [1, 2, 3])
    assert w.shape == (12, 2, 3)
    lp = line_points([0, 0, 0], [1, 0, 0], n=5)
    np.testing.assert_allclose(lp[:, 0], [0, 0.25, 0.5, 0.75, 1.0])
    save_color_scale(tmp_path / "scale.png")
    assert (tmp_path / "scale.png").exists()
