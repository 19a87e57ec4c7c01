import numpy as np
import pytest

from repas_tpu.io import (PointCloud, TriangleMesh, read_depth_png,
                          read_geometry, read_image, read_ply, read_stl,
                          write_depth_png, write_image, write_ply, write_stl)
from repas_tpu.io.meta import read_meta, write_meta
from repas_tpu.io.pose_txt import load_transform_txt, save_transform_txt


def test_png_rgb_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8)
    write_image(tmp_path / "a.png", img)
    back = read_image(tmp_path / "a.png")
    np.testing.assert_array_equal(back, img)


def test_png_depth16_roundtrip(tmp_path, rng):
    d = rng.integers(0, 65535, size=(24, 40), dtype=np.uint16)
    write_image(tmp_path / "d.png", d)
    back = read_image(tmp_path / "d.png")
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, d)


def test_depth_meters_roundtrip(tmp_path):
    m = np.array([[0.5, 1.25], [0.0, 2.0]], dtype=np.float32)
    write_depth_png(tmp_path / "d.png", m)
    back = read_depth_png(tmp_path / "d.png")
    np.testing.assert_allclose(back, m, atol=1e-3)


def test_reference_depth_png(reference_root):
    d = read_depth_png(
        reference_root / "realsense_d415i/testing_scripts/aligned_outputs"
        / "pose 1/depth_raw_20250808_142303.png")
    assert d.shape == (360, 640)
    valid = d[d > 0]
    assert 0.1 < np.median(valid) < 10.0  # plausible meters


def test_ply_pointcloud_roundtrip(tmp_path, rng):
    pc = PointCloud(points=rng.normal(size=(100, 3)),
                    colors=rng.random((100, 3)),
                    normals=rng.normal(size=(100, 3)))
    for ascii_mode in (False, True):
        write_ply(tmp_path / "pc.ply", pc, ascii=ascii_mode)
        back = read_ply(tmp_path / "pc.ply")
        assert isinstance(back, PointCloud)
        np.testing.assert_allclose(back.points, pc.points, atol=1e-6)
        np.testing.assert_allclose(back.colors, pc.colors, atol=1 / 255.0)
        np.testing.assert_allclose(back.normals, pc.normals, atol=1e-6)


def test_ply_mesh_roundtrip(tmp_path):
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]),
        triangles=np.array([[0, 1, 2], [0, 1, 3]]))
    for ascii_mode in (False, True):
        write_ply(tmp_path / "m.ply", mesh, ascii=ascii_mode)
        back = read_ply(tmp_path / "m.ply")
        assert isinstance(back, TriangleMesh)
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(back.triangles, mesh.triangles)


def test_stl_roundtrip(tmp_path):
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]]),
        triangles=np.array([[0, 1, 2], [0, 2, 3]]))
    write_stl(tmp_path / "m.stl", mesh)
    back = read_stl(tmp_path / "m.stl")
    assert len(back.triangles) == 2
    # vertex set must match (order may differ after dedup)
    a = set(map(tuple, np.round(back.vertices, 6)))
    b = set(map(tuple, np.round(mesh.vertices, 6)))
    assert a == b
    g = read_geometry(tmp_path / "m.stl")
    assert isinstance(g, TriangleMesh)


def test_mesh_sampling():
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0.0]]),
        triangles=np.array([[0, 1, 2]]))
    pc = mesh.sample_points_uniformly(5000, seed=1)
    assert len(pc) == 5000
    # all samples inside the triangle (x,y >= 0, x+y <= 2, z = 0)
    assert (pc.points[:, 0] >= -1e-9).all()
    assert (pc.points[:, 1] >= -1e-9).all()
    assert (pc.points[:, 0] + pc.points[:, 1] <= 2 + 1e-9).all()
    np.testing.assert_allclose(pc.points[:, 2], 0, atol=1e-12)
    # roughly uniform: centroid near (2/3, 2/3)
    np.testing.assert_allclose(pc.points.mean(axis=0)[:2], [2 / 3, 2 / 3],
                               atol=0.05)


def test_pose_txt(reference_root, tmp_path):
    T = load_transform_txt(reference_root / "6dof/20250917_164430.txt")
    assert T.shape == (4, 4)
    assert abs(np.linalg.det(T[:3, :3]) - 1.0) < 1e-3
    save_transform_txt(tmp_path / "t.txt", T)
    back = load_transform_txt(tmp_path / "t.txt")
    np.testing.assert_allclose(back, T, rtol=1e-15)


def test_pose_txt_rejects_bad(tmp_path):
    bad = np.eye(4)
    bad[0, 0] = 3.0
    np.savetxt(tmp_path / "bad.txt", bad)
    with pytest.raises(ValueError):
        load_transform_txt(tmp_path / "bad.txt")


def test_meta_roundtrip(tmp_path):
    m = write_meta(tmp_path / "meta.json", "capture",
                   depth_scale=0.001, K=np.eye(3), ids=[9, 16])
    back = read_meta(tmp_path / "meta.json")
    assert back["kind"] == "capture"
    assert back["depth_scale"] == 0.001
    assert back["ids"] == [9, 16]
    assert np.asarray(back["K"]).shape == (3, 3)


def test_mesh_vertex_normals():
    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]]),
        triangles=np.array([[0, 1, 2]]))
    vn = mesh.compute_vertex_normals()
    np.testing.assert_allclose(np.abs(vn[:, 2]), 1.0, atol=1e-9)
