"""CLI smoke tests on small synthetic inputs (app wiring, I/O contracts,
sidecar metadata). Heavy 720p runs live in test_golden.py."""
import json

import numpy as np
import pytest

from repas_tpu.detect.render import render_tag_in_scene
from repas_tpu.io.image import write_depth_png, write_image
from repas_tpu.io.meta import read_meta
from repas_tpu.io.ply import PointCloud, read_ply, write_ply
from repas_tpu.io.pose_txt import save_transform_txt


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """A small synthetic capture: tag 9 at a known pose + flat depth."""
    d = tmp_path_factory.mktemp("scene")
    K = np.array([[240.0, 0, 160.0], [0, 240.0, 120.0], [0, 0, 1.0]])
    gray = render_tag_in_scene(9, np.eye(3), np.array([0.0, 0.0, 0.4]),
                               K, 0.12, (240, 320), supersample=1)
    rgb = np.repeat(gray[..., None], 3, axis=-1).astype(np.uint8)
    write_image(d / "rgb_20250101_000000.png", rgb)
    depth = np.full((240, 320), 0.4, dtype=np.float32)
    write_depth_png(d / "depth_raw_20250101_000000.png", depth)
    (d / "K.json").write_text(json.dumps(
        {"fx": 240.0, "fy": 240.0, "cx": 160.0, "cy": 120.0,
         "width": 320, "height": 240}))
    return d


def test_detect_tags_cli(scene_dir, tmp_path):
    from repas_tpu.apps.detect_tags import main

    out = main([str(scene_dir / "rgb_20250101_000000.png"),
                "--json", str(tmp_path / "det.json")])
    ids = [d["id"] for d in out[0]["detections"]]
    assert 9 in ids
    saved = json.loads((tmp_path / "det.json").read_text())
    assert saved[0]["detections"][0]["hamming"] == 0


def test_estimate_pose_cli(scene_dir, tmp_path):
    from repas_tpu.apps.estimate_pose import main

    out = main(["--color", str(scene_dir / "rgb_20250101_000000.png"),
                "--depth", str(scene_dir / "depth_raw_20250101_000000.png"),
                "--intrinsics", str(scene_dir / "K.json"),
                "--tag-size", "0.12", "--tag-ids", "9",
                "--anchor-id", "9", "--flip-z-ids",
                "--json", str(tmp_path / "pose.json")])
    tag = out["tags"][0]
    assert tag["id"] == 9
    assert tag["reproj_err_px"] < 1.0
    # flat depth at 0.4 m -> depth-corrected anchor z ~ 0.4
    assert abs(out["anchor_P_depth"][2] - 0.4) < 0.01


def test_generate_pointcloud_cli(scene_dir, tmp_path):
    from repas_tpu.apps.generate_pointcloud import main

    out_ply = tmp_path / "cloud.ply"
    main(["--color", str(scene_dir / "rgb_20250101_000000.png"),
          "--depth", str(scene_dir / "depth_raw_20250101_000000.png"),
          "--intrinsics", str(scene_dir / "K.json"),
          "--out", str(out_ply)])
    pc = read_ply(out_ply)
    assert len(pc) == 240 * 320
    np.testing.assert_allclose(np.median(pc.points[:, 2]), 0.4, atol=2e-3)
    meta = read_meta(out_ply.with_suffix(".meta.json"))
    assert meta["kind"] == "capture" and meta["n_points"] == len(pc)


def test_apply_6dof_cli(tmp_path, rng):
    from repas_tpu.apps.apply_6dof import main

    pc = PointCloud(points=rng.normal(size=(200, 3)) * 100)  # mm units
    write_ply(tmp_path / "cad.ply", pc)
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.2, 0.3]
    save_transform_txt(tmp_path / "pose.txt", T)
    main(["--pose", str(tmp_path / "pose.txt"),
          "--cad", str(tmp_path / "cad.ply"),
          "--out", str(tmp_path / "posed.ply"), "--units", "0.001"])
    posed = read_ply(tmp_path / "posed.ply")
    np.testing.assert_allclose(posed.points.mean(axis=0),
                               pc.points.mean(axis=0) * 0.001 + [0.1, 0.2, 0.3],
                               atol=1e-6)
    meta = read_meta((tmp_path / "posed.ply").with_suffix(".meta.json"))
    assert meta["kind"] == "cad_transform"


def test_capture_aligned_cli(scene_dir, tmp_path):
    from repas_tpu.apps.capture_aligned import main

    main(["--source", str(scene_dir), "--intrinsics",
          str(scene_dir / "K.json"), "--out", str(tmp_path / "caps"),
          "--frames", "1"])
    caps = list((tmp_path / "caps").glob("capture_*"))
    assert len(caps) == 1
    files = {p.name.split("_")[0] for p in caps[0].iterdir()}
    assert {"color", "aligned", "pointcloud", "capture"} <= files


def test_fetch_intrinsics_cli(scene_dir, tmp_path):
    from repas_tpu.apps.fetch_intrinsics import main

    out = tmp_path / "bundle.json"
    main(["--color", str(scene_dir / "K.json"), "--out", str(out)])
    bundle = json.loads(out.read_text())
    assert bundle["color_intrinsics"]["fx"] == 240.0


def test_detect_canopy_cli(tmp_path):
    from repas_tpu.apps.detect_canopy import main

    rgb = np.full((240, 320, 3), 120, dtype=np.uint8)
    rgb[198:203, 10:310] = 240                      # bar
    yy, xx = np.mgrid[0:240, 0:320]
    blob = ((yy - 130) ** 2 / 2500 + (xx - 160) ** 2 / 900) < 1.0
    rgb[blob] = [40, 170, 50]                       # plant
    write_image(tmp_path / "c.png", rgb)
    write_depth_png(tmp_path / "d.png", np.full((240, 320), 0.8, np.float32))
    out = main(["--color", str(tmp_path / "c.png"),
                "--depth", str(tmp_path / "d.png"),
                "--fx", "300", "--out-txt", str(tmp_path / "z.txt")])
    assert abs(out["plant_height_m"] - 0.32) < 0.04
    assert abs(float((tmp_path / "z.txt").read_text())
               - out["plant_height_m"]) < 1e-3


def test_error_report_cli(tmp_path, rng):
    from repas_tpu.apps.error_report import main
    from repas_tpu.io.ply import TriangleMesh, write_stl

    mesh = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]]),
        triangles=np.array([[0, 1, 2], [0, 2, 3]]))
    write_stl(tmp_path / "m.stl", mesh)
    pts = np.column_stack([rng.uniform(0.1, 0.9, 100),
                           rng.uniform(0.1, 0.9, 100),
                           rng.normal(scale=0.003, size=100)])
    write_ply(tmp_path / "c.ply", PointCloud(points=pts))
    rep = main(["surface", "--cloud", str(tmp_path / "c.ply"),
                "--mesh", str(tmp_path / "m.stl"),
                "--txt", str(tmp_path / "e.txt"),
                "--colored-out", str(tmp_path / "colored.ply")])
    assert rep["count"] == 100
    assert rep["mean_mm"] < 10
    assert (tmp_path / "e.txt").exists()
    colored = read_ply(tmp_path / "colored.ply")
    assert colored.colors is not None


def test_ply_to_stl_cli(tmp_path, rng):
    from repas_tpu.apps.ply_to_stl import main
    from repas_tpu.io.ply import read_stl

    v = rng.normal(size=(3000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write_ply(tmp_path / "sphere.ply",
              PointCloud(points=(v * 0.1).astype(np.float32),
                         normals=v.astype(np.float32)))
    main([str(tmp_path / "sphere.ply"), str(tmp_path / "out.stl"),
          "--dim", "40"])
    mesh = read_stl(tmp_path / "out.stl")
    assert len(mesh.triangles) > 100
