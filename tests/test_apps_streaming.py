"""Smoke tests for the streaming / fusion / alignment CLIs."""
import json

import numpy as np
import pytest

from repas_tpu.detect.render import render_tag_in_scene
from repas_tpu.io.image import read_depth_png, write_depth_png, write_image


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_scene")
    K = np.array([[240.0, 0, 160.0], [0, 240.0, 120.0], [0, 0, 1.0]])
    gray = render_tag_in_scene(9, np.eye(3), np.array([0.0, 0.0, 0.4]),
                               K, 0.12, (240, 320), supersample=1)
    rgb = np.repeat(gray[..., None], 3, axis=-1).astype(np.uint8)
    write_image(d / "rgb_20250101_000000.png", rgb)
    write_depth_png(d / "depth_raw_20250101_000000.png",
                    np.full((240, 320), 0.4, dtype=np.float32))
    (d / "K.json").write_text(json.dumps(
        {"fx": 240.0, "fy": 240.0, "cx": 160.0, "cy": 120.0,
         "width": 320, "height": 240}))
    return d


def test_track_stream_cli(scene_dir, tmp_path):
    from repas_tpu.apps.track_stream import main

    main(["--source", str(scene_dir), "--intrinsics",
          str(scene_dir / "K.json"), "--frames", "1",
          "--tag-size", "0.12", "--no-pointcloud",
          "--out", str(tmp_path / "poses.jsonl")])
    recs = [json.loads(l) for l in open(tmp_path / "poses.jsonl")]
    assert len(recs) == 1
    assert recs[0]["ids"] == [9]
    # fronto-parallel tag at 0.4 m with flat depth
    assert abs(recs[0]["anchor_P_depth"][2] - 0.4) < 0.01


def test_fuse_views_cli(scene_dir, tmp_path):
    from repas_tpu.apps.fuse_views import main
    from repas_tpu.io.ply import read_ply
    from repas_tpu.io.meta import read_meta

    out = tmp_path / "fused.ply"
    main(["--views", str(scene_dir), "--intrinsics",
          str(scene_dir / "K.json"), "--tag-size", "0.12",
          "--anchor-id", "9", "--out", str(out)])
    pc = read_ply(out)
    assert len(pc) > 10_000
    # flat scene at the tag's depth -> world frame (tag at origin) puts
    # the cloud in the z ~ 0 plane
    assert abs(np.median(pc.points[:, 2])) < 0.01
    meta = read_meta(out.with_suffix(".meta.json"))
    assert meta["views"][0]["anchor_id"] == 9


def test_align_depth_cli(tmp_path):
    from repas_tpu.apps.align_depth import main

    write_depth_png(tmp_path / "d.png",
                    np.full((120, 160), 0.8, dtype=np.float32))
    (tmp_path / "dk.json").write_text(json.dumps(
        {"fx": 100.0, "fy": 100.0, "cx": 80.0, "cy": 60.0,
         "width": 160, "height": 120}))
    (tmp_path / "ck.json").write_text(json.dumps(
        {"fx": 200.0, "fy": 200.0, "cx": 160.0, "cy": 120.0,
         "width": 320, "height": 240}))
    (tmp_path / "ext.json").write_text(json.dumps(
        {"R": np.eye(3).tolist(), "t": [0.015, 0.0, 0.0]}))
    main(["--depth", str(tmp_path / "d.png"),
          "--depth-intrinsics", str(tmp_path / "dk.json"),
          "--color-intrinsics", str(tmp_path / "ck.json"),
          "--extrinsics", str(tmp_path / "ext.json"),
          "--width", "320", "--height", "240",
          "--out", str(tmp_path / "aligned.png")])
    a = read_depth_png(tmp_path / "aligned.png")
    valid = a[a > 0]
    assert valid.size > 0.8 * a.size
    np.testing.assert_allclose(np.median(valid), 0.8, atol=2e-3)
