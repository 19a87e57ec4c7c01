import json

import numpy as np
import pytest

from repas_tpu.core import calib


REF_FEMTO = "/root/reference/femto_bolt_code/scripts/calibration_parameters"
REF_RS = "/root/reference/realsense_d415i/april_tag_detection_caliberation"


def test_lean_schema(reference_root):
    intr = calib.load_intrinsics_json(
        f"{REF_FEMTO}/factory_color_intrinsics_2025-09-08T143506.json")
    assert abs(intr.fx - 748.8987426757812) < 1e-9
    assert intr.width == 1280 and intr.height == 720
    K = intr.K
    assert K[0, 0] == intr.fx and K[1, 2] == intr.cy and K[2, 2] == 1.0


def test_realsense_schema(reference_root):
    intr = calib.load_intrinsics_json(
        f"{REF_RS}/factory_color_intrinsics_640_480.json")
    assert abs(intr.fx - 608.2335815429688) < 1e-9
    assert abs(intr.cx - 312.52239990234375) < 1e-9
    assert intr.width == 640 and intr.height == 480
    np.testing.assert_allclose(intr.dist, np.zeros(8))


def test_checkerboard_json_and_npz(reference_root):
    j = calib.load_intrinsics_json(
        f"{REF_FEMTO}/checkerboard_color_intrinsics_2025-08-26T183535.json")
    n = calib.load_calibration_npz(
        f"{REF_FEMTO}/factory_color_intrinsics_2025-08-26T183535.npz")
    np.testing.assert_allclose(j.K, n.K, rtol=1e-12)
    np.testing.assert_allclose(j.dist[:5], n.dist[:5], rtol=1e-12)
    assert j.dist[0] != 0.0


def test_extrinsics_schemas(reference_root):
    rs = calib.load_extrinsics_json(f"{REF_RS}/factory_d2c_extrinsics.json")
    assert abs(rs.t[0] - 0.014984656125307083) < 1e-12
    femto = calib.load_extrinsics_json(
        f"{REF_FEMTO}/factory_extrinsics_d2c_2025-09-08T143506.json")
    np.testing.assert_allclose(femto.R, np.eye(3))
    inv = rs.inverse()
    # factory R is stored float32 and only approximately orthonormal
    np.testing.assert_allclose(inv.T @ rs.T, np.eye(4), atol=1e-6)


def test_scaling():
    intr = calib.Intrinsics(fx=600.0, fy=600.0, cx=320.0, cy=240.0,
                            width=640, height=480)
    s = intr.scaled(1280, 960)
    assert s.fx == 1200.0 and s.cx == 640.0 and s.width == 1280
    # no-op cases (mpa_final_view_with_export.py:65-69 semantics)
    same = intr.scaled(640, 480)
    assert same.fx == intr.fx
    unknown = calib.Intrinsics(fx=600.0, fy=600.0, cx=320.0, cy=240.0)
    assert unknown.scaled(1280, 960).fx == 600.0


def test_save_roundtrip(tmp_path):
    intr = calib.Intrinsics(fx=1.5, fy=2.5, cx=3.0, cy=4.0, width=10,
                            height=20, dist=[0.1, 0.2, 0.3, 0.4, 0.5])
    calib.save_intrinsics_json(intr, tmp_path / "lean.json", "lean")
    back = calib.load_intrinsics_json(tmp_path / "lean.json")
    assert back.fx == 1.5 and back.height == 20
    calib.save_intrinsics_json(intr, tmp_path / "rs.json", "realsense")
    rs = calib.load_intrinsics_json(tmp_path / "rs.json")
    assert rs.cx == 3.0
    np.testing.assert_allclose(rs.dist[:5], intr.dist[:5])


def test_bundle_schema(tmp_path):
    bundle = {
        "color_intrinsics": {"fx": 1.0, "fy": 2.0, "cx": 3.0, "cy": 4.0,
                             "width": 100, "height": 50},
        "depth_intrinsics": {"fx": 5.0, "fy": 6.0, "cx": 7.0, "cy": 8.0},
        "extrinsics": {"depth_to_color": {
            "R": np.eye(3).tolist(), "t": [0.01, 0.0, 0.0]}},
    }
    p = tmp_path / "bundle.json"
    p.write_text(json.dumps(bundle))
    c = calib.load_intrinsics_json(p)
    assert c.fx == 1.0
    d = calib.load_intrinsics_json(p, stream="depth")
    assert d.fx == 5.0
    e = calib.load_extrinsics_json(p)
    assert e.t[0] == 0.01
