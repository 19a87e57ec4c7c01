"""decision_margin calibration to AprilTag3's definition (VERDICT r3 #4).

The C detector (apriltag.c quad_decode) scores a decode as
min(mean white-side |v - thresh|, mean black-side |v - thresh|) in 0-255
gray units, thresholding each data cell against linear black/white gray
models fit from the border / quiet zone. The `margin >= 10` acceptance
gate (three_pose_vertical_translation_validation.py:38) is a cross-tool
contract on that SCALE, so these tests pin margin VALUES, not ordering:

  1. analytic flat-contrast scale: a clean tag at white w / black b has
     per-cell |v - thresh| = (w - b)/2 on both classes, so margin must
     equal (w - b)/2 (sharpening disabled for exactness);
  2. illumination-gradient scale: under a multiplicative ramp I(x), the
     linear models track the ramp and the margin stays ~(w - b)/2 * mean
     ramp over the tag — a global-threshold margin deflates well below
     the lower bound asserted here;
  3. the margin >= 10 gate reproduces the reference's accept set on the
     checked-in real captures (all 8 are accepted poses in the
     three-pose validation data).
"""
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect import detect_tags, render_tag

CFG0 = DetectorConfig(max_components=8, max_detections=4, ccl_iters=8,
                      decode_sharpening=0.0, min_decision_margin=1.0)


def _best_margin(det):
    v = np.asarray(det.valid)
    assert v.any()
    return float(np.asarray(det.decision_margin)[v].max())


@pytest.mark.parametrize("white,black", [(255.0, 0.0), (200.0, 100.0),
                                         (160.0, 120.0), (140.0, 120.0)])
def test_margin_analytic_flat_contrast(white, black):
    img = render_tag(7, cell_px=16, white=white, black=black)
    det = detect_tags(jnp.asarray(img), CFG0)
    got = _best_margin(det)
    want = (white - black) / 2.0
    assert abs(got - want) < max(0.08 * want, 1.0), (got, want)


def test_margin_scales_linearly_with_contrast():
    margins = []
    for c in [40.0, 80.0, 160.0]:
        img = render_tag(3, cell_px=16, white=128 + c / 2, black=128 - c / 2)
        margins.append(_best_margin(detect_tags(jnp.asarray(img), CFG0)))
    r1 = margins[1] / margins[0]
    r2 = margins[2] / margins[1]
    assert abs(r1 - 2.0) < 0.2 and abs(r2 - 2.0) < 0.2, margins


def test_margin_under_illumination_gradient():
    """Linear gray models keep the margin calibrated when the tag is
    unevenly lit; a global mean threshold would collapse toward the
    per-cell-miss regime and deflate the value."""
    white, black = 230.0, 30.0
    img = np.asarray(render_tag(11, cell_px=16, white=white, black=black))
    h, w = img.shape
    ramp = np.linspace(0.65, 1.0, w, dtype=np.float32)[None, :]
    lit = img * ramp
    det = detect_tags(jnp.asarray(lit), CFG0)
    got = _best_margin(det)
    want_lo = (white - black) / 2.0 * 0.65
    want_hi = (white - black) / 2.0 * 1.0
    assert want_lo * 0.9 < got < want_hi * 1.05, (got, want_lo, want_hi)


def test_margin_gate_accepts_reference_capture_set():
    """The reference's three-pose validation accepts every checked-in
    capture at margin >= 10 (three_pose_vertical_translation_validation
    .py:38,60-70); our calibrated margin must reproduce that accept set."""
    from repas_tpu.detect.robust import detect_tags_robust
    from repas_tpu.io.image import read_image

    root = pathlib.Path("/root/reference/realsense_d415i/testing_scripts")
    if not root.exists():
        pytest.skip("reference captures not mounted")
    paths = sorted(root.glob("*_outputs/pose */rgb_*.png"))
    assert len(paths) >= 8
    cfg = DetectorConfig()
    accepted = 0
    for p in paths:
        img = read_image(p)
        if img is None or img.shape[:2] != (720, 1280):
            continue
        det = detect_tags_robust(jnp.asarray(img), cfg)
        v = np.asarray(det.valid)
        if not v.any():
            continue
        m = float(np.asarray(det.decision_margin)[v].max())
        assert m >= 10.0, (p, m)
        accepted += 1
    assert accepted >= 8, accepted
