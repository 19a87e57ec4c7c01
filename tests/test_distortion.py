"""Distortion plumbing golden test (VERDICT r1 item 5).

The flagship pipeline must honor lens distortion coefficients end-to-end:
pose on a synthetically distorted render recovers truth to <1 mm when the
coefficients are passed, and degrades by several mm when they are omitted
(matching the reference's coeffs usage, checkerboard_callibration.py:241-255).
"""
import jax.numpy as jnp
import numpy as np

from repas_tpu.core.config import PipelineConfig, PnPConfig
from repas_tpu.core.transforms import rodrigues, rotation_angle_deg
from repas_tpu.detect.render import render_tag_in_scene
from repas_tpu.pipeline import process_frame

H, W = 720, 1280
F = 740.0
K = np.array([[F, 0, 640], [0, F, 360], [0, 0, 1.0]], np.float32)
# realistic checkerboard-calibration magnitudes (k1,k2,p1,p2,k3)
DIST = np.array([-0.24, 0.095, 0.0012, -0.0008, 0.018], np.float32)
TAG = 0.0303 * 3
TAG_ID = 5


def _distorted_case():
    rvec = np.array([0.25, -0.2, 0.1], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)), np.float32)
    t = np.array([0.08, 0.05, 0.55], np.float32)
    gray = render_tag_in_scene(TAG_ID, R, t, K, TAG, (H, W),
                               supersample=3, dist=DIST)
    rgb = np.repeat(gray[..., None], 3, -1).astype(np.uint8)
    depth = np.full((H, W), int(t[2] * 1000), np.uint16)
    return R, t, rgb, depth


def test_pipeline_distortion_golden():
    R, t, rgb, depth = _distorted_case()
    cfg = PipelineConfig(pnp=PnPConfig(tag_size_m=TAG))

    def solve(dist):
        out = process_frame(jnp.asarray(rgb), jnp.asarray(depth), K, cfg,
                            True, dist)
        ids = np.asarray(out.detections.ids)
        i = int(np.argmax(ids == TAG_ID))
        assert ids[i] == TAG_ID, f"tag not detected: {ids}"
        terr = float(np.linalg.norm(np.asarray(out.pose.t)[i] - t)) * 1000
        rerr = float(rotation_angle_deg(jnp.asarray(R), out.pose.R[i]))
        return terr, rerr

    terr_with, rerr_with = solve(jnp.asarray(DIST))
    terr_wo, rerr_wo = solve(None)
    assert terr_with < 1.0, f"with coeffs: {terr_with:.3f} mm"
    assert rerr_with < 0.3, f"with coeffs: {rerr_with:.3f} deg"
    # omitting the coeffs must visibly break the pose (the gate that
    # proves dist actually flows into the PnP solve)
    assert terr_wo > 3.0, f"without coeffs unexpectedly good: {terr_wo:.3f}"
    assert rerr_wo > 0.8, f"without coeffs unexpectedly good: {rerr_wo:.3f}"
