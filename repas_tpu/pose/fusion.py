"""Multi-tag pose fusion: per-tag PnP, weighting, flip fixes, quaternion
averaging, anchor selection (the mpa_* pipeline core).

Re-implements the main loop of mpa_final_view_with_export.py:287-352 as one
fixed-shape jittable function over a batch of detected tags:

  * weight_i = max(area,1e-3) / max(reproj_err,1e-3)       (line 295)
  * optional per-id 180-deg Z-flip fix (tag 9, lines 325-335)
  * weighted hemisphere-aligned quaternion average          (lines 337-343)
  * anchor = configured id if present+valid, else argmax weight (347-352)
  * depth-corrected anchor translation P_depth              (lines 297-313)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from repas_tpu.core.transforms import average_rotations_quat, flip_z_180
from repas_tpu.pose.depth_correct import depth_corrected_translation
from repas_tpu.pose.pnp import solve_pnp_best_order


@jax.tree_util.register_dataclass
@dataclass
class FusedPose:
    """Result of multi-tag fusion (all arrays fixed-capacity)."""

    R_avg: jnp.ndarray        # (3,3) averaged rotation
    anchor_t: jnp.ndarray     # (3,) anchor PnP translation
    anchor_P_depth: jnp.ndarray  # (3,) depth-corrected anchor position
    anchor_idx: jnp.ndarray   # () index into the detection slots
    R: jnp.ndarray            # (N,3,3) per-tag rotations (post flip-fix)
    t: jnp.ndarray            # (N,3) per-tag translations
    P_depth: jnp.ndarray      # (N,3) per-tag depth-corrected positions
    P_depth_valid: jnp.ndarray  # (N,) bool
    weights: jnp.ndarray      # (N,)
    err_px: jnp.ndarray       # (N,) reprojection errors
    order_idx: jnp.ndarray    # (N,) winning corner order per tag


@partial(jax.jit, static_argnames=("win", "try_all_orders"))
def fuse_tag_poses(corners: jnp.ndarray, ids: jnp.ndarray,
                   areas: jnp.ndarray, valid: jnp.ndarray,
                   depth_m: jnp.ndarray, K, dist, tag_size_m,
                   anchor_id: int = 16,
                   flip_z_ids: jnp.ndarray | None = None,
                   win: int = 5, try_all_orders: bool = False) -> FusedPose:
    """corners (N,4,2) px, ids (N,), areas (N,), valid (N,) mask;
    depth_m (H,W) aligned to color. Invalid slots are ignored via masks.

    try_all_orders runs the reference's 8-corner-order search (C3) — kept
    for parity with corner sources of unknown order. The framework's own
    detector canonicalizes corners to TL,TR,BR,BL during decode, so the
    default solves the known order once (8x less PnP work).
    """
    n = corners.shape[0]
    K = jnp.asarray(K, jnp.float32)

    if try_all_orders:
        solve = jax.vmap(
            lambda c: solve_pnp_best_order(c, K, dist, tag_size_m))
        Rs, ts, errs, orders = solve(corners.astype(jnp.float32))
    else:
        from repas_tpu.pose.pnp import solve_pnp_ippe_square

        solve = jax.vmap(
            lambda c: solve_pnp_ippe_square(c, K, dist, tag_size_m))
        Rs, ts, errs = solve(corners.astype(jnp.float32))
        orders = jnp.zeros(n, jnp.int32)

    # per-id flip fix (reference hardcodes tag 9)
    if flip_z_ids is None:
        flip_z_ids = jnp.asarray([9], jnp.int32)
    needs_flip = jnp.any(ids[:, None] == flip_z_ids[None, :], axis=1)
    Rs = jnp.where(needs_flip[:, None, None],
                   jax.vmap(flip_z_180)(Rs), Rs)

    # Invalid slots carry degenerate corners (4 identical points); the
    # IPPE solve goes singular and returns NaN R/t/err. Sanitize before any
    # arithmetic so NaN never leaks into weights, averaging, or anchors.
    finite = (jnp.all(jnp.isfinite(Rs), axis=(1, 2))
              & jnp.all(jnp.isfinite(ts), axis=1)
              & jnp.isfinite(errs))
    valid = valid & finite
    Rs = jnp.where(valid[:, None, None], Rs, jnp.eye(3, dtype=Rs.dtype))
    ts = jnp.where(valid[:, None], ts,
                   jnp.asarray([0.0, 0.0, 1.0], ts.dtype))
    errs = jnp.where(valid, errs, 1e9)

    weights = jnp.maximum(areas, 1e-3) / jnp.maximum(errs, 1e-3)
    weights = jnp.where(valid, weights, 0.0)

    # depth-corrected positions
    Pd, Pd_valid = jax.vmap(
        lambda t: depth_corrected_translation(t, depth_m, K, win=win))(ts)

    R_avg = average_rotations_quat(Rs, weights, mask=valid)

    # anchor: prefer anchor_id when present with valid depth, else max weight
    is_anchor = (ids == anchor_id) & valid & Pd_valid
    fallback = jnp.argmax(jnp.where(valid, weights, -jnp.inf))
    anchor_idx = jnp.where(jnp.any(is_anchor),
                           jnp.argmax(is_anchor), fallback)

    return FusedPose(
        R_avg=R_avg,
        anchor_t=ts[anchor_idx],
        anchor_P_depth=Pd[anchor_idx],
        anchor_idx=anchor_idx,
        R=Rs, t=ts, P_depth=Pd, P_depth_valid=Pd_valid,
        weights=weights, err_px=errs, order_idx=orders,
    )
