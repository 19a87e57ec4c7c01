"""Multi-tag bundle PnP (C5).

Re-implements solve_multi_tag_sqpnp
(mpe_final_view_tag_bundle_with_cad.py:180-298): given a known world layout
of tag centers (TAG_3D_POSITIONS, lines 33-42), stack 4 corners + 1 center
per detected tag and run one SQPnP solve for the camera pose in the layout
frame. Detector corners arrive in the detector's [BL,BR,TR,TL]-style order
and are paired against the canonical [TL,TR,BR,BL] object layout — here the
caller passes corners already in the framework's canonical TL,TR,BR,BL
order, matching the reorder at lines 239-247.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from repas_tpu.pose.pnp import solve_pnp_sqpnp


@partial(jax.jit, static_argnames=())
def solve_tag_bundle(corners: jnp.ndarray, centers_px: jnp.ndarray,
                     valid: jnp.ndarray, world_centers: jnp.ndarray,
                     tag_size_m, K, dist=None):
    """corners (M,4,2) detected pixel corners (TL,TR,BR,BL), centers_px
    (M,2), valid (M,) mask, world_centers (M,3) tag centers in the layout
    frame (tags coplanar in the layout's z=0 plane).

    Returns (R, t, mean_reproj_err_px): world->camera pose.
    """
    m = corners.shape[0]
    h = jnp.asarray(tag_size_m, jnp.float32) / 2.0
    # object corners in the layout plane around each center (TL,TR,BR,BL)
    offs = jnp.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0],
                      [1.0, 1.0, 0.0], [-1.0, 1.0, 0.0]], jnp.float32) * h
    obj_corners = world_centers[:, None, :] + offs[None, :, :]   # (M,4,3)
    obj = jnp.concatenate([obj_corners.reshape(-1, 3), world_centers],
                          axis=0)                                 # (5M,3)
    img = jnp.concatenate([corners.reshape(-1, 2), centers_px], axis=0)
    w = jnp.concatenate([jnp.repeat(valid.astype(jnp.float32), 4),
                         valid.astype(jnp.float32)], axis=0)
    return solve_pnp_sqpnp(obj.astype(jnp.float32),
                           img.astype(jnp.float32), K, dist, weights=w)
