"""Connected-component labeling on TPU.

The AprilTag C library segments the thresholded image with union-find
(N1, SURVEY.md §2.1); union-find is irregular and hostile to XLA, so this
uses the classic data-parallel alternative: iterative min-label propagation
with pointer jumping (label doubling), giving O(log diameter) convergence
with fully regular gathers/stencils.

Labels are linear pixel indices; background pixels get label = H*W
(sentinel). Same-class 8-neighbors merge.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters", "connectivity"))
def connected_components(mask: jnp.ndarray, iters: int = 32,
                         connectivity: int = 8) -> jnp.ndarray:
    """Label connected True-regions of `mask` (H,W bool).

    Returns (H,W) int32 labels: the minimum linear pixel index of the
    component; H*W for background. `iters` propagation rounds, each
    followed by one pointer-jumping hop (converges in O(log path length)).
    """
    h, w = mask.shape
    n = h * w
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    sentinel = jnp.int32(n)
    labels = jnp.where(mask, idx, sentinel)

    big = sentinel

    def neighbor_min(lab):
        """Min label over same-class neighbors (mask-True pixels only)."""
        p = jnp.pad(lab, 1, constant_values=big)
        cands = [lab]
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            cands.append(p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w])
        m = cands[0]
        for c in cands[1:]:
            m = jnp.minimum(m, c)
        return jnp.where(mask, m, sentinel)

    def body(_, lab):
        lab = neighbor_min(lab)
        # pointer jumping: follow the label's own label
        flat = jnp.concatenate([lab.reshape(-1), jnp.array([big], jnp.int32)])
        lab2 = flat[lab.reshape(-1)].reshape(h, w)
        lab2 = jnp.where(mask, jnp.minimum(lab, lab2), sentinel)
        # second hop squeezes long chains harder
        flat2 = jnp.concatenate([lab2.reshape(-1), jnp.array([big], jnp.int32)])
        lab3 = flat2[lab2.reshape(-1)].reshape(h, w)
        return jnp.where(mask, jnp.minimum(lab2, lab3), sentinel)

    return jax.lax.fori_loop(0, iters, body, labels)


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add pixel counts into a dense (H*W+1,) area array."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    return jnp.zeros(n + 1, jnp.float32).at[flat].add(1.0)[:n]


def component_bboxes(labels: jnp.ndarray):
    """Per-label bounding boxes via scatter-min/max.

    Returns (xmin, xmax, ymin, ymax) dense arrays of size H*W."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xmin = jnp.full(n + 1, jnp.inf, jnp.float32).at[flat].min(xs)[:n]
    xmax = jnp.full(n + 1, -jnp.inf, jnp.float32).at[flat].max(xs)[:n]
    ymin = jnp.full(n + 1, jnp.inf, jnp.float32).at[flat].min(ys)[:n]
    ymax = jnp.full(n + 1, -jnp.inf, jnp.float32).at[flat].max(ys)[:n]
    return xmin, xmax, ymin, ymax


def top_k_components(labels: jnp.ndarray, k: int,
                     min_area: float = 1.0, max_area: float = jnp.inf,
                     ring_filter: bool = False):
    """Select the k largest components (optionally ring-like ones only).

    With ring_filter, components are pre-screened by quad-border
    plausibility — bbox fill ratio in [0.1, 0.95] (a tag's black border
    ring fills ~30-60% of its bbox; thin lines and solid blobs fall
    outside) and bbox aspect in [0.2, 5] — so large background blobs don't
    crowd small tag rings out of the k slots.

    Returns (root_labels (k,) int32, areas (k,) f32, valid (k,) bool).
    """
    areas = component_areas(labels)
    # only roots (label == own index) carry their component's area
    ok = (areas >= min_area) & (areas <= max_area)
    if ring_filter:
        xmin, xmax, ymin, ymax = component_bboxes(labels)
        bw = xmax - xmin + 1.0
        bh = ymax - ymin + 1.0
        bbox_area = bw * bh
        fill = areas / jnp.maximum(bbox_area, 1.0)
        aspect = bw / jnp.maximum(bh, 1.0)
        ok = ok & (fill > 0.10) & (fill < 0.95) & \
            (aspect > 0.2) & (aspect < 5.0) & \
            (bw >= 8.0) & (bh >= 8.0)
    scored = jnp.where(ok, areas, 0.0)
    top_areas, top_idx = jax.lax.top_k(scored, k)
    valid = top_areas > 0
    return top_idx.astype(jnp.int32), top_areas, valid
