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


def connected_components(mask: jnp.ndarray, iters: int = 5,
                         connectivity: int = 8,
                         jump_every: int = 0) -> jnp.ndarray:
    """Backend dispatch: the VMEM-resident Pallas kernel on TPU (bit-
    identical, ~5x faster — ccl_pallas.py), the XLA scan formulation
    elsewhere. jump_every is only honored by the XLA path (the default
    pipelines never enable it)."""
    if jump_every == 0 and jax.default_backend() == "tpu":
        if mask.shape[0] * mask.shape[1] <= MAX_VMEM_PIXELS:
            from repas_tpu.kernels.ccl_pallas import \
                connected_components_pallas
            return connected_components_pallas(mask, iters=iters,
                                               connectivity=connectivity)
        from repas_tpu.kernels.ccl_pallas import \
            connected_components_pallas_tiled
        return connected_components_pallas_tiled(mask, iters=iters,
                                                 connectivity=connectivity)
    return _connected_components_xla(mask, iters=iters,
                                     connectivity=connectivity,
                                     jump_every=jump_every)


# the Pallas path needs the whole label image + temporaries in VMEM
MAX_VMEM_PIXELS = 512 * 1024


@functools.partial(jax.jit, static_argnames=("iters", "connectivity",
                                              "jump_every"))
def _connected_components_xla(mask: jnp.ndarray, iters: int = 5,
                              connectivity: int = 8,
                              jump_every: int = 0) -> jnp.ndarray:
    """Label connected True-regions of `mask` (H,W bool).

    Returns (H,W) int32 labels: the minimum linear pixel index of the
    component; H*W for background.

    Performance shape (measured on v5e): 3x3 shifted-min stencil passes
    are ~15 us each at 360x640 while a pointer-jump is a full-image gather
    at ~5-10 ms, so propagation is stencil-only with a sparse jump every
    `jump_every` rounds to compress long chains (ring perimeters of large
    tags) logarithmically.
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
        m = lab
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            m = jnp.minimum(m, p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w])
        return jnp.where(mask, m, sentinel)

    def jump(lab):
        flat = jnp.concatenate([lab.reshape(-1),
                                jnp.array([big], jnp.int32)])
        lab2 = flat[lab.reshape(-1)].reshape(h, w)
        return jnp.where(mask, jnp.minimum(lab, lab2), sentinel)

    # segmented min-scans: labels propagate across an ENTIRE contiguous
    # run of mask-True pixels along a row/column in one associative scan,
    # so straight stretches (tag border sides, frame bars) converge in one
    # pass regardless of length; the stencil handles the turns. A quad
    # ring converges in ~4 scan+stencil rounds.
    brk = ~mask

    def seg_min_scan(lab, axis, reverse):
        def combine(a, b):
            av, ab_ = a
            bv, bb = b
            return (jnp.where(bb, bv, jnp.minimum(av, bv)), ab_ | bb)

        v, _ = jax.lax.associative_scan(combine, (lab, brk), axis=axis,
                                        reverse=reverse)
        return jnp.where(mask, v, sentinel)

    def body(i, lab):
        lab = seg_min_scan(lab, 1, False)
        lab = seg_min_scan(lab, 1, True)
        lab = seg_min_scan(lab, 0, False)
        lab = seg_min_scan(lab, 0, True)
        lab = neighbor_min(lab)
        do_jump = (jump_every > 0) & (jnp.mod(i + 1, jump_every) == 0)
        return jax.lax.cond(do_jump, jump, lambda x: x, lab)

    return jax.lax.fori_loop(0, iters, body, labels)


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add pixel counts into a dense (H*W+1,) area array."""
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    return jnp.zeros(n + 1, jnp.float32).at[flat].add(1.0)[:n]


def _component_runs(flat: jnp.ndarray, sentinel: int):
    """Exact per-component areas WITHOUT a scatter: sort the flat label
    array, count run lengths via a reverse min-scan over run-start
    positions. TPU scatter-add is ~4x the cost of sort+scan at these
    sizes (1.7 vs 0.4+0.1 ms at 230k, measured v5e).

    `sentinel` is the background label value (>= any real label).
    Returns (run_label (N,), run_area (N,) f32) — nonzero area only at
    run-start positions; background (sentinel) runs get area 0. Ties in
    a top_k over run_area break toward smaller labels, matching the
    dense-histogram formulation (positions are sorted by label)."""
    n = flat.shape[0]
    s = jnp.sort(flat)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    is_start = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    sp = jnp.where(is_start, pos, n)
    # lax.cummin, NOT lax.associative_scan(jnp.minimum): identical inclusive
    # reverse min-scan, but associative_scan's generic slice-tree lowering
    # compiles pathologically on TPU once batched (measured: 860 s at
    # (16, 230400) vs 1.9 s for the cummin primitive — this single op was
    # the whole batch-16 pipeline cold-compile blowup).
    nxt_incl = jax.lax.cummin(sp, axis=0, reverse=True)
    nxt = jnp.concatenate([nxt_incl[1:], jnp.full(1, n, jnp.int32)])
    area = jnp.where(is_start & (s < sentinel),
                     (nxt - pos).astype(jnp.float32), 0.0)
    return s, area


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
                     ring_filter: bool = False, min_side: float = 8.0,
                     return_bbox: bool = False):
    """Select the k largest components (optionally ring-like ones only).

    With ring_filter, the 2k largest area-gated components are screened by
    quad-border plausibility — bbox fill ratio in [0.1, 0.95] (a tag's
    black border ring fills ~30-60% of its bbox; thin lines and solid
    blobs fall outside) and bbox aspect in [0.2, 5] — so background blobs
    don't crowd small tag rings out of the k slots. Bboxes come from
    masked reductions over the candidate set (one (2k,N) compare) instead
    of full-image scatters — scatters cost ~5-10 ms/frame on v5e while
    masked reductions are bandwidth-bound elementwise passes.

    Returns (root_labels (k,) int32, areas (k,) f32, valid (k,) bool);
    with return_bbox (ring path only), additionally a (k,4) f32
    [xmin, ymin, xmax, ymax] stride-2-estimated bbox per slot (each edge
    within ~2 px of true for solid borders; callers must pad).
    """
    h, w = labels.shape
    if not ring_filter:
        run_label, run_area = _component_runs(labels.reshape(-1),
                                              sentinel=h * w)
        ok = (run_area >= min_area) & (run_area <= max_area)
        scored = jnp.where(ok, run_area, 0.0)
        top_areas, top_pos = jax.lax.top_k(scored, k)
        return run_label[top_pos].astype(jnp.int32), top_areas, top_areas > 0

    # ring path (the detector): everything runs on a stride-2 subsample
    # of the label image — the sort and the (2k, N) membership compare
    # were the whole stage cost (~0.9 ms/frame combined on v5e), and both
    # quarter. Areas become (count on the stride-2 grid) * 4: an unbiased
    # estimate whose noise is far inside the min/max-area and fill-ratio
    # gate margins for any decodable component (>= 8 px across). The <=1
    # px bbox-extent underestimate is folded into bw/bh (+2 instead of
    # +1), and ymin stays exact via the root fold (labels are min
    # row-major pixel indices, so the root's row IS the top row).
    lab2 = labels[::2, ::2]
    h2, w2 = lab2.shape
    run_label, run_area = _component_runs(lab2.reshape(-1), sentinel=h * w)
    run_area = run_area * 4.0
    ok = (run_area >= min_area) & (run_area <= max_area)
    scored = jnp.where(ok, run_area, 0.0)
    cand_areas, cand_pos = jax.lax.top_k(scored, 2 * k)
    cand_idx = run_label[cand_pos].astype(jnp.int32)
    m = lab2.reshape(-1)[None, :] == cand_idx[:, None]   # (2k, N/4)
    xs = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 1).reshape(-1)
    ys = 2.0 * jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 0).reshape(-1)
    big = jnp.float32(1e9)
    # the root pixel (label = min row-major index) is always a member:
    # folding it in keeps the bbox non-empty even if a thin component
    # has no pixel on the stride-2 grid
    x_root = (cand_idx % w).astype(jnp.float32)
    y_root = (cand_idx // w).astype(jnp.float32)
    xmin = jnp.minimum(jnp.min(jnp.where(m, xs[None, :], big), axis=1),
                       x_root)
    xmax = jnp.maximum(jnp.max(jnp.where(m, xs[None, :], -big), axis=1),
                       x_root)
    ymin = jnp.minimum(jnp.min(jnp.where(m, ys[None, :], big), axis=1),
                       y_root)
    ymax = jnp.maximum(jnp.max(jnp.where(m, ys[None, :], -big), axis=1),
                       y_root)
    bw = xmax - xmin + 2.0
    bh = ymax - ymin + 2.0
    fill = cand_areas / jnp.maximum(bw * bh, 1.0)
    aspect = bw / jnp.maximum(bh, 1.0)
    ring_ok = (cand_areas > 0) & (fill > 0.10) & (fill < 0.95) & \
        (aspect > 0.2) & (aspect < 5.0) & \
        (bw >= min_side) & (bh >= min_side)
    final_scores, final_slots = jax.lax.top_k(
        jnp.where(ring_ok, cand_areas, 0.0), k)
    out = (cand_idx[final_slots].astype(jnp.int32), final_scores,
           final_scores > 0)
    if return_bbox:
        bbox = jnp.stack([xmin, ymin, xmax, ymax], axis=1)[final_slots]
        out = out + (bbox,)
    return out
