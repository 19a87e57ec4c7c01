"""FPFH features + RANSAC global registration (C15, icp_cad_model.py).

Open3D's compute_fpfh_feature + registration_ransac_based_on_feature_matching
(icp_cad_model.py:44-96) redesigned for TPU:

  * FPFH: per-point SPFH (Darboux-frame angle triplet histograms, 11 bins
    per angle = 33 dims) over k nearest neighbors, then the standard
    neighbor-weighted sum. Neighbor search via grid-hash k-NN over the
    full cloud (scales to the reference's 100k-1M point workloads).
  * Feature matching: feature-distance matmuls + argmin, chunked over
    source rows (lax.map) so memory stays bounded at any cloud size.
  * RANSAC: thousands of 3-point hypotheses evaluated as a single vmapped
    batch (Kabsch solve + edge-length/distance checkers + inlier count) —
    hypothesis evaluation is exactly the kind of embarrassing parallelism
    the vector units want. This replaces the sequential 200k-iteration
    C++ RANSAC loop with a few large batched rounds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit,
                   static_argnames=("k", "bins", "dims", "slots", "chunk"))
def fpfh_features(pts: jnp.ndarray, normals: jnp.ndarray,
                  mask: jnp.ndarray, radius: float,
                  k: int = 32, bins: int = 11,
                  dims: tuple = (48, 48, 48), slots: int = 48,
                  chunk: int = 65536) -> jnp.ndarray:
    """(N,33) FPFH descriptors (zero rows where mask is False).

    Neighborhoods come from a grid-hash k-NN over the FULL cloud (no
    global subsample — the r1 2048-point shortcut mis-scaled
    neighborhoods on reference-size clouds, icp_cad_model.py:38-42
    samples 1M points). Both the SPFH pass and the neighbor-weighted sum
    run as lax.map chunks of `chunk` points, so peak memory is
    O(chunk * k * bins) no matter the cloud size — at N=1M the unchunked
    (N,k,33) SPFH gather alone was 4.2 GB.
    """
    from repas_tpu.cloud.knn import knn_neighbors

    idx, dist = knn_neighbors(pts, mask, radius, k + 1,
                              dims=dims, slots=slots)
    nn = idx[:, 1:]                    # drop self (nearest)
    dist = dist[:, 1:]
    n = pts.shape[0]
    chunk = min(chunk, n)
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n

    def padded(a, fill):
        fills = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, fills]).reshape((n_chunks, chunk)
                                                   + a.shape[1:])

    pts_c = padded(pts, 0.0)
    nrm_c = padded(normals, 0.0)
    nn_c = padded(nn, -1)
    dist_c = padded(dist, jnp.inf)

    def spfh_chunk(args):
        p1f, n1f, nnf, df = args
        within = (df <= radius) & (nnf >= 0)
        nn_s = jnp.maximum(nnf, 0)
        p2 = pts[nn_s]                 # (C,k,3) neighbor positions
        n2 = normals[nn_s]             # (C,k,3) neighbor normals
        p1 = p1f[:, None, :]
        n1 = n1f[:, None, :]

        dvec = p2 - p1
        d = jnp.where(within, df, 1.0) + 1e-12
        d_hat = dvec / d[..., None]

        # Darboux frame (u,v,w) at the source point
        u = jnp.broadcast_to(n1, d_hat.shape)
        v = jnp.cross(d_hat, u)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
        w = jnp.cross(u, v)

        alpha = jnp.sum(v * n2, axis=-1)                   # in [-1,1]
        phi = jnp.sum(u * d_hat, axis=-1)                  # in [-1,1]
        theta = jnp.arctan2(jnp.sum(w * n2, axis=-1),
                            jnp.sum(u * n2, axis=-1))      # [-pi,pi]

        def hist(x, lo, hi):
            b = jnp.clip(((x - lo) / (hi - lo) * bins).astype(jnp.int32),
                         0, bins - 1)
            onehot = jax.nn.one_hot(b, bins, dtype=jnp.float32)
            return jnp.sum(onehot * within[..., None], axis=1)  # (C,bins)

        spfh = jnp.concatenate([hist(alpha, -1.0, 1.0),
                                hist(phi, -1.0, 1.0),
                                hist(theta, -jnp.pi, jnp.pi)],
                               axis=1)                     # (C,33)
        cnt = jnp.maximum(jnp.sum(within, axis=1), 1.0)
        return spfh / cnt[:, None], cnt, within

    spfh, cnt, within = jax.lax.map(spfh_chunk,
                                    (pts_c, nrm_c, nn_c, dist_c))
    spfh = spfh.reshape(-1, 3 * bins)[:n]                  # (N,33)
    cnt = cnt.reshape(-1)[:n]
    within = within.reshape(-1, nn.shape[1])[:n]

    # FPFH = SPFH(p) + (1/k) sum_j SPFH(j)/dist_j over the true neighbors
    def neigh_chunk(args):
        nnf, df, wf, sf, cf = args
        nn_s = jnp.maximum(nnf, 0)
        d = jnp.where(wf, df, 1.0) + 1e-12
        wgt = jnp.where(wf, 1.0 / d, 0.0)
        return sf + jnp.einsum("nk,nkf->nf", wgt,
                               spfh[nn_s]) / cf[:, None]

    fpfh = jax.lax.map(neigh_chunk,
                       (nn_c, dist_c, padded(within, False),
                        padded(spfh, 0.0), padded(cnt, 1.0)))
    fpfh = fpfh.reshape(-1, 3 * bins)[:n]
    return jnp.where(mask[:, None], fpfh, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def match_features(feat_src: jnp.ndarray, src_mask: jnp.ndarray,
                   feat_tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                   chunk: int = 1024):
    """Nearest-neighbor feature correspondence src->tgt, chunked over
    source rows so the (N,M) distance matrix never materializes whole
    (100k x 100k would be 40 GB; each chunk is chunk x M).
    Returns (idx (N,), dist (N,))."""
    n = feat_src.shape[0]
    tgt_sq = jnp.sum(feat_tgt ** 2, axis=1)
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    fs = jnp.concatenate([feat_src, jnp.zeros((pad, feat_src.shape[1]),
                                              feat_src.dtype)])

    def one_chunk(fchunk):
        d2 = (jnp.sum(fchunk ** 2, axis=1, keepdims=True)
              - 2.0 * fchunk @ feat_tgt.T + tgt_sq[None, :])
        d2 = jnp.where(tgt_mask[None, :], d2, jnp.inf)
        j = jnp.argmin(d2, axis=1)
        d = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
        return j, d

    j, d = jax.lax.map(one_chunk, fs.reshape(n_chunks, chunk, -1))
    j = j.reshape(-1)[:n]
    d = d.reshape(-1)[:n]
    return jnp.where(src_mask, j, -1), jnp.where(src_mask, d, jnp.inf)


def _kabsch(P: jnp.ndarray, Q: jnp.ndarray):
    """Rigid transform aligning P (3,3 pts) onto Q via SVD."""
    cp = P.mean(axis=0)
    cq = Q.mean(axis=0)
    H = (P - cp).T @ (Q - cq)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    return R, t


@functools.partial(jax.jit, static_argnames=("n_hypotheses", "eval_points"))
def ransac_registration(src: jnp.ndarray, src_mask: jnp.ndarray,
                        tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                        corr: jnp.ndarray,
                        dist_thresh: float,
                        edge_check: float = 0.9,
                        n_hypotheses: int = 8192,
                        eval_points: int = 2048,
                        key=None):
    """Batched 3-point RANSAC over precomputed correspondences.

    corr (N,) maps src index -> tgt index (-1 invalid). Checkers mirror
    Open3D (icp_cad_model.py:78-90): edge-length similarity >= edge_check,
    correspondence distance <= dist_thresh. Returns (T (4,4), fitness).
    """
    if key is None:
        key = jax.random.PRNGKey(3)
    n = src.shape[0]
    ok = src_mask & (corr >= 0)
    probs = ok.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    k1, k2 = jax.random.split(key)
    picks = jax.random.choice(k1, n, shape=(n_hypotheses, 3), p=probs)
    ev = jax.random.choice(k2, n, shape=(eval_points,), p=probs)
    ev_src = src[ev]
    ev_tgt = tgt[jnp.maximum(corr[ev], 0)]
    ev_ok = ok[ev]

    def hypothesis(pick):
        P = src[pick]
        Q = tgt[jnp.maximum(corr[pick], 0)]
        # edge-length checker
        eP = jnp.linalg.norm(P - jnp.roll(P, 1, axis=0), axis=1)
        eQ = jnp.linalg.norm(Q - jnp.roll(Q, 1, axis=0), axis=1)
        ratio = jnp.minimum(eP, eQ) / jnp.maximum(jnp.maximum(eP, eQ), 1e-12)
        edges_ok = jnp.all(ratio > edge_check)
        R, t = _kabsch(P, Q)
        d = jnp.linalg.norm(ev_src @ R.T + t - ev_tgt, axis=1)
        inliers = jnp.sum((d <= dist_thresh) & ev_ok)
        score = jnp.where(edges_ok, inliers, -1)
        return score, R, t

    scores, Rs, ts = jax.vmap(hypothesis)(picks)
    best = jnp.argmax(scores)
    T = jnp.eye(4).at[:3, :3].set(Rs[best]).at[:3, 3].set(ts[best])
    fitness = scores[best] / jnp.maximum(jnp.sum(ev_ok), 1)
    return T, fitness
