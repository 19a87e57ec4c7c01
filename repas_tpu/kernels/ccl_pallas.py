"""Pallas TPU kernel for connected-component labeling.

Same algorithm as kernels/ccl.py `connected_components` (segmented
min-scans + 8-neighbor stencil rounds, SURVEY.md §2.1 N1 union-find
replacement) but executed entirely in VMEM: the XLA version's
`associative_scan` lowers to ~log2(W) full-array passes that each round
trip HBM, which made CCL the single most expensive detector stage
(4.6 ms/frame of the 13 ms 720p pipeline, measured v5e batch 16). Here
the label image stays resident in VMEM across all rounds and every
Hillis-Steele step is a shift+select at VMEM bandwidth.

Bit-identical to the XLA path by construction: the segmented-min combine
is associative, so the doubling recurrence computes the same inclusive
scan, and the stencil/sentinel handling is copied operation-for-operation.
`connected_components` in kernels/ccl.py dispatches here on TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Circular shift matching jnp.roll semantics: out[j] = x[j - shift].
    pltpu.roll requires a non-negative shift; negative shifts wrap."""
    if shift < 0:
        shift += x.shape[axis]
    return pltpu.roll(x, shift=shift, axis=axis)


def _ccl_kernel(mask_ref, out_ref, *, iters: int, connectivity: int):
    h, w = mask_ref.shape
    sent = jnp.int32(h * w)
    mask = mask_ref[:] != 0
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    labels = jnp.where(mask, row * w + col, sent)
    # break flags as int32 (1 = segment boundary = background pixel)
    brk0 = jnp.where(mask, 0, 1).astype(jnp.int32)

    def seg_scan(lab, axis, reverse):
        """Inclusive segmented min-scan along `axis` via Hillis-Steele
        doubling; identical result to lax.associative_scan with the
        (min, or) segmented combine."""
        n = w if axis == 1 else h
        pos = col if axis == 1 else row
        v, b = lab, brk0
        d = 1
        while d < n:
            if not reverse:
                vs = _roll(v, d, axis)
                bs = _roll(b, d, axis)
                oob = pos < d
            else:
                vs = _roll(v, -d, axis)
                bs = _roll(b, -d, axis)
                oob = pos >= n - d
            vs = jnp.where(oob, sent, vs)
            bs = jnp.where(oob, 0, bs)
            v = jnp.where(b != 0, v, jnp.minimum(v, vs))
            b = b | bs
            d *= 2
        return jnp.where(mask, v, sent)

    def neighbor_min(lab):
        m = lab
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            # shifted[y,x] = lab[y-dy, x-dx] with out-of-bounds = sentinel
            s = lab
            if dy:
                s = _roll(s, dy, 0)
                s = jnp.where((row < dy) if dy > 0 else (row >= h + dy),
                              sent, s)
            if dx:
                s = _roll(s, dx, 1)
                s = jnp.where((col < dx) if dx > 0 else (col >= w + dx),
                              sent, s)
            m = jnp.minimum(m, s)
        return jnp.where(mask, m, sent)

    def body(_, lab):
        lab = seg_scan(lab, 1, False)
        lab = seg_scan(lab, 1, True)
        lab = seg_scan(lab, 0, False)
        lab = seg_scan(lab, 0, True)
        return neighbor_min(lab)

    out_ref[:] = jax.lax.fori_loop(0, iters, body, labels)


# images larger than this use the band-tiled kernels (the label image and
# the kernel's live temporaries must fit VMEM; 360x640 uses ~4 MB)
MAX_VMEM_PIXELS = 512 * 1024


# ---------------------------------------------------------------------------
# band-tiled variant for images too large for one VMEM-resident block
# (the robust ladder's decimate-1 pass: 1280x720 = 3.7 MB of labels)
# ---------------------------------------------------------------------------

def _make_scan_kernel(axis: int, n_total: int):
    """Forward+backward segmented min-scan along `axis` within one band.
    Row scans see whole rows (band = rows x full width) and col scans
    whole columns (band = full height x cols), so band-local is exact."""
    def kernel(mask_ref, lab_ref, out_ref):
        h, w = mask_ref.shape
        sent = jnp.int32(n_total)
        mask = mask_ref[:] != 0
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        brk0 = jnp.where(mask, 0, 1).astype(jnp.int32)
        n = w if axis == 1 else h
        pos = col if axis == 1 else row

        def seg_scan(lab, reverse):
            v, b = lab, brk0
            d = 1
            while d < n:
                if not reverse:
                    vs = _roll(v, d, axis)
                    bs = _roll(b, d, axis)
                    oob = pos < d
                else:
                    vs = _roll(v, -d, axis)
                    bs = _roll(b, -d, axis)
                    oob = pos >= n - d
                vs = jnp.where(oob, sent, vs)
                bs = jnp.where(oob, 0, bs)
                v = jnp.where(b != 0, v, jnp.minimum(v, vs))
                b = b | bs
                d *= 2
            return jnp.where(mask, v, sent)

        lab = lab_ref[:]
        lab = seg_scan(lab, False)
        out_ref[:] = seg_scan(lab, True)
    return kernel


def _largest_divisor_leq(n: int, limit: int, mult: int) -> int:
    """Largest divisor of n that is <= limit and a multiple of `mult`
    (Mosaic block shapes need sublane % 8 == 0 / lane % 128 == 0 unless
    the block spans the whole dimension). Falls back to n itself."""
    for d in range(min(n, limit), 0, -1):
        if n % d == 0 and d % mult == 0:
            return d
    return n


@functools.partial(jax.jit, static_argnames=("iters", "connectivity",
                                             "interpret"))
def connected_components_pallas_tiled(mask: jnp.ndarray, iters: int = 5,
                                      connectivity: int = 8,
                                      interpret: bool = False
                                      ) -> jnp.ndarray:
    """CCL for images beyond single-block VMEM capacity.

    Per round: a row-band Pallas kernel does the forward+backward ROW
    segmented scans (each band holds whole rows, so band-local scans are
    exact), a column-band kernel does the COLUMN scans, and the
    8-neighbor stencil runs as plain XLA shifted-mins (bandwidth-bound,
    cheap). Operation order matches the XLA path exactly -> identical
    labels. ~6x faster than the associative_scan formulation at 720p.
    """
    h, w = mask.shape
    n = h * w
    sent = jnp.int32(n)
    mi = mask.astype(jnp.int32)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    labels = jnp.where(mask, idx, sent)

    band_px = 256 * 1024
    bh = _largest_divisor_leq(h, max(8, band_px // w), 8)
    bw = _largest_divisor_leq(w, max(128, band_px // h), 128)

    row_call = pl.pallas_call(
        _make_scan_kernel(1, n),
        grid=(h // bh,),
        in_specs=[pl.BlockSpec((bh, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((bh, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bh, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )
    col_call = pl.pallas_call(
        _make_scan_kernel(0, n),
        grid=(w // bw,),
        in_specs=[pl.BlockSpec((h, bw), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((h, bw), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, bw), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )

    big = sent

    def neighbor_min(lab):
        p = jnp.pad(lab, 1, constant_values=big)
        m = lab
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            m = jnp.minimum(m, p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w])
        return jnp.where(mask, m, sent)

    def body(_, lab):
        lab = row_call(mi, lab)
        lab = col_call(mi, lab)
        return neighbor_min(lab)

    return jax.lax.fori_loop(0, iters, body, labels)


@functools.partial(jax.jit, static_argnames=("iters", "connectivity",
                                             "interpret"))
def connected_components_pallas(mask: jnp.ndarray, iters: int = 5,
                                connectivity: int = 8,
                                interpret: bool = False) -> jnp.ndarray:
    """Label connected True-regions of `mask` (H,W bool) on TPU.

    Returns (H,W) int32: min linear pixel index per component, H*W for
    background — the exact contract of ccl.connected_components.
    """
    h, w = mask.shape
    kernel = functools.partial(_ccl_kernel, iters=iters,
                               connectivity=connectivity)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mask.astype(jnp.int32))
