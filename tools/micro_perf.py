#!/usr/bin/env python3
"""Micro-benchmarks for the r5 perf push: variants of the three hottest
non-detect costs found by tools/profile_stages.py (gray 0.383, patch
extraction 0.392, pointcloud 0.315 ms/frame at 720p batch 16 on v5e).

Run bare for TPU-via-axon. Each timing syncs via a device-side scalar
reduce pulled to host (CLAUDE.md: np.asarray of full arrays inflates
numbers through the ~20 MB/s tunnel).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/repas_jax_cache_tpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH = 16
H, W = 720, 1280
ITERS = 20


def timeit(name, fn, *args, ref=None):
    out = fn(*args)
    s = float(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    s = float(out)
    dt = (time.perf_counter() - t0) / ITERS / BATCH * 1e3
    extra = ""
    if ref is not None:
        extra = f"   maxdiff={abs(s - ref):.3f}"
    print(f"{name:34s} {dt:8.4f} ms/frame  (sum={s:.1f}){extra}", flush=True)
    return s


# ---------------------------------------------------------------- gray
LUM = np.array([0.299, 0.587, 0.114], np.float32)


def gray_naive(img):
    x = img.astype(jnp.float32)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def gray_bitcast(img):
    from repas_tpu.kernels.image import rgb_to_gray
    return rgb_to_gray(img)


_W12 = np.zeros((12, 4), np.float32)
for j in range(12):
    _W12[j, j // 3] = LUM[j % 3]


def gray_matmul(img):
    h, w = img.shape[:2]
    x = img.reshape(h, w * 3).astype(jnp.float32).reshape(h * (w // 4), 12)
    return (x @ jnp.asarray(_W12)).reshape(h, w)


def gray_matmul_bf16(img):
    h, w = img.shape[:2]
    x = img.reshape(h, w * 3).astype(jnp.bfloat16).reshape(h * (w // 4), 12)
    return (x @ jnp.asarray(_W12, jnp.bfloat16)).reshape(h, w).astype(jnp.float32)


def gray_conv(img):
    h, w = img.shape[:2]
    x = img.reshape(1, 1, h, w * 3).astype(jnp.float32)
    k = jnp.asarray(LUM).reshape(1, 1, 1, 3)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 3), padding="VALID")[0, 0]


_WREP = np.tile(LUM, W)  # (3840,) per-byte weight


def gray_weighted_pairsum(img):
    # per-byte weighted values, then log2 tree-sum of groups of 3 via
    # two strided adds on (h, w) sized arrays after a matmul-free fold:
    h, w = img.shape[:2]
    x = img.reshape(h, w * 3).astype(jnp.float32) * jnp.asarray(_WREP)
    x3 = x.reshape(h, w, 3)
    return jnp.sum(x3, axis=-1)


# ------------------------------------------------------------- patches
PH = PW = 192
NC = 48
PYR_H = 1512


def patches_xla(pyr, starts):
    return jax.vmap(lambda s: jax.lax.dynamic_slice(
        pyr, (s[1], s[0]), (PH, PW)))(starts)


def _extract_dma_batched(img, starts_blk, ph, pw, tile_h, nbuf=8):
    """img (B,Hp,Wp), starts_blk (B,C,2) int32 [x_block,y_block] in TILE
    units ((tile_h,128) tiles) -> (B,C,ph,pw). Pure-DMA Pallas kernel:
    HBM->HBM async copies, nbuf in flight. Mosaic requires provably
    tile-aligned HBM slices, so offsets are start_block * tile — the
    multiply makes divisibility syntactic."""
    B, Hp, Wp = img.shape
    C = starts_blk.shape[1]
    total = B * C

    def kernel(starts_ref, img_ref, out_ref, sems):
        def mk(i, slot):
            b = i // C
            c = i % C
            x0 = starts_ref[b, c, 0] * 128
            y0 = starts_ref[b, c, 1] * tile_h
            return pltpu.make_async_copy(
                img_ref.at[b, pl.ds(y0, ph), pl.ds(x0, pw)],
                out_ref.at[b, c],
                sems.at[slot])

        nb = min(nbuf, total)
        for i in range(nb):            # static prologue
            mk(i, i % nb).start()

        def body(i, _):
            mk(i, i % nb).wait()

            @pl.when(i + nb < total)
            def _():
                mk(i + nb, (i + nb) % nb).start()
            return 0

        jax.lax.fori_loop(0, total, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((min(nbuf, total),))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, ph, pw), img.dtype),
    )(starts_blk, img)


# ---------------------------------------------------------- pointcloud
def pc_current(depth, rgb, K):
    from repas_tpu.kernels.pointcloud import fused_pointcloud
    return fused_pointcloud(depth, rgb, K)


def pc_planar(depth, rgb, K):
    from repas_tpu.kernels.pointcloud import _fused_pointcloud_pallas
    out = _fused_pointcloud_pallas(depth, rgb, jnp.asarray(K, jnp.float32),
                                   jnp.float32(0.001))
    return out.reshape(6, -1)


def gray_u32pad(img):
    # pad the channel dim to 4 bytes then bitcast to one u32 word/pixel
    h, w = img.shape[:2]
    x4 = jnp.pad(img, ((0, 0), (0, 0), (0, 1)))
    u = jax.lax.bitcast_convert_type(x4, jnp.uint32)   # (H,W)
    r = (u & 255).astype(jnp.float32)
    g = ((u >> 8) & 255).astype(jnp.float32)
    b = ((u >> 16) & 255).astype(jnp.float32)
    return 0.299 * r + 0.587 * g + 0.114 * b


def main():
    sections = sys.argv[1:] or ["gray", "patches", "pointcloud"]
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (BATCH, H, W, 3), np.uint8))
    depths = jnp.asarray(rng.integers(300, 3000, (BATCH, H, W)).astype(np.uint16))
    K = np.array([[912.0, 0, 640.0], [0, 912.0, 360.0], [0, 0, 1]], np.float32)

    if "gray" in sections:
        print("--- gray ---")
        ref = None
        for name, fn in [("bitcast(current)", gray_bitcast),
                         ("naive f32", gray_naive),
                         ("weighted+minor3sum", gray_weighted_pairsum),
                         ("u32pad", gray_u32pad)]:
            f = jax.jit(lambda x, fn=fn: jnp.sum(jax.vmap(fn)(x)))
            s = timeit(name, f, imgs, ref=ref)
            if ref is None:
                ref = s

    if "decim" in sections:
        print("--- decimate (gray+decimate fused, like the detector) ---")
        from repas_tpu.kernels.image import rgb_to_gray

        def dec_reshape(g):
            h, w = g.shape
            return g.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

        def dec_strided(g):
            return 0.25 * (g[0::2, 0::2] + g[0::2, 1::2]
                           + g[1::2, 0::2] + g[1::2, 1::2])

        def dec_rowcol(g):
            a = g[0::2, :] + g[1::2, :]          # (h/2, w)
            return 0.25 * (a[:, 0::2] + a[:, 1::2])

        def dec_reduce_window(g):
            return jax.lax.reduce_window(
                g, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID") * 0.25

        def dec_conv(g):
            k = jnp.full((1, 1, 2, 2), 0.25, jnp.float32)
            return jax.lax.conv_general_dilated(
                g[None, None], k, (2, 2), "VALID")[0, 0]

        ref = None
        for name, fn in [("reshape-mean(current)", dec_reshape),
                         ("strided 4-add", dec_strided),
                         ("row then col", dec_rowcol),
                         ("reduce_window", dec_reduce_window),
                         ("conv 2x2 s2", dec_conv)]:
            f = jax.jit(lambda x, fn=fn: jnp.sum(jax.vmap(
                lambda im: fn(rgb_to_gray(im)))(x)))
            s = timeit(name, f, imgs, ref=ref)
            if ref is None:
                ref = s

    if "patches" in sections:
        print("--- patches ---")
        pyr = jnp.asarray(rng.standard_normal((BATCH, PYR_H, W)).astype(np.float32))
        starts = jnp.asarray(
            np.stack([rng.integers(0, W - PW, (BATCH, NC)),
                      rng.integers(0, PYR_H - PH, (BATCH, NC))], axis=-1)
            .astype(np.int32))
        f0 = jax.jit(lambda p, s: jnp.sum(jax.vmap(patches_xla)(p, s)))
        r0 = timeit("vmap dynamic_slice f32", f0, pyr, starts)
        pyr16 = pyr.astype(jnp.bfloat16)
        f1 = jax.jit(lambda p, s: jnp.sum(
            jax.vmap(patches_xla)(p, s).astype(jnp.float32)))
        timeit("vmap dynamic_slice bf16", f1, pyr16, starts, ref=r0)
        # aligned variants: starts in tile-block units, larger cover so
        # the target window is always inside
        st_b32 = jnp.concatenate([starts[..., :1] // 128,
                                  starts[..., 1:] // 8], axis=-1)
        f2 = jax.jit(lambda p, s: jnp.sum(
            _extract_dma_batched(p, s, 200, 384, 8)))
        try:
            timeit("pallas DMA f32 aligned 200x384", f2, pyr, st_b32)
        except Exception as e:
            print("pallas DMA f32 failed:", type(e).__name__, flush=True)
        st_b16 = jnp.concatenate([starts[..., :1] // 128,
                                  starts[..., 1:] // 16], axis=-1)
        f3 = jax.jit(lambda p, s: jnp.sum(
            _extract_dma_batched(p, s, 208, 384, 16).astype(jnp.float32)))
        try:
            timeit("pallas DMA bf16 aligned 208x384", f3, pyr16, st_b16)
        except Exception as e:
            print("pallas DMA bf16 failed:", type(e).__name__, flush=True)

    if "dmapatch2" in sections:
        print("--- aligned DMA + VMEM rewindow (exact patches) ---")
        ph = pw = 192
        AH, AW = 208, 384          # aligned cover: (16,128) bf16 tiles
        PHP = ((PYR_H + 15) // 16) * 16
        pyr = jnp.asarray(
            rng.standard_normal((BATCH, PHP, W)).astype(np.float32)
        ).astype(jnp.bfloat16)
        starts = jnp.asarray(
            np.stack([rng.integers(0, W - pw, (BATCH, NC)),
                      rng.integers(0, PYR_H - ph, (BATCH, NC))], axis=-1)
            .astype(np.int32))

        def _mkinfo(st):
            x0 = st[..., 0]
            y0 = st[..., 1]
            xb = jnp.minimum(x0 // 128, (W - AW) // 128)
            yb = jnp.minimum(y0 // 16, (PHP - AH) // 16)
            return jnp.stack([xb, yb, y0 - yb * 16, x0 - xb * 128], -1)

        def extract_dma(pyr_b, info):
            B, Hp, Wp = pyr_b.shape
            C = info.shape[1]

            def kernel(sref, pyr_ref, out_ref, scratch, sems):
                i = pl.program_id(0)
                nb = 2

                def dma(j, slot):
                    b = j // C
                    c = j % C
                    xb = sref[b, c, 0]
                    yb = sref[b, c, 1]
                    return pltpu.make_async_copy(
                        pyr_ref.at[b, pl.ds(yb * 16, AH),
                                   pl.ds(xb * 128, AW)],
                        scratch.at[slot], sems.at[slot])

                @pl.when(i == 0)
                def _():
                    dma(0, 0).start()

                @pl.when(i + 1 < B * C)
                def _():
                    dma(i + 1, (i + 1) % nb).start()

                dma(i, i % nb).wait()
                b = i // C
                c = i % C
                ry = sref[b, c, 2]
                rx = sref[b, c, 3]
                rows = scratch[i % nb][pl.ds(ry, ph), :]      # (ph, AW)
                shifted = pltpu.roll(rows, AW - rx, axis=1)
                out_ref[0, 0] = shifted[:, :pw]

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B * C,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (1, 1, ph, pw), lambda i, s: (i // C, i % C, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((2, AH, AW), pyr_b.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, C, ph, pw), pyr_b.dtype),
            )(info, pyr_b)

        info = _mkinfo(starts)
        fx = jax.jit(lambda p, s: jax.vmap(
            lambda pp, ss: jax.vmap(lambda s1: jax.lax.dynamic_slice(
                pp, (s1[1], s1[0]), (ph, pw)))(ss))(p, s))
        ref_out = np.asarray(fx(pyr, starts).astype(jnp.float32))
        fd = jax.jit(lambda p, i: extract_dma(p, i))
        try:
            got = np.asarray(fd(pyr, info).astype(jnp.float32))
            print("match:", np.array_equal(ref_out, got), flush=True)
            f1 = jax.jit(lambda p, s: jnp.sum(fx(p, s).astype(jnp.float32)))
            timeit("xla dynamic_slice bf16", f1, pyr, starts)
            f2 = jax.jit(lambda p, i: jnp.sum(
                extract_dma(p, i).astype(jnp.float32)))
            timeit("pallas aligned DMA+rewindow", f2, pyr, info)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print("dma2 failed:", type(e).__name__, flush=True)

    if "fusion" in sections:
        print("--- fusion ---")
        from repas_tpu.pose.fusion import fuse_tag_poses
        from repas_tpu.pose.pnp import solve_pnp_ippe_square
        from repas_tpu.pose.depth_correct import depth_corrected_translation
        from repas_tpu.core.transforms import average_rotations_quat

        D = 8
        Kj = jnp.asarray(K)
        half = 0.0303 / 2
        obj = np.array([[-half, -half], [half, -half],
                        [half, half], [-half, half]], np.float32)
        corners = []
        rng2 = np.random.default_rng(3)
        for b in range(BATCH):
            cs = []
            for d in range(D):
                c0 = rng2.uniform(200, 1000), rng2.uniform(150, 550)
                sz = rng2.uniform(30, 120)
                cs.append(obj / half * sz / 2 + np.asarray(c0))
            corners.append(cs)
        corners = jnp.asarray(np.asarray(corners, np.float32))  # (B,D,4,2)
        ids = jnp.tile(jnp.arange(D, dtype=jnp.int32), (BATCH, 1))
        areas = jnp.full((BATCH, D), 900.0)
        valid = jnp.ones((BATCH, D), bool)
        depth_m = depths.astype(jnp.float32) * 0.001
        dist = jnp.zeros(8, jnp.float32)

        fsolve = jax.jit(lambda c: jnp.sum(jax.vmap(jax.vmap(
            lambda cc: solve_pnp_ippe_square(cc, Kj, dist, 0.0303)[1]
        ))(c)))
        timeit("pnp ippe x8", fsolve, corners)
        ts = jnp.tile(jnp.asarray([0.1, 0.1, 1.0]), (BATCH, D, 1))
        fdc = jax.jit(lambda t, dm: jnp.sum(jax.vmap(lambda tb, db: jax.vmap(
            lambda tt: depth_corrected_translation(tt, db, Kj, win=5)[0]
        )(tb))(t, dm)[0]))
        timeit("depth_correct x8", fdc, ts, depth_m)
        Rs = jnp.tile(jnp.eye(3), (BATCH, D, 1, 1))
        ws = jnp.ones((BATCH, D))
        fq = jax.jit(lambda R, w: jnp.sum(jax.vmap(
            lambda r, ww: average_rotations_quat(r, ww, mask=ww > 0)
        )(R, w)))
        timeit("quat average", fq, Rs, ws)
        ffull = jax.jit(lambda c, i, a, v, dm: jnp.sum(jax.vmap(
            lambda cc, ii, aa, vv, dd: fuse_tag_poses(
                cc, ii, aa, vv, dd, Kj, dist, 0.0303).anchor_P_depth
        )(c, i, a, v, dm)))
        timeit("fuse_tag_poses full", ffull, corners, ids, areas, valid,
               depth_m)

    if "pnpiters" in sections:
        print("--- pnp refine_iters scaling ---")
        from repas_tpu.pose.pnp import solve_pnp_ippe_square
        Kj = jnp.asarray(K)
        rng3 = np.random.default_rng(5)
        corners = jnp.asarray(
            rng3.uniform(100, 600, (BATCH, 8, 4, 2)).astype(np.float32))
        for it in (8, 4, 2, 0):
            f = jax.jit(lambda c, it=it: jnp.sum(jax.vmap(jax.vmap(
                lambda cc: solve_pnp_ippe_square(
                    cc, Kj, None, 0.0303, refine_iters=it)[1]))(c)))
            timeit(f"ippe dist=None iters={it}", f, corners)
        f = jax.jit(lambda c: jnp.sum(jax.vmap(jax.vmap(
            lambda cc: solve_pnp_ippe_square(
                cc, Kj, jnp.zeros(8), 0.0303, refine_iters=8)[1]))(c)))
        timeit("ippe dist=zeros iters=8", f, corners)

    if "pointcloud" in sections:
        print("--- pointcloud ---")
        fp0 = jax.jit(lambda d, r: jnp.sum(jax.vmap(
            lambda dd, rr: jnp.sum(pc_current(dd, rr, K)))(d, r)))
        rp = timeit("current (H*W,6)", fp0, depths, imgs)
        fp1 = jax.jit(lambda d, r: jnp.sum(jax.vmap(
            lambda dd, rr: jnp.sum(pc_planar(dd, rr, K)))(d, r)))
        timeit("planar (6,H*W)", fp1, depths, imgs, ref=rp)


if __name__ == "__main__":
    main()
