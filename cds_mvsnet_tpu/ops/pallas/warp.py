"""Pallas plane-sweep warp kernel: banded-DMA bilinear gather.

Why: XLA:TPU gathers are latency-bound (~40-60M rows/s), so the plane-sweep
warp dominates inference (~19M gather rows per DTU view set). This kernel
replaces the per-row gathers with:

  1. source features pre-packed 2x2 into channels (one fetch = all four
     bilinear corners; layout ``(H, 4C, W)`` so W sits in lanes),
  2. per output tile (one depth plane x 8 ref rows x 128 ref columns), a
     dynamically-placed DMA of the small source band the tile needs, and
  3. Mosaic's within-128-lane hardware gather (``take_along_axis`` with
     idx.shape == src.shape) plus per-row masks to resolve each lane's
     (y0, x0) — the only gather form the TPU supports natively.

Exactness: output accumulates over ALL (KY x 128)-aligned source windows
intersecting the tile's base-coordinate bounding box, so arbitrary geometry
(epipole crossings, strong perspective) stays correct — distant coordinates
only cost extra window iterations. Numerics match grid_sample_pixel_packed
(zeros padding, align_corners=True pixel semantics).

Output layout is ``(C, D, H, W)`` — W-minor, so downstream elementwise /
reduction work pays no channel padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_pallas", "pack_src_for_warp"]

KY = 16  # source band rows per window
KX = 128  # source band lanes per window (= gather range)
TR = 8  # output ref rows per tile


def pack_src_for_warp(src: jnp.ndarray, channels_first: bool = False) -> jnp.ndarray:
    """source -> (H, 4C, W): 2x2-packed channels, W in lanes.

    packed[y, (k·C+c), x] = src[y + k//2, x + k%2, c] (zeros past the edge).
    Accepts (H, W, C) or — preferred, no 128-lane-padded reads — (C, H, W).
    """
    if channels_first:
        right = jnp.pad(src[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        down = jnp.pad(src[:, 1:], ((0, 0), (0, 1), (0, 0)))
        diag = jnp.pad(src[:, 1:, 1:], ((0, 0), (0, 1), (0, 1)))
        packed = jnp.concatenate([src, right, down, diag], axis=0)  # (4C, H, W)
        return jnp.transpose(packed, (1, 0, 2))  # (H, 4C, W)
    right = jnp.pad(src[:, 1:], ((0, 0), (0, 1), (0, 0)))
    down = jnp.pad(src[1:], ((0, 1), (0, 0), (0, 0)))
    diag = jnp.pad(src[1:, 1:], ((0, 1), (0, 1), (0, 0)))
    packed = jnp.concatenate([src, right, down, diag], axis=-1)  # (H, W, 4C)
    return jnp.transpose(packed, (0, 2, 1))  # (H, 4C, W)


def _warp_kernel(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, Wpad, C, ky, dtype):
    """Grid step: one (depth plane, TR ref rows, 128 ref columns) tile."""
    KY = ky
    fourC = 4 * C
    px = px_ref[0].astype(jnp.float32)  # (TR, 128)
    py = py_ref[0].astype(jnp.float32)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    # packed-base clamp (see grid_sample.sample_packed_2x2)
    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    dx = x0 - bx  # slot shifts; only -1/0/1 co-occur with valid corners
    dy = y0 - by

    def wmask(ox, oy, wgt):
        xi = x0 + ox
        yi = y0 + oy
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        return wgt * ok.astype(jnp.float32)

    w00 = wmask(0, 0, (1 - tx) * (1 - ty))
    w01 = wmask(1, 0, tx * (1 - ty))
    w10 = wmask(0, 1, (1 - tx) * ty)
    w11 = wmask(1, 1, tx * ty)

    # Window rows are ANCHORED at the tile's own ymin (the H dim of the
    # source buffer is freely sliceable), so a tile whose vertical span fits
    # KY rows needs exactly one row-band even straddling aligned boundaries.
    # Columns must stay 128-aligned (Mosaic requires lane-dim DMA slices on
    # tile boundaries), so x windows use the canonical aligned grid.
    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // KY + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx) // KX - xwin_lo + 1

    zero = jnp.zeros((C, 128), jnp.float32)
    acc0 = tuple(tuple(zero for _ in range(TR)) for _ in range(4))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        # clamp so the DMA window stays inside the (padded) source storage;
        # clamping only widens coverage downward, membership stays canonical
        ys = jnp.minimum(ymin + jy * KY, Hpad - KY)
        xs = jx * KX

        in_win = ((by - ymin) // KY == jy) & (bx // KX == jx)  # (TR,128)

        def hit(_):
            copy = pltpu.make_async_copy(
                src_hbm.at[pl.ds(ys, KY), :, pl.ds(xs, KX)], band, sem
            )
            copy.start()
            copy.wait()

            xl = jnp.clip(bx - xs, 0, KX - 1)
            yl = by - ys

            out = [list(rows) for rows in accs]
            for orow in range(TR):
                idx = jnp.broadcast_to(xl[orow].reshape(1, 128), (fourC, 128)).astype(jnp.int32)
                for r in range(KY):
                    # hardware gather needs matching bitwidths (int32 idx -> fp32)
                    g = jnp.take_along_axis(band[r].astype(jnp.float32), idx, axis=1)
                    sel = (in_win[orow] & (yl[orow] == r)).astype(jnp.float32).reshape(1, 128)
                    for k in range(4):
                        out[k][orow] = out[k][orow] + sel * g[k * C : (k + 1) * C]
            return tuple(tuple(rows) for rows in out)

        # sparse-hit tiles (incoherent depth hypotheses) sweep many windows;
        # skip the DMA + gathers entirely for windows no lane falls into
        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)
    # stack per-row accumulators back to (TR*C, 128)
    c00, c01, c10, c11 = (jnp.concatenate(rows, axis=0) for rows in accs)

    # reshape helpers: per-lane scalars broadcast over C sublanes
    def per_row(t):  # (TR, 128) -> (TR*C, 128) repeating each row C times
        return jnp.repeat(t, C, axis=0)

    pxs = per_row(dx)  # shift values
    pys = per_row(dy)

    def corner_val(ox, oy):
        use_left = (pxs + ox) == 0
        use_top = (pys + oy) == 0
        vx0 = jnp.where(use_top, c00, c10)
        vx1 = jnp.where(use_top, c01, c11)
        return jnp.where(use_left, vx0, vx1)

    out = (
        corner_val(0, 0) * per_row(w00)
        + corner_val(1, 0) * per_row(w01)
        + corner_val(0, 1) * per_row(w10)
        + corner_val(1, 1) * per_row(w11)
    )  # (TR*C, 128)
    out = out.reshape(TR, C, 128)
    out_ref[:, 0, :, :] = jnp.transpose(out, (1, 0, 2)).astype(dtype)


def warp_pallas_padded(
    src_feat: jnp.ndarray,  # (H, W, C) or (C, H, W) with channels_first
    px: jnp.ndarray,  # (D, H, W) output-grid coords (W need not be 128-aligned)
    py: jnp.ndarray,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """warp_pallas with automatic output-width padding to 128 lanes (padded
    columns get out-of-range coords -> zeros, then are cropped)."""
    D, H, W = px.shape
    Wp = ((W + 127) // 128) * 128
    if Wp != W:
        pad = ((0, 0), (0, 0), (0, Wp - W))
        px = jnp.pad(px, pad, constant_values=-1e6)
        py = jnp.pad(py, pad, constant_values=-1e6)
    out = warp_pallas(src_feat, px, py, interpret=interpret, channels_first=channels_first)
    return out[..., :W] if Wp != W else out


def warp_pallas(
    src_feat: jnp.ndarray,  # (H, W, C) or (C, H, W) with channels_first
    px: jnp.ndarray,  # (D, H, W) fp32 source-pixel x coords
    py: jnp.ndarray,  # (D, H, W)
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Bilinear plane-sweep warp -> (C, D, H_out, W_out). Requires the OUTPUT
    grid W % 128 == 0 and H % 8 == 0 (use warp_pallas_padded otherwise); the
    source may have any shape (its storage is padded for DMA alignment, but
    bounds/masks use the true dimensions)."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    ky = KY
    assert W_out % 128 == 0 and H_out % TR == 0, (H_out, W_out)
    packed = pack_src_for_warp(src_feat, channels_first=channels_first)  # (H, 4C, W)
    # pad source storage so dynamically-placed (ky x 128) DMA windows are
    # always in bounds (padding is never selected: bases clamp to true dims)
    Hp = ((H + ky - 1) // ky) * ky
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel, H=H, W=W, Hpad=Hp, Wpad=Wp, C=C, ky=ky, dtype=dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(D, H_out // TR, W_out // 128),
        in_specs=[
            pl.BlockSpec((1, TR, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # packed src stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (C, 1, TR, 128), lambda d, y, x: (0, d, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((ky, 4 * C, KX), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), packed)
