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

__all__ = ["warp_pallas_v3", "warp_pallas_v6", "warp_pallas_v6s", "warp_pallas_v6sd",
           "warp_pallas_v6sdc", "warp_pallas_v7m", "warp_pallas_v8",
           "warp_pallas_padded", "pack_src_for_warp", "pack_src_words"]
# Superseded generations (v1/v2/v4/v5/v7) live in warp_archive.py with their
# measured epitaphs; warp_pallas_padded dispatches to them lazily.

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


def _warp_kernel_v3(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, C, ky, tr, dtype,
                    gather16=False):
    """v3 grid step: v1's tile-anchored window DMA, but each output row is
    resolved with ONE batched lane-gather of the flattened (ky·4C, 128) band
    + a ky-row mask-reduce (vs v1's ky separate masked gathers per row), and
    corners are combined per row so only one (4C, 128) accumulator is live."""
    fourC = 4 * C
    px = px_ref[0].astype(jnp.float32)  # (TR, 128)
    py = py_ref[0].astype(jnp.float32)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    dx = x0 - bx
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

    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx) // KX - xwin_lo + 1

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky, 128), 0)
    zero = jnp.zeros((fourC, 128), jnp.float32)
    acc0 = tuple(zero for _ in range(tr))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - ky)
        xs = jx * KX
        in_win = ((by - ymin) // ky == jy) & (bx // KX == jx)  # (TR,128)

        def hit(_):
            copy = pltpu.make_async_copy(
                src_hbm.at[pl.ds(ys, ky), :, pl.ds(xs, KX)], band, sem
            )
            copy.start()
            copy.wait()
            # gather16: run the crossbar in 16-bit (bf16 values, int16 idx):
            # half the gather volume. Exact — the masked sum selects exactly
            # one gathered value per lane, so no low-precision accumulation.
            if gather16:
                flat = band[...].reshape(ky * fourC, KX)
                idt = jnp.int16
            else:
                flat = band[...].reshape(ky * fourC, KX).astype(jnp.float32)
                idt = jnp.int32
            yl = by - ys  # (TR, 128)
            out = list(accs)
            for orow in range(tr):
                xl = jnp.clip(bx[orow] - xs, 0, KX - 1).reshape(1, 128).astype(idt)
                idx = jnp.broadcast_to(xl, (ky * fourC, 128))
                g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky, fourC, KX)
                sel = (in_win[orow].reshape(1, 128) & (yl[orow].reshape(1, 128) == riota))
                g32 = jnp.where(sel[:, None, :], g, 0).astype(jnp.float32)
                out[orow] = out[orow] + jnp.sum(g32, axis=0)
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)

    for orow in range(tr):
        acc = accs[orow]
        c00, c01, c10, c11 = (acc[k * C : (k + 1) * C] for k in range(4))
        pxs = jnp.broadcast_to(dx[orow].reshape(1, 128), (C, 128))
        pys = jnp.broadcast_to(dy[orow].reshape(1, 128), (C, 128))

        def corner_val(ox, oy):
            use_left = (pxs + ox) == 0
            use_top = (pys + oy) == 0
            vx0 = jnp.where(use_top, c00, c10)
            vx1 = jnp.where(use_top, c01, c11)
            return jnp.where(use_left, vx0, vx1)

        def bc(wrow):
            return jnp.broadcast_to(wrow[orow].reshape(1, 128), (C, 128))

        out = (
            corner_val(0, 0) * bc(w00)
            + corner_val(1, 0) * bc(w01)
            + corner_val(0, 1) * bc(w10)
            + corner_val(1, 1) * bc(w11)
        )
        out_ref[:, 0, orow, :] = out.astype(dtype)


def pack_src_words(src: jnp.ndarray, channels_first: bool = False) -> jnp.ndarray:
    """source -> (H, C, W) int32 with lane x holding the bf16 bit-pair
    (src[y, x], src[y, x+1]): word = (bits(v0) << 16) | bits(v1).

    A bf16 value's fp32 bits are exactly its own bits shifted left 16, so the
    kernel unpacks corners with two bitcasts and zero conversions. Halves
    both DMA volume and crossbar gather rows vs the 2x2 fp32 packing.
    """
    if not channels_first:
        src = jnp.moveaxis(src, -1, 0)  # (C, H, W)
    src = src.astype(jnp.bfloat16)
    bits = jax.lax.bitcast_convert_type(src, jnp.uint16).astype(jnp.uint32)
    right = jnp.pad(bits[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    word = (bits << 16) | right  # (C, H, W)
    return jnp.transpose(word, (1, 0, 2)).astype(jnp.int32)  # (H, C, W)


def _warp_kernel_v6(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, C,
                    ky, tr, dtype):
    """v6 grid step: x-pair bit-packed band (int32 words of two bf16 values),
    y-bilinear folded into the window mask-reduce as fp32 weights. Gather
    rows per output row = (ky+1)·C — ~3.6x less than v3's ky·4C — and the
    band DMA moves half the bytes. Numerics: bf16 corners lifted to fp32 by
    exact bitcast; the lerp is staged (y then x) in fp32, matching the packed
    sampler within ~1 ulp (vs its flat 4-term weighted sum)."""
    fourC = 4 * C  # noqa: F841 (kept for parity with sibling kernels' docs)
    px = px_ref[0].astype(jnp.float32)  # (TR, 128)
    py = py_ref[0].astype(jnp.float32)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    dx = x0 - bx

    # x-corner validity (y-validity folds into the row weights below)
    vx0 = ((x0 >= 0) & (x0 < W)).astype(jnp.float32) * (1 - tx)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32) * tx
    wy0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32) * (1 - ty)
    wy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32) * ty

    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx) // KX - xwin_lo + 1

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    zero = jnp.zeros((C, 128), jnp.float32)
    acc0 = tuple((zero, zero) for _ in range(tr))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        xs = jx * KX
        in_win = ((by - ymin) // ky == jy) & (bx // KX == jx)  # (TR,128)

        def hit(_):
            copy = pltpu.make_async_copy(
                src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
            )
            copy.start()
            copy.wait()
            flat = band[...].reshape((ky + 1) * C, KX)  # int32 words
            out = list(accs)
            for orow in range(tr):
                iw = in_win[orow].reshape(1, 128)
                xl = jnp.clip(bx[orow] - xs, 0, KX - 1).reshape(1, 128)
                idx = jnp.broadcast_to(xl, ((ky + 1) * C, 128)).astype(jnp.int32)
                g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky + 1, C, KX)
                # exact bf16 -> fp32 by bit placement: v0 = high half, v1 = low
                g0 = jax.lax.bitcast_convert_type(
                    g & jnp.int32(-65536), jnp.float32
                )
                g1 = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
                yl0 = (y0[orow] - ys).reshape(1, 128)
                w_r = (
                    jnp.where(yl0 == riota, wy0[orow].reshape(1, 128), 0.0)
                    + jnp.where(yl0 + 1 == riota, wy1[orow].reshape(1, 128), 0.0)
                ) * iw.astype(jnp.float32)  # (ky+1, 128)
                a0, a1 = out[orow]
                out[orow] = (
                    a0 + jnp.sum(g0 * w_r[:, None, :], axis=0),
                    a1 + jnp.sum(g1 * w_r[:, None, :], axis=0),
                )
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)

    for orow in range(tr):
        a0, a1 = accs[orow]  # y-lerped slot values (C, 128)
        s = jnp.broadcast_to(dx[orow].reshape(1, 128), (C, 128))
        # corner x0 sits in slot dx+0, corner x0+1 in slot dx+1; invalid
        # slots (-1 / 2) only co-occur with zero x-weights
        cx0 = jnp.where(s == 0, a0, a1)
        cx1 = jnp.where(s + 1 == 0, a0, a1)
        out = cx0 * jnp.broadcast_to(vx0[orow].reshape(1, 128), (C, 128)) + \
            cx1 * jnp.broadcast_to(vx1[orow].reshape(1, 128), (C, 128))
        out_ref[:, 0, orow, :] = out.astype(dtype)


def _warp_kernel_v6s(px_ref, py_ref, ref_ref, src_hbm, out_ref, sim_ref, band, sem,
                     *, H, W, Hpad, C, ky, tr, dtype, tag_ref=None, view=None):
    """v6s grid step: v6's gather + two fused outputs — ``in_prod = ref ⊙
    warped`` (bf16, the value the cost-volume accumulates) and ``sim = Σ_C
    fp32(warped)·fp32(ref)`` (the similarity the entropy/vis chain consumes).
    Saves the separate full-volume sim pass and the ref multiply outside;
    numerics identical to computing them from the v6 output.

    ``tag_ref`` (SMEM, 3 int32: view/ys/xs of the band already in VMEM)
    enables the cross-step DMA cache: when the requested window equals the
    cached one the copy is skipped. Pays off with the depth dim INNERMOST in
    the grid — consecutive hypotheses shift source coords sub-pixel, so the
    same aligned window serves long d-runs of a fixed output tile."""
    fourC = 4 * C  # noqa: F841
    px = px_ref[0].astype(jnp.float32)
    py = py_ref[0].astype(jnp.float32)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    dx = x0 - bx

    vx0 = ((x0 >= 0) & (x0 < W)).astype(jnp.float32) * (1 - tx)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32) * tx
    wy0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32) * (1 - ty)
    wy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32) * ty

    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx) // KX - xwin_lo + 1

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    zero = jnp.zeros((C, 128), jnp.int32)
    acc0 = tuple((zero, zero) for _ in range(tr))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        xs = jx * KX
        in_win = ((by - ymin) // ky == jy) & (bx // KX == jx)

        def hit(_):
            if tag_ref is None:
                copy = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                )
                copy.start()
                copy.wait()
            else:
                cached = (
                    (tag_ref[0] == view) & (tag_ref[1] == ys) & (tag_ref[2] == xs)
                )

                @pl.when(jnp.logical_not(cached))
                def _():
                    copy = pltpu.make_async_copy(
                        src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                    )
                    copy.start()
                    copy.wait()
                    tag_ref[0] = view
                    tag_ref[1] = ys
                    tag_ref[2] = xs

            flat = band[...].reshape((ky + 1) * C, KX)
            out = list(accs)
            for orow in range(tr):
                iw = in_win[orow].reshape(1, 128)
                xl = jnp.clip(bx[orow] - xs, 0, KX - 1).reshape(1, 128)
                idx = jnp.broadcast_to(xl, ((ky + 1) * C, 128)).astype(jnp.int32)
                g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky + 1, C, KX)
                # int-domain one-hot select: exactly one band row matches a
                # lane's y0 (resp. y0+1) across all windows, so a masked int32
                # sum IS the packed word at that row — the y-lerp moves to the
                # epilogue, saving the per-window fp unpack+multiply volume
                yl0 = (y0[orow] - ys).reshape(1, 128)
                sel0 = iw & (yl0 == riota)
                sel1 = iw & (yl0 + 1 == riota)
                a0, a1 = out[orow]
                out[orow] = (
                    a0 + jnp.sum(jnp.where(sel0[:, None, :], g, 0), axis=0),
                    a1 + jnp.sum(jnp.where(sel1[:, None, :], g, 0), axis=0),
                )
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)

    for orow in range(tr):
        a0, a1 = accs[orow]  # packed x-pair words at rows y0 / y0+1
        b00 = jax.lax.bitcast_convert_type(a0 & jnp.int32(-65536), jnp.float32)
        b01 = jax.lax.bitcast_convert_type(a0 << 16, jnp.float32)
        b10 = jax.lax.bitcast_convert_type(a1 & jnp.int32(-65536), jnp.float32)
        b11 = jax.lax.bitcast_convert_type(a1 << 16, jnp.float32)
        w0 = jnp.broadcast_to(wy0[orow].reshape(1, 128), (C, 128))
        w1 = jnp.broadcast_to(wy1[orow].reshape(1, 128), (C, 128))
        p0 = b00 * w0 + b10 * w1  # y-lerped left slot
        p1 = b01 * w0 + b11 * w1  # y-lerped right slot
        s = jnp.broadcast_to(dx[orow].reshape(1, 128), (C, 128))
        cx0 = jnp.where(s == 0, p0, p1)
        cx1 = jnp.where(s + 1 == 0, p0, p1)
        warped = cx0 * jnp.broadcast_to(vx0[orow].reshape(1, 128), (C, 128)) + \
            cx1 * jnp.broadcast_to(vx1[orow].reshape(1, 128), (C, 128))
        warped_bf = warped.astype(dtype)
        ref_row = ref_ref[:, orow, :]  # (C, 128) bf16
        out_ref[:, 0, orow, :] = ref_row * warped_bf  # bf16 product (in_prod)
        # unrolled C-reduction: Mosaic rejects vector.multi_reduction over a
        # sublane dim with non-zero layout offsets ("shape_invariant_numerics"
        # constraint); C slice-adds lower cleanly
        prod = warped_bf.astype(jnp.float32) * ref_row.astype(jnp.float32)
        acc_sim = prod[0:1]
        for c in range(1, C):
            acc_sim = acc_sim + prod[c : c + 1]
        sim_ref[0, orow, :] = acc_sim[0]


def _warp_kernel_v6s_batched(px_ref, py_ref, ref_ref, src_hbm, out_ref, sim_ref,
                             band, sem, tag_ref=None, *, H, W, Hpad, C, ky, tr, dtype):
    """Multi-view v6s grid step: identical math, with the source VIEW as the
    outermost grid dim — all V−1 plane sweeps of a stage run in ONE kernel
    launch (one pipeline fill/drain instead of V−1; the reference loops views
    in Python, model.py:44-61). Blocks carry a leading view dim of 1; the
    packed-source stack is sliced per step at the view's index. With
    ``tag_ref`` the grid is (V, H/tr, W/128, D) — depth innermost — and the
    band DMA is skipped whenever the requested window is already in VMEM."""
    v = pl.program_id(0)
    if tag_ref is not None:
        first = (
            (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
            & (pl.program_id(2) == 0) & (pl.program_id(3) == 0)
        )

        @pl.when(first)
        def _():
            tag_ref[0] = -1
            tag_ref[1] = -1
            tag_ref[2] = -1

    _warp_kernel_v6s(
        px_ref.at[0], py_ref.at[0], ref_ref.at[0], src_hbm.at[v],
        out_ref.at[0], sim_ref.at[0], band, sem,
        H=H, W=W, Hpad=Hpad, C=C, ky=ky, tr=tr, dtype=dtype,
        tag_ref=tag_ref, view=v,
    )


def warp_pallas_v6s_batched(
    src_feats: jnp.ndarray,  # (V, C, H, W) channels-first source views
    ref_feats: jnp.ndarray,  # (V, C, H_out, W_out) per-pair reference features
    px: jnp.ndarray,  # (V, D, H_out, W_out)
    py: jnp.ndarray,
    ky: int = 8,
    tr: int = TR,
    interpret: bool = False,
    dma_cache: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All-views fused warp + cost: returns (in_prod ``(V, C, D, H_out,
    W_out)``, sim ``(V, D, H_out, W_out)`` fp32). Per-view numerics identical
    to :func:`warp_pallas_v6s`.

    ``dma_cache`` orders the grid depth-innermost and skips the band DMA when
    a step's window matches the one already in VMEM (plane-sweep coords drift
    sub-pixel between adjacent hypotheses, so a fixed output tile's d-run
    mostly reuses one aligned window). Exact for any geometry either way."""
    V, C, H, W = src_feats.shape
    _, D, H_out, W_out = px.shape
    assert ref_feats.shape == (V, C, H_out, W_out), ref_feats.shape
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    packed = jax.vmap(lambda s: pack_src_words(s, channels_first=True))(src_feats)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, 0), (0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feats.dtype

    kernel = functools.partial(
        _warp_kernel_v6s_batched, H=H, W=W, Hpad=Hp, C=C, ky=ky, tr=tr, dtype=dtype
    )
    if dma_cache:
        grid = (V, H_out // tr, W_out // 128, D)
        idx_plane = lambda v, y, x, d: (v, d, y, x)
        idx_ref = lambda v, y, x, d: (v, 0, y, x)
        idx_out = lambda v, y, x, d: (v, 0, d, y, x)
    else:
        grid = (V, D, H_out // tr, W_out // 128)
        idx_plane = lambda v, d, y, x: (v, d, y, x)
        idx_ref = lambda v, d, y, x: (v, 0, y, x)
        idx_out = lambda v, d, y, x: (v, 0, d, y, x)
    scratch = [
        pltpu.VMEM((ky + 1, C, KX), jnp.int32),
        pltpu.SemaphoreType.DMA,
    ]
    if dma_cache:
        scratch.append(pltpu.SMEM((3,), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, tr, 128), idx_ref, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, C, 1, tr, 128), idx_out, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, C, D, H_out, W_out), dtype),
            jax.ShapeDtypeStruct((V, D, H_out, W_out), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), ref_feats, packed)


def _warp_kernel_v6sd(px_ref, py_ref, ref_ref, src_hbm, out_ref, sim_ref,
                      band, sem, tag_ref, *, H, W, Hpad, C, ky, kd, tr, dtype):
    """Depth-blocked v6s grid step: ``kd`` adjacent depth planes per tile.

    Adjacent plane-sweep hypotheses shift source coords sub-pixel, so one
    (ky+1, C, 128) band window covers a whole kd-run of a fixed output tile:
    per-tile fixed costs (grid step, block transfers, window DMA issue,
    in-window bookkeeping) amortize over kd planes while the gather volume —
    which scales with OUTPUT rows, not tiles — stays unchanged. Taller
    spatial tiles (tr=16/24) failed because the band must grow with the
    tile's source-row span; depth tiles keep the span fixed. Same exactness
    contract and bf16 numerics as v6s."""
    first = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        tag_ref[0] = -1
        tag_ref[1] = -1
        tag_ref[2] = -1

    px = px_ref[...].astype(jnp.float32)  # (kd, tr, 128)
    py = py_ref[...].astype(jnp.float32)
    _v6sd_core(px, py, ref_ref, src_hbm, out_ref, sim_ref, band, sem, tag_ref,
               H=H, W=W, Hpad=Hpad, C=C, ky=ky, kd=kd, tr=tr, dtype=dtype)


def _warp_kernel_v6sdc(rt_ref, dep_ref, ref_ref, src_hbm, out_ref, sim_ref,
                       band, sem, tag_ref, *, H, W, Hpad, C, ky, kd, tr, dtype,
                       w_valid, gate="none"):
    """v6sd grid step with the projective coordinate math folded into the
    prologue: instead of streaming precomputed (px, py) planes from HBM, the
    tile reads its (kd, tr, 128) DEPTH block and 12 SMEM scalars (the
    ref→src homography basis rot/trans of ops/geometry.py:130-152) and
    evaluates px = (L0·d + t0)/(L2·d + t2 + 1e-6) on the VPU — same formula
    as plane_sweep_coords (geometry.py:155-176), fp32. Removes the XLA
    coords pass and one full (D, h, w) ×2 HBM round trip per view. Output
    lanes past ``w_valid`` (128-lane padding) get the -1e6 sentinel exactly
    like warp's padded-px convention."""
    first = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        tag_ref[0] = -1
        tag_ref[1] = -1
        tag_ref[2] = -1

    yt = pl.program_id(0)
    xt = pl.program_id(1)
    # Mosaic's tpu.iota is integer-only; cast after (fp32 iota fails verify)
    ii = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1).astype(jnp.float32)
    X = xt.astype(jnp.float32) * 128.0 + jj  # ref-pixel coords of the tile
    Y = yt.astype(jnp.float32) * float(tr) + ii
    L0 = rt_ref[0] * X + rt_ref[1] * Y + rt_ref[2]
    L1 = rt_ref[3] * X + rt_ref[4] * Y + rt_ref[5]
    L2 = rt_ref[6] * X + rt_ref[7] * Y + rt_ref[8]
    dep = dep_ref[...].astype(jnp.float32)  # (kd, tr, 128)
    z = L2[None] * dep + rt_ref[11] + 1e-6
    px = (L0[None] * dep + rt_ref[9]) / z
    py = (L1[None] * dep + rt_ref[10]) / z
    pad = jnp.broadcast_to((X >= float(w_valid))[None], px.shape)
    px = jnp.where(pad, -1e6, px)
    py = jnp.where(pad, -1e6, py)
    _v6sd_core(px, py, ref_ref, src_hbm, out_ref, sim_ref, band, sem, tag_ref,
               H=H, W=W, Hpad=Hpad, C=C, ky=ky, kd=kd, tr=tr, dtype=dtype,
               gate=gate)


def _v6sd_core(px, py, ref_ref, src_hbm, out_ref, sim_ref, band, sem, tag_ref,
               *, H, W, Hpad, C, ky, kd, tr, dtype, gate="none"):
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)
    dx = x0 - bx

    vx0 = ((x0 >= 0) & (x0 < W)).astype(jnp.float32) * (1 - tx)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32) * tx
    wy0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32) * (1 - ty)
    wy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32) * ty

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    zero = jnp.zeros((C, 128), jnp.int32)

    if gate == "odloop":
        # Per-depth-plane window sweeps: each od sub-block loops over ITS
        # OWN window range instead of every row visiting the union of all
        # kd planes' windows. No per-row scalar branches (those measured
        # +277 ms/map as gate="row"); the work reduction comes from tighter
        # data-dependent loop bounds, and the cross-loop DMA tag cache
        # dedups band fetches when adjacent planes share windows.
        accs = []
        for od in range(kd):
            ymin = jnp.min(by[od])
            n_y = (jnp.max(by[od]) - ymin) // ky + 1
            xwin_lo = jnp.min(bx[od]) // KX
            n_x = jnp.max(bx[od]) // KX - xwin_lo + 1
            acc0_od = tuple((zero, zero) for _ in range(tr))

            def body(widx, a, od=od, ymin=ymin, n_x=n_x, xwin_lo=xwin_lo):
                jy = widx // n_x
                jx = xwin_lo + widx % n_x
                ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
                xs = jx * KX
                in_win = ((by[od] - ymin) // ky == jy) & (bx[od] // KX == jx)

                def hit(_):
                    cached = (
                        (tag_ref[0] == 0) & (tag_ref[1] == ys) & (tag_ref[2] == xs)
                    )

                    @pl.when(jnp.logical_not(cached))
                    def _():
                        copy = pltpu.make_async_copy(
                            src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                        )
                        copy.start()
                        copy.wait()
                        tag_ref[0] = 0
                        tag_ref[1] = ys
                        tag_ref[2] = xs

                    flat = band[...].reshape((ky + 1) * C, KX)
                    out = list(a)
                    for orow in range(tr):
                        iw = in_win[orow].reshape(1, 128)
                        xl = jnp.clip(bx[od, orow] - xs, 0, KX - 1).reshape(1, 128)
                        idx = jnp.broadcast_to(
                            xl, ((ky + 1) * C, 128)
                        ).astype(jnp.int32)
                        g = jnp.take_along_axis(flat, idx, axis=1).reshape(
                            ky + 1, C, KX
                        )
                        yl0 = (y0[od, orow] - ys).reshape(1, 128)
                        sel0 = iw & (yl0 == riota)
                        sel1 = iw & (yl0 + 1 == riota)
                        a0, a1 = out[orow]
                        out[orow] = (
                            a0 + jnp.sum(jnp.where(sel0[:, None, :], g, 0), axis=0),
                            a1 + jnp.sum(jnp.where(sel1[:, None, :], g, 0), axis=0),
                        )
                    return tuple(out)

                return jax.lax.cond(jnp.any(in_win), hit, lambda _: a, None)

            accs.extend(jax.lax.fori_loop(0, n_y * n_x, body, acc0_od))
        accs = tuple(accs)
    else:
        accs = _v6sd_sweep_union(
            bx, by, y0, src_hbm, band, sem, tag_ref, riota, zero,
            Hpad=Hpad, C=C, ky=ky, kd=kd, tr=tr, gate=gate,
        )

    for od in range(kd):
        for orow in range(tr):
            a0, a1 = accs[od * tr + orow]
            _emit_v6sd_row(
                a0, a1, od, orow, wy0, wy1, dx, vx0, vx1, ref_ref, out_ref,
                sim_ref, C=C, dtype=dtype,
            )
    return


def _v6sd_sweep_union(bx, by, y0, src_hbm, band, sem, tag_ref, riota,
                      zero, *, Hpad, C, ky, kd, tr, gate):
    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx) // KX - xwin_lo + 1
    acc0 = tuple((zero, zero) for _ in range(kd * tr))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        xs = jx * KX
        in_win = ((by - ymin) // ky == jy) & (bx // KX == jx)  # (kd, tr, 128)

        def hit(_):
            cached = (tag_ref[0] == 0) & (tag_ref[1] == ys) & (tag_ref[2] == xs)

            @pl.when(jnp.logical_not(cached))
            def _():
                copy = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                )
                copy.start()
                copy.wait()
                tag_ref[0] = 0
                tag_ref[1] = ys
                tag_ref[2] = xs

            flat = band[...].reshape((ky + 1) * C, KX)
            out = list(accs)
            for od in range(kd):
                for orow in range(tr):
                    def gather_add(pair, od=od, orow=orow):
                        iw = in_win[od, orow].reshape(1, 128)
                        xl = jnp.clip(bx[od, orow] - xs, 0, KX - 1).reshape(1, 128)
                        idx = jnp.broadcast_to(xl, ((ky + 1) * C, 128)).astype(jnp.int32)
                        g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky + 1, C, KX)
                        yl0 = (y0[od, orow] - ys).reshape(1, 128)
                        sel0 = iw & (yl0 == riota)
                        sel1 = iw & (yl0 + 1 == riota)
                        a0, a1 = pair
                        return (
                            a0 + jnp.sum(jnp.where(sel0[:, None, :], g, 0), axis=0),
                            a1 + jnp.sum(jnp.where(sel1[:, None, :], g, 0), axis=0),
                        )

                    i = od * tr + orow
                    if gate == "row":
                        # Skip the crossbar gather for rows with no lane in
                        # this window (bit-exact: their sel masks are all
                        # false, so the masked adds were zeros anyway).
                        out[i] = jax.lax.cond(
                            jnp.any(in_win[od, orow]), gather_add, lambda p: p, out[i]
                        )
                    else:
                        out[i] = gather_add(out[i])
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    return jax.lax.fori_loop(0, n_y * n_x, body, acc0)


def _emit_v6sd_row(a0, a1, od, orow, wy0, wy1, dx, vx0, vx1, ref_ref, out_ref,
                   sim_ref, *, C, dtype):
    """Unpack one output row's int accumulators (y-banded bf16 x-pairs) into
    the bilinear result and emit in_prod = ref⊙warped plus sim = Σ_C."""
    b00 = jax.lax.bitcast_convert_type(a0 & jnp.int32(-65536), jnp.float32)
    b01 = jax.lax.bitcast_convert_type(a0 << 16, jnp.float32)
    b10 = jax.lax.bitcast_convert_type(a1 & jnp.int32(-65536), jnp.float32)
    b11 = jax.lax.bitcast_convert_type(a1 << 16, jnp.float32)
    w0 = jnp.broadcast_to(wy0[od, orow].reshape(1, 128), (C, 128))
    w1 = jnp.broadcast_to(wy1[od, orow].reshape(1, 128), (C, 128))
    p0 = b00 * w0 + b10 * w1
    p1 = b01 * w0 + b11 * w1
    s = jnp.broadcast_to(dx[od, orow].reshape(1, 128), (C, 128))
    cx0 = jnp.where(s == 0, p0, p1)
    cx1 = jnp.where(s + 1 == 0, p0, p1)
    warped = cx0 * jnp.broadcast_to(vx0[od, orow].reshape(1, 128), (C, 128)) + \
        cx1 * jnp.broadcast_to(vx1[od, orow].reshape(1, 128), (C, 128))
    warped_bf = warped.astype(dtype)
    ref_row = ref_ref[:, orow, :]  # (C, 128) bf16
    out_ref[:, od, orow, :] = ref_row * warped_bf
    prod = warped_bf.astype(jnp.float32) * ref_row.astype(jnp.float32)
    acc_sim = prod[0:1]
    for c in range(1, C):
        acc_sim = acc_sim + prod[c : c + 1]
    sim_ref[od, orow, :] = acc_sim[0]


def warp_pallas_v6sd(
    src_feat: jnp.ndarray,  # (C, H, W) channels-first (source view)
    ref_feat: jnp.ndarray,  # (C, H_out, W_out) channels-first (reference view)
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = 8,
    kd: int = 4,
    tr: int = TR,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-blocked fused warp + cost (kd planes per grid step); same
    contract as :func:`warp_pallas_v6s`. Requires ``D % kd == 0``."""
    C, H, W = src_feat.shape
    D, H_out, W_out = px.shape
    assert ref_feat.shape == (C, H_out, W_out), (ref_feat.shape, (C, H_out, W_out))
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    assert D % kd == 0, (D, kd)
    packed = pack_src_words(src_feat, channels_first=True)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v6sd, H=H, W=W, Hpad=Hp, C=C, ky=ky, kd=kd, tr=tr, dtype=dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(H_out // tr, W_out // 128, D // kd),
        in_specs=[
            pl.BlockSpec((kd, tr, 128), lambda y, x, d: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((kd, tr, 128), lambda y, x, d: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr, 128), lambda y, x, d: (0, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, kd, tr, 128), lambda y, x, d: (0, d, y, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kd, tr, 128), lambda y, x, d: (d, y, x), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
            jax.ShapeDtypeStruct((D, H_out, W_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ky + 1, C, KX), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((3,), jnp.int32),
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), ref_feat, packed)


def warp_pallas_v6sdc(
    src_feat: jnp.ndarray,  # (C, H, W) channels-first (source view)
    ref_feat: jnp.ndarray,  # (C, H_out, W_out) channels-first (reference view)
    depth: jnp.ndarray,  # (D, H_out, W_out) per-pixel hypotheses (W_out padded ok)
    rt: jnp.ndarray,  # (12,) fp32: rot (9, row-major) ++ trans (3)
    w_valid: int,  # true output width (lanes >= w_valid get zero output)
    ky: int = 8,
    kd: int = 4,
    tr: int = TR,
    interpret: bool = False,
    gate: str = "none",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-blocked fused warp + cost with IN-KERNEL projective coords; same
    outputs as :func:`warp_pallas_v6sd` fed with plane_sweep_coords(rt)
    (up to fp32 association ulps in px/py). ``gate="row"`` skips the gather
    for (depth, row) pairs outside the current window (bit-exact)."""
    C, H, W = src_feat.shape
    D, H_out, W_out = depth.shape
    assert ref_feat.shape == (C, H_out, W_out), (ref_feat.shape, (C, H_out, W_out))
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    assert D % kd == 0, (D, kd)
    packed = pack_src_words(src_feat, channels_first=True)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v6sdc, H=H, W=W, Hpad=Hp, C=C, ky=ky, kd=kd, tr=tr,
        dtype=dtype, w_valid=w_valid, gate=gate,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H_out // tr, W_out // 128, D // kd),
        in_specs=[
            pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x)),
            pl.BlockSpec((C, tr, 128), lambda y, x, d, rt: (0, y, x)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, kd, tr, 128), lambda y, x, d, rt: (0, d, y, x)),
            pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ky + 1, C, KX), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((3,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
            jax.ShapeDtypeStruct((D, H_out, W_out), jnp.float32),
        ],
        interpret=interpret,
    )(rt.astype(jnp.float32), depth.astype(jnp.float32), ref_feat, packed)


def _warp_kernel_v7m(rt_ref, dep_ref, ref_ref, src_hbm, out_ref, sim_ref,
                     band, sem, tag_ref, *, H, W, Hpad, C, ky, kd, tr, dtype,
                     w_valid):
    """MXU-contraction warp: the per-row crossbar gather + int one-hot band
    sweep of :func:`_v6sd_core` is replaced by one matmul per depth sub-block
    against a constructed selection matrix.

    For each window visit, an ``(KX, tr·128)`` bf16 matrix ``Mx`` holds
    ``vx0·[k == x0−xs] + vx1·[k == x0+1−xs]`` per output lane (the x-select
    AND x-lerp folded together; out-of-window corners simply match no iota
    row and contribute 0 — rows straddling a window boundary pick up the
    missing corner on the neighboring window's visit). The band — UNPACKED
    bf16 ``(ky+1, C, KX)``, half the DMA bytes of the int32 x-pair packing —
    contracts with ``Mx`` on the MXU with fp32 accumulation, and only the
    cheap y-mix (2-hot fp32 weights over the ky+1 band rows) runs on the
    VPU. The accumulator is the finished bilinear result in fp32: no int
    bitcasts, no x-select epilogue. Not bit-identical to v6sd (x-lerp
    weights are rounded to bf16 for the MXU operand, ~2^-8 relative — the
    same order as the bf16 feature quantization already accepted)."""
    first = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        tag_ref[0] = -1
        tag_ref[1] = -1
        tag_ref[2] = -1

    yt = pl.program_id(0)
    xt = pl.program_id(1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1).astype(jnp.float32)
    X = xt.astype(jnp.float32) * 128.0 + jj
    Y = yt.astype(jnp.float32) * float(tr) + ii
    L0 = rt_ref[0] * X + rt_ref[1] * Y + rt_ref[2]
    L1 = rt_ref[3] * X + rt_ref[4] * Y + rt_ref[5]
    L2 = rt_ref[6] * X + rt_ref[7] * Y + rt_ref[8]
    dep = dep_ref[...].astype(jnp.float32)  # (kd, tr, 128)
    z = L2[None] * dep + rt_ref[11] + 1e-6
    px = (L0[None] * dep + rt_ref[9]) / z
    py = (L1[None] * dep + rt_ref[10]) / z
    pad = jnp.broadcast_to((X >= float(w_valid))[None], px.shape)
    px = jnp.where(pad, -1e6, px)
    py = jnp.where(pad, -1e6, py)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)

    vx0 = ((x0 >= 0) & (x0 < W)).astype(jnp.float32) * (1 - tx)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32) * tx
    wy0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32) * (1 - ty)
    wy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32) * ty

    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    # the +1 corner can fall in the next x-window: widen the sweep hi bound
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx + 1) // KX - xwin_lo + 1

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    # fp32 domain for the one-hot build: int32 compares make an (8,128)-tiled
    # i1 mask that can't feed a bf16 select (Mosaic relayout reject), and the
    # VPU has no bf16 compare at all ("Target does not support this
    # comparison") — fp32 compare + fp32 select + one bf16 cast works
    kio_f = jax.lax.broadcasted_iota(jnp.int32, (KX, tr * 128), 0).astype(jnp.float32)
    zero = jnp.zeros((C, 128), jnp.float32)
    acc0 = tuple(zero for _ in range(kd * tr))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        xs = jx * KX
        myw = (by - ymin) // ky == jy  # (kd, tr, 128)
        a0 = x0 - xs
        a1 = a0 + 1
        xin = ((a0 >= 0) & (a0 < KX)) | ((a1 >= 0) & (a1 < KX))
        in_win = myw & xin

        def hit(_):
            cached = (tag_ref[0] == 1) & (tag_ref[1] == ys) & (tag_ref[2] == xs)

            @pl.when(jnp.logical_not(cached))
            def _():
                copy = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                )
                copy.start()
                copy.wait()
                tag_ref[0] = 1
                tag_ref[1] = ys
                tag_ref[2] = xs

            band_flat = band[...].reshape((ky + 1) * C, KX)
            out = list(accs)
            for od in range(kd):
                w0 = (vx0[od] * myw[od]).reshape(1, tr * 128)
                w1 = (vx1[od] * myw[od]).reshape(1, tr * 128)
                a0r = a0[od].astype(jnp.float32).reshape(1, tr * 128)
                a1r = a1[od].astype(jnp.float32).reshape(1, tr * 128)
                mx = (
                    jnp.where(kio_f == a0r, w0, 0.0)
                    + jnp.where(kio_f == a1r, w1, 0.0)
                ).astype(dtype)
                tmp = jax.lax.dot_general(
                    band_flat, mx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # ((ky+1)·C, tr·128) fp32
                for orow in range(tr):
                    yl0 = (y0[od, orow] - ys).reshape(1, 128)
                    om = (
                        wy0[od, orow].reshape(1, 128) * (yl0 == riota)
                        + wy1[od, orow].reshape(1, 128) * (yl0 + 1 == riota)
                    )  # (ky+1, 128) fp32 2-hot y-lerp weights
                    seg = tmp[:, orow * 128:(orow + 1) * 128].reshape(ky + 1, C, 128)
                    acc = out[od * tr + orow]
                    for r in range(ky + 1):
                        acc = acc + seg[r] * om[r : r + 1]
                    out[od * tr + orow] = acc
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)

    for od in range(kd):
        for orow in range(tr):
            warped_bf = accs[od * tr + orow].astype(dtype)
            ref_row = ref_ref[:, orow, :]  # (C, 128) bf16
            out_ref[:, od, orow, :] = ref_row * warped_bf
            prod = warped_bf.astype(jnp.float32) * ref_row.astype(jnp.float32)
            acc_sim = prod[0:1]
            for c in range(1, C):
                acc_sim = acc_sim + prod[c : c + 1]
            sim_ref[od, orow, :] = acc_sim[0]


def prep_src_rows(src: jnp.ndarray, channels_first: bool = False) -> jnp.ndarray:
    """source -> (H, C, W) bf16 row-major band source for the v7m kernel
    (no x-pair packing: the MXU selection matrix addresses both corners)."""
    if not channels_first:
        src = jnp.moveaxis(src, -1, 0)  # (C, H, W)
    return jnp.transpose(src.astype(jnp.bfloat16), (1, 0, 2))  # (H, C, W)


def warp_pallas_v7m(
    src_feat: jnp.ndarray,  # (C, H, W) channels-first (source view)
    ref_feat: jnp.ndarray,  # (C, H_out, W_out) channels-first (reference view)
    depth: jnp.ndarray,  # (D, H_out, W_out) per-pixel hypotheses (W_out padded ok)
    rt: jnp.ndarray,  # (12,) fp32: rot (9, row-major) ++ trans (3)
    w_valid: int,
    ky: int = 8,
    kd: int = 4,
    tr: int = TR,
    src_rows: bool = False,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """MXU-contraction variant of :func:`warp_pallas_v6sdc` (same contract;
    outputs agree to bf16 x-lerp-weight rounding, not bit-exact).
    ``src_rows``: ``src_feat`` is already in the kernel's (H, C, W) band
    layout (emitted straight off the feature net's s2d exit — the (C, H, W)
    intermediate and its extra relayout pass never exist)."""
    if src_rows:
        H, C, W = src_feat.shape
    else:
        C, H, W = src_feat.shape
    D, H_out, W_out = depth.shape
    assert ref_feat.shape == (C, H_out, W_out), (ref_feat.shape, (C, H_out, W_out))
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    assert D % kd == 0, (D, kd)
    rows = (
        src_feat.astype(jnp.bfloat16)
        if src_rows
        else prep_src_rows(src_feat, channels_first=True)
    )
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        rows = jnp.pad(rows, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v7m, H=H, W=W, Hpad=Hp, C=C, ky=ky, kd=kd, tr=tr,
        dtype=dtype, w_valid=w_valid,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H_out // tr, W_out // 128, D // kd),
        in_specs=[
            pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x)),
            pl.BlockSpec((C, tr, 128), lambda y, x, d, rt: (0, y, x)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, kd, tr, 128), lambda y, x, d, rt: (0, d, y, x)),
            pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ky + 1, C, KX), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((3,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
            jax.ShapeDtypeStruct((D, H_out, W_out), jnp.float32),
        ],
        interpret=interpret,
    )(rt.astype(jnp.float32), depth.astype(jnp.float32), ref_feat, rows)


def _warp_kernel_v8(rt_ref, dep_ref, ref_ref, src_hbm, out_ref, ent_ref,
                    band, sem, tag_ref, m_ref, s_ref, u_ref, *, H, W, Hpad, C,
                    ky, kd, tr, dtype, w_valid, nd, emit_entropy, row_ymix,
                    cache_slots=1):
    """v7m successor: MXU x-contraction + two independently-measurable moves.

    1. Vectorized y-mix/epilogue (``row_ymix=False``): v7m's per-output-row
       unrolled y-lerp (kd·tr slice/compare/accumulate sequences per window
       visit) becomes ONE (ky+1, tr·128)-wide 2-hot build and ky+1 FMAs of
       (C, tr·128) per depth plane — identical flops, ~8x fewer VPU
       instruction issues, and the accumulators live flat in (C, tr·128).
    2. In-kernel online softmax entropy (``emit_entropy=True``): the grid is
       depth-innermost, so a flash-attention-style running (max, Σe^l, Σl·e^l)
       over the tile's D planes finishes the similarity softmax entropy
       -Σp·log p = (m + log s) − u/s inside the kernel. The (D, h, w) fp32
       sim stream to HBM and XLA's separate softmax-entropy pass over it both
       disappear; the kernel emits the (h, w) entropy map the vis head
       consumes directly (reference model.py:49-50 semantics).
    3. ``cache_slots=S>1``: the 1-slot window tag cache thrashes with the
       depth-innermost grid (a tile's windows alternate A,B,A,B… across its
       kd steps, so ~90% of visits re-DMA a band already fetched moments ago
       — tools/roofline.py measures 13.9k DMAs for 15.9k visits at stage 2
       and predicts a 4-slot LRU leaves ~3k). S banded slots + an SMEM LRU
       (valid, ys, xs, last-use) turn those re-fetches into VMEM hits; at
       ~1 us per (non-overlapped) DMA issue that is ~23 ms/map of predicted
       floor savings across the three stages. Bit-exact: the cache only
       changes WHEN bands move, never what they contain.
    """
    S = cache_slots
    first = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        if S == 1:
            tag_ref[0] = -1
            tag_ref[1] = -1
            tag_ref[2] = -1
        else:
            for s_i in range(S):
                tag_ref[s_i, 0] = -1
                tag_ref[s_i, 1] = -1
                tag_ref[s_i, 2] = -1
                # distinct ages so the cold cache fills slots in order
                tag_ref[s_i, 3] = s_i - S
            tag_ref[S, 0] = 0  # visit counter (LRU clock)

    if emit_entropy:
        @pl.when(pl.program_id(2) == 0)
        def _():
            m_ref[...] = jnp.full((tr, 128), -1e30, jnp.float32)
            s_ref[...] = jnp.zeros((tr, 128), jnp.float32)
            u_ref[...] = jnp.zeros((tr, 128), jnp.float32)

    yt = pl.program_id(0)
    xt = pl.program_id(1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 0).astype(jnp.float32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1).astype(jnp.float32)
    X = xt.astype(jnp.float32) * 128.0 + jj
    Y = yt.astype(jnp.float32) * float(tr) + ii
    L0 = rt_ref[0] * X + rt_ref[1] * Y + rt_ref[2]
    L1 = rt_ref[3] * X + rt_ref[4] * Y + rt_ref[5]
    L2 = rt_ref[6] * X + rt_ref[7] * Y + rt_ref[8]
    dep = dep_ref[...].astype(jnp.float32)  # (kd, tr, 128)
    z = L2[None] * dep + rt_ref[11] + 1e-6
    px = (L0[None] * dep + rt_ref[9]) / z
    py = (L1[None] * dep + rt_ref[10]) / z
    pad = jnp.broadcast_to((X >= float(w_valid))[None], px.shape)
    px = jnp.where(pad, -1e6, px)
    py = jnp.where(pad, -1e6, py)

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    tx = px - x0f
    ty = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    bx = jnp.clip(x0, 0, W - 2)
    by = jnp.clip(y0, 0, H - 2)

    vx0 = ((x0 >= 0) & (x0 < W)).astype(jnp.float32) * (1 - tx)
    vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(jnp.float32) * tx
    wy0 = ((y0 >= 0) & (y0 < H)).astype(jnp.float32) * (1 - ty)
    wy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(jnp.float32) * ty

    ymin = jnp.min(by)
    n_y = (jnp.max(by) - ymin) // ky + 1
    xwin_lo = jnp.min(bx) // KX
    n_x = jnp.max(bx + 1) // KX - xwin_lo + 1

    # fp32 domain for the one-hot builds (Mosaic: no bf16 compares; int32 i1
    # masks can't feed bf16 selects — see _warp_kernel_v7m)
    kio_f = jax.lax.broadcasted_iota(jnp.int32, (KX, tr * 128), 0).astype(jnp.float32)
    riota2 = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, tr * 128), 0)
    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    zero = jnp.zeros((C, tr * 128), jnp.float32)
    acc0 = tuple(zero for _ in range(kd))

    def body(widx, accs):
        jy = widx // n_x
        jx = xwin_lo + widx % n_x
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        xs = jx * KX
        myw = (by - ymin) // ky == jy  # (kd, tr, 128)
        a0 = x0 - xs
        a1 = a0 + 1
        xin = ((a0 >= 0) & (a0 < KX)) | ((a1 >= 0) & (a1 < KX))
        in_win = myw & xin

        def hit(_):
            if S == 1:
                cached = (tag_ref[0] == 1) & (tag_ref[1] == ys) & (tag_ref[2] == xs)

                @pl.when(jnp.logical_not(cached))
                def _():
                    copy = pltpu.make_async_copy(
                        src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)], band, sem
                    )
                    copy.start()
                    copy.wait()
                    tag_ref[0] = 1
                    tag_ref[1] = ys
                    tag_ref[2] = xs

                band_flat = band[...].reshape((ky + 1) * C, KX)
            else:
                matches = [
                    (tag_ref[s_i, 0] == 1)
                    & (tag_ref[s_i, 1] == ys)
                    & (tag_ref[s_i, 2] == xs)
                    for s_i in range(S)
                ]
                hit_any = matches[0]
                for m in matches[1:]:
                    hit_any = hit_any | m
                hit_idx = jnp.int32(0)
                for s_i in range(1, S):
                    hit_idx = jnp.where(matches[s_i], jnp.int32(s_i), hit_idx)
                vic = jnp.int32(0)
                vic_u = tag_ref[0, 3]
                for s_i in range(1, S):
                    older = tag_ref[s_i, 3] < vic_u
                    vic = jnp.where(older, jnp.int32(s_i), vic)
                    vic_u = jnp.where(older, tag_ref[s_i, 3], vic_u)
                slot = jnp.where(hit_any, hit_idx, vic)

                @pl.when(jnp.logical_not(hit_any))
                def _():
                    copy = pltpu.make_async_copy(
                        src_hbm.at[pl.ds(ys, ky + 1), :, pl.ds(xs, KX)],
                        band.at[slot], sem,
                    )
                    copy.start()
                    copy.wait()
                    tag_ref[slot, 0] = 1
                    tag_ref[slot, 1] = ys
                    tag_ref[slot, 2] = xs

                cnt = tag_ref[S, 0]
                tag_ref[slot, 3] = cnt
                tag_ref[S, 0] = cnt + 1
                band_flat = band[slot].reshape((ky + 1) * C, KX)
            out = list(accs)
            for od in range(kd):
                w0 = (vx0[od] * myw[od]).reshape(1, tr * 128)
                w1 = (vx1[od] * myw[od]).reshape(1, tr * 128)
                a0r = a0[od].astype(jnp.float32).reshape(1, tr * 128)
                a1r = a1[od].astype(jnp.float32).reshape(1, tr * 128)
                mx = (
                    jnp.where(kio_f == a0r, w0, 0.0)
                    + jnp.where(kio_f == a1r, w1, 0.0)
                ).astype(dtype)
                tmp = jax.lax.dot_general(
                    band_flat, mx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # ((ky+1)·C, tr·128) fp32
                acc = out[od]
                if row_ymix:  # v7m's per-row form (A/B knob)
                    for orow in range(tr):
                        yl0 = (y0[od, orow] - ys).reshape(1, 128)
                        om = (
                            wy0[od, orow].reshape(1, 128) * (yl0 == riota)
                            + wy1[od, orow].reshape(1, 128) * (yl0 + 1 == riota)
                        )
                        seg = tmp[:, orow * 128:(orow + 1) * 128].reshape(ky + 1, C, 128)
                        sub = acc[:, orow * 128:(orow + 1) * 128]
                        for r in range(ky + 1):
                            sub = sub + seg[r] * om[r : r + 1]
                        acc = jax.lax.dynamic_update_slice(acc, sub, (0, orow * 128))
                else:
                    yl0 = (y0[od] - ys).reshape(1, tr * 128)
                    om_all = (
                        wy0[od].reshape(1, tr * 128) * (yl0 == riota2)
                        + wy1[od].reshape(1, tr * 128) * (yl0 + 1 == riota2)
                    )  # (ky+1, tr·128) fp32 2-hot y-lerp weights
                    for r in range(ky + 1):
                        acc = acc + tmp[r * C:(r + 1) * C, :] * om_all[r : r + 1]
                out[od] = acc
            return tuple(out)

        return jax.lax.cond(jnp.any(in_win), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y * n_x, body, acc0)

    # Epilogue in v7m's per-row form: lane-dim splits ((C, tr·128) ->
    # (C, tr, 128)) are a Mosaic relayout risk, while static 128-aligned lane
    # slices + integer-indexed ref writes are proven legal (v7m ships them).
    for od in range(kd):
        acc = accs[od]  # (C, tr·128) fp32
        for orow in range(tr):
            a_row = acc[:, orow * 128:(orow + 1) * 128]  # (C, 128) fp32
            warped_bf = a_row.astype(dtype)
            ref_row = ref_ref[:, orow, :]  # (C, 128) bf16
            out_ref[:, od, orow, :] = ref_row * warped_bf
            # sim from the bf16-quantized warped value, exactly as v7m does
            prod = warped_bf.astype(jnp.float32) * ref_row.astype(jnp.float32)
            sim = prod[0:1]
            for c in range(1, C):
                sim = sim + prod[c : c + 1]  # (1, 128)
            if emit_entropy:
                m_old = m_ref[orow : orow + 1, :]
                m_new = jnp.maximum(m_old, sim)
                alpha = jnp.exp(m_old - m_new)
                e = jnp.exp(sim - m_new)
                s_ref[orow : orow + 1, :] = s_ref[orow : orow + 1, :] * alpha + e
                u_ref[orow : orow + 1, :] = (
                    u_ref[orow : orow + 1, :] * alpha + sim * e
                )
                m_ref[orow : orow + 1, :] = m_new
            else:
                ent_ref[od, orow, :] = sim[0]  # sim mode: ent_ref (kd, tr, 128)

    if emit_entropy:
        @pl.when(pl.program_id(2) == nd - 1)
        def _():
            s = s_ref[...]
            ent_ref[...] = (m_ref[...] + jnp.log(s)) - u_ref[...] / s


def warp_pallas_v8(
    src_feat: jnp.ndarray,  # (C, H, W) channels-first (source view)
    ref_feat: jnp.ndarray,  # (C, H_out, W_out) channels-first (reference view)
    depth: jnp.ndarray,  # (D, H_out, W_out) per-pixel hypotheses (W_out padded ok)
    rt: jnp.ndarray,  # (12,) fp32: rot (9, row-major) ++ trans (3)
    w_valid: int,
    ky: int = 8,
    kd: int = 4,
    tr: int = TR,
    emit_entropy: bool = True,
    row_ymix: bool = False,
    cache_slots: int = 1,
    src_rows: bool = False,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """v7m successor (see :func:`_warp_kernel_v8`). Returns
    ``(in_prod (C, D, H_out, W_out), entropy (H_out, W_out) fp32)`` when
    ``emit_entropy`` (the default), else ``(in_prod, sim (D, H_out, W_out))``
    exactly like :func:`warp_pallas_v7m`. ``cache_slots > 1`` enables the
    S-slot LRU band cache (bit-exact; kills the dt-innermost DMA thrash).
    ``src_rows``: ``src_feat`` arrives pre-transposed in the (H, C, W) band
    layout (see :func:`warp_pallas_v7m`)."""
    if src_rows:
        H, C, W = src_feat.shape
    else:
        C, H, W = src_feat.shape
    D, H_out, W_out = depth.shape
    assert ref_feat.shape == (C, H_out, W_out), (ref_feat.shape, (C, H_out, W_out))
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    assert D % kd == 0, (D, kd)
    rows = (
        src_feat.astype(jnp.bfloat16)
        if src_rows
        else prep_src_rows(src_feat, channels_first=True)
    )
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        rows = jnp.pad(rows, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype
    nd = D // kd

    kernel = functools.partial(
        _warp_kernel_v8, H=H, W=W, Hpad=Hp, C=C, ky=ky, kd=kd, tr=tr,
        dtype=dtype, w_valid=w_valid, nd=nd, emit_entropy=emit_entropy,
        row_ymix=row_ymix, cache_slots=cache_slots,
    )
    S = cache_slots
    band_shape = (ky + 1, C, KX) if S == 1 else (S, ky + 1, C, KX)
    tag_shape = (3,) if S == 1 else (S + 1, 4)
    if emit_entropy:
        ent_spec = pl.BlockSpec((tr, 128), lambda y, x, d, rt: (y, x))
        ent_shape = jax.ShapeDtypeStruct((H_out, W_out), jnp.float32)
    else:
        ent_spec = pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x))
        ent_shape = jax.ShapeDtypeStruct((D, H_out, W_out), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H_out // tr, W_out // 128, nd),
        in_specs=[
            pl.BlockSpec((kd, tr, 128), lambda y, x, d, rt: (d, y, x)),
            pl.BlockSpec((C, tr, 128), lambda y, x, d, rt: (0, y, x)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, kd, tr, 128), lambda y, x, d, rt: (0, d, y, x)),
            ent_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM(band_shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM(tag_shape, jnp.int32),
            pltpu.VMEM((tr, 128), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
            pltpu.VMEM((tr, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
            ent_shape,
        ],
        interpret=interpret,
    )(rt.astype(jnp.float32), depth.astype(jnp.float32), ref_feat, rows)


def _warp_kernel_v6s_cached(px_ref, py_ref, ref_ref, src_hbm, out_ref, sim_ref,
                            band, sem, tag_ref, *, H, W, Hpad, C, ky, tr, dtype):
    """Per-view v6s grid step with the cross-step DMA window cache (grid runs
    depth-innermost; see :func:`_warp_kernel_v6s`)."""
    first = (
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _():
        tag_ref[0] = -1
        tag_ref[1] = -1
        tag_ref[2] = -1

    _warp_kernel_v6s(
        px_ref, py_ref, ref_ref, src_hbm, out_ref, sim_ref, band, sem,
        H=H, W=W, Hpad=Hpad, C=C, ky=ky, tr=tr, dtype=dtype,
        tag_ref=tag_ref, view=0,
    )


def warp_pallas_v6s(
    src_feat: jnp.ndarray,  # (C, H, W) channels-first (source view)
    ref_feat: jnp.ndarray,  # (C, H_out, W_out) channels-first (reference view)
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = 8,
    tr: int = TR,
    interpret: bool = False,
    dma_cache: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused warp + cost: returns (in_prod ``(C, D, H_out, W_out)`` bf16-ish,
    sim ``(D, H_out, W_out)`` fp32). Same bf16-quantizing contract as v6.

    ``dma_cache`` reorders the grid depth-innermost and skips the band DMA
    when a step's window is already resident (adjacent hypotheses shift
    source coords sub-pixel). Exact for any geometry either way."""
    C, H, W = src_feat.shape
    D, H_out, W_out = px.shape
    assert ref_feat.shape == (C, H_out, W_out), (ref_feat.shape, (C, H_out, W_out))
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    packed = pack_src_words(src_feat, channels_first=True)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    if dma_cache:
        kernel = functools.partial(
            _warp_kernel_v6s_cached, H=H, W=W, Hpad=Hp, C=C, ky=ky, tr=tr, dtype=dtype
        )
        grid = (H_out // tr, W_out // 128, D)
        idx_plane = lambda y, x, d: (d, y, x)
        idx_ref = lambda y, x, d: (0, y, x)
        idx_out = lambda y, x, d: (0, d, y, x)
        scratch = [
            pltpu.VMEM((ky + 1, C, KX), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((3,), jnp.int32),
        ]
    else:
        kernel = functools.partial(
            _warp_kernel_v6s, H=H, W=W, Hpad=Hp, C=C, ky=ky, tr=tr, dtype=dtype
        )
        grid = (D, H_out // tr, W_out // 128)
        idx_plane = lambda d, y, x: (d, y, x)
        idx_ref = lambda d, y, x: (0, y, x)
        idx_out = lambda d, y, x: (0, d, y, x)
        scratch = [
            pltpu.VMEM((ky + 1, C, KX), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tr, 128), idx_ref, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((C, 1, tr, 128), idx_out, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 128), idx_plane, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
            jax.ShapeDtypeStruct((D, H_out, W_out), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), ref_feat, packed)


def warp_pallas_v6(
    src_feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = KY,
    tr: int = TR,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Bit-packed x-pair warp (v6): same contract as :func:`warp_pallas`, but
    the source is quantized to bf16 (exact when it already is bf16)."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    packed = pack_src_words(src_feat, channels_first=channels_first)  # (H, C, W)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v6, H=H, W=W, Hpad=Hp, C=C, ky=ky, tr=tr, dtype=dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(D, H_out // tr, W_out // 128),
        in_specs=[
            pl.BlockSpec((1, tr, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, 1, tr, 128), lambda d, y, x: (0, d, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((ky + 1, C, KX), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), packed)


def warp_pallas_padded(
    src_feat: jnp.ndarray,  # (H, W, C) or (C, H, W) with channels_first
    px: jnp.ndarray,  # (D, H, W) output-grid coords (W need not be 128-aligned)
    py: jnp.ndarray,
    interpret: bool = False,
    channels_first: bool = False,
    variant: str | None = None,  # "v1"|"v2"|"v3"|"v4" (None = WARP_VARIANT env or v1)
    ky: int | None = None,  # band rows (v2/v3/v4 only; None = variant default)
    tr: int | None = None,  # output rows per tile (v3 only; None = default 8)
) -> jnp.ndarray:
    """warp_pallas with automatic output-width padding to 128 lanes (padded
    columns get out-of-range coords -> zeros, then are cropped)."""
    import os

    D, H, W = px.shape
    Wp = ((W + 127) // 128) * 128
    if Wp != W:
        pad = ((0, 0), (0, 0), (0, Wp - W))
        px = jnp.pad(px, pad, constant_values=-1e6)
        py = jnp.pad(py, pad, constant_values=-1e6)
    variant = variant or os.environ.get("WARP_VARIANT", "v1")
    if variant in ("v3", "v6"):
        fn = {"v3": warp_pallas_v3, "v6": warp_pallas_v6}[variant]
    else:  # superseded generations, kept for measurement reproducibility
        from . import warp_archive

        fn = {"v1": warp_archive.warp_pallas, "v2": warp_archive.warp_pallas_v2,
              "v4": warp_archive.warp_pallas_v4, "v5": warp_archive.warp_pallas_v5,
              "v7": warp_archive.warp_pallas_v7}[variant]
    kwargs = {} if (variant == "v1" or ky is None) else {"ky": ky}
    if variant in ("v3", "v5", "v6", "v7") and tr is not None:
        kwargs["tr"] = tr
    out = fn(src_feat, px, py, interpret=interpret, channels_first=channels_first, **kwargs)
    return out[..., :W] if Wp != W else out


def warp_pallas_v3(
    src_feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = KY,
    tr: int = TR,
    interpret: bool = False,
    channels_first: bool = False,
    gather16: bool | None = None,
) -> jnp.ndarray:
    """Tile-anchored-band warp with batched per-row gathers; same contract as
    :func:`warp_pallas`. ``tr`` output rows per tile (bigger tiles amortize
    the per-tile DMA; ``ky`` must cover the taller tile's source span or
    extra windows sweep)."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    packed = pack_src_for_warp(src_feat, channels_first=channels_first)
    Hp = ((H + ky - 1) // ky) * ky
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    if gather16 is None:
        # bf16 gathers would halve crossbar volume, but Mosaic rejects them:
        # int16 indices widen to i32 in lowering and dynamic_gather requires
        # matching idx/result bitwidths ("Not implemented"). Opt-in only.
        gather16 = False
    kernel = functools.partial(
        _warp_kernel_v3, H=H, W=W, Hpad=Hp, C=C, ky=ky, tr=tr, dtype=dtype,
        gather16=gather16,
    )
    return pl.pallas_call(
        kernel,
        grid=(D, H_out // tr, W_out // 128),
        in_specs=[
            pl.BlockSpec((1, tr, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, 1, tr, 128), lambda d, y, x: (0, d, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((ky, 4 * C, KX), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), packed)


