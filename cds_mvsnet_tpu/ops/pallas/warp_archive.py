"""Superseded warp-kernel generations (v1/v2/v4/v5/v7) — measured epitaphs.

Quarantined from ``warp.py`` (VERDICT r3 weak #5): these generations lost
their in-model A/Bs and are kept only so the measurement history stays
reproducible (tools/bench_warp.py) and regression-testable. None is reachable
from the production route table (models/warp_routes.py).

Epitaphs (tools/ablate.py / tools/bench_warp.py, v5e, full provenance in
STATUS.md):

- **v1** — first working banded-DMA gather kernel (r1). Superseded by v2's
  window sweep and v3's tile-anchored bands; kept as the simplest executable
  statement of the design.
- **v2** — per-row dynamic windows. Lost to v3 everywhere: the per-row
  traced-offset VMEM loads + scalar min cost more than the crossbar volume
  they save. Static shapes or bust.
- **v4** — double-banded prefetch variant of v3; never beat v3 after the
  depth-innermost grid landed (the window DMAs already hide behind gathers).
- **v5** — per-output-row dynamic ky_g=2 band slice before the gather:
  2x SLOWER than v3 at every stage (80 vs 41 ms stage3) — same lesson as v2.
- **v7** — full-width band DMA + per-row-x-segment dynamic 128-aligned lane
  slices. Dynamic aligned lane slicing compiles (tools/probe_lane_slice.py)
  but 40 masked-min scalar extractions + 40 tiny scalar fori loops per tile
  made it 2x slower than v6 everywhere (73-136 ms). At most ONE scalar-driven
  loop per tile.

The live generations (v3 fp32 fallback, v6 family, v7m, v8) stay in
``warp.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import KX, KY, TR, pack_src_for_warp, pack_src_words

__all__ = ["warp_pallas", "warp_pallas_v2", "warp_pallas_v4", "warp_pallas_v5",
           "warp_pallas_v7"]


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


def _warp_kernel_v2(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, C, ky, dtype):
    """v2 grid step: per-OUTPUT-ROW anchored source bands.

    v1 sweeps one tile-wide (KY x 128) band and resolves each output row with
    KY masked lane-gathers — KY·TR gathers/tile, all-rows-live accumulators.
    v2 anchors a small (ky x 128) band at each output row's own ymin (output
    rows span few source rows; lane-wise y variation is the only spread), so
    each hit window costs ONE batched lane-gather of the flattened band plus
    a ky-row mask-reduce: ~TR gathers/tile and one (4C, 128) accumulator live
    at a time. Same exactness contract as v1 (window sweep covers arbitrary
    geometry; distant coordinates only cost iterations).
    """
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

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky, 1, 128), 0)

    for orow in range(TR):
        bx_r = bx[orow].reshape(1, 128)
        by_r = by[orow].reshape(1, 128)
        ymin = jnp.min(by_r)
        n_y = (jnp.max(by_r) - ymin) // ky + 1
        xwin_lo = jnp.min(bx_r) // KX
        n_x = jnp.max(bx_r) // KX - xwin_lo + 1

        def body(widx, acc, by_r=by_r, bx_r=bx_r, ymin=ymin, n_x=n_x):
            jy = widx // n_x
            jx = xwin_lo + widx % n_x
            ys = jnp.minimum(ymin + jy * ky, Hpad - ky)
            xs = jx * KX
            in_win = ((by_r - ymin) // ky == jy) & (bx_r // KX == jx)  # (1,128)

            def hit(_):
                copy = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(ys, ky), :, pl.ds(xs, KX)], band, sem
                )
                copy.start()
                copy.wait()
                xl = jnp.clip(bx_r - xs, 0, KX - 1)  # (1, 128)
                idx = jnp.broadcast_to(xl, (ky * fourC, 128)).astype(jnp.int32)
                flat = band[...].reshape(ky * fourC, KX).astype(jnp.float32)
                g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky, fourC, KX)
                yl = by_r - ys  # (1, 128)
                sel = (in_win & (yl == riota[:, 0])).astype(jnp.float32)  # (ky,128)
                return acc + jnp.sum(g * sel[:, None, :], axis=0)  # (4C, 128)

            return jax.lax.cond(jnp.any(in_win), hit, lambda _: acc, None)

        acc = jax.lax.fori_loop(
            0, n_y * n_x, body, jnp.zeros((fourC, 128), jnp.float32)
        )

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
        )  # (C, 128)
        out_ref[:, 0, orow, :] = out.astype(dtype)


def warp_pallas_v2(
    src_feat: jnp.ndarray,  # (H, W, C) or (C, H, W) with channels_first
    px: jnp.ndarray,  # (D, H, W) fp32 source-pixel x coords
    py: jnp.ndarray,
    ky: int = 4,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Row-anchored-band warp -> (C, D, H_out, W_out); same contract as
    :func:`warp_pallas` (output W % 128 == 0, H % 8 == 0)."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    assert W_out % 128 == 0 and H_out % TR == 0, (H_out, W_out)
    packed = pack_src_for_warp(src_feat, channels_first=channels_first)  # (H, 4C, W)
    Hp = ((H + ky - 1) // ky) * ky
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v2, H=H, W=W, Hpad=Hp, C=C, ky=ky, dtype=dtype
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


def _warp_kernel_v4(px_ref, py_ref, src_hbm, out_ref, bands, sems, spare, ssem,
                    *, H, W, Hpad, C, ky, dtype):
    """v4 grid step: v2's per-output-row anchored minimal bands, but all TR
    primary-window DMAs are issued UP FRONT so their latencies overlap (v2
    pays TR serialized start->wait round trips — measured 2x slower than v1
    despite 4x less gather volume). Rows whose lanes straddle extra (ky x
    128) windows fall back to a serial spare-buffer sweep (rare on coherent
    geometry, exact on any geometry)."""
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

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky, 128), 0)

    # phase 1: per-row primary-window DMAs, all in flight together
    descs = []
    for orow in range(TR):
        by_r = by[orow].reshape(1, 128)
        bx_r = bx[orow].reshape(1, 128)
        ymin = jnp.min(by_r)
        n_y = (jnp.max(by_r) - ymin) // ky + 1
        xlo = jnp.min(bx_r) // KX
        n_x = jnp.max(bx_r) // KX - xlo + 1
        ys0 = jnp.minimum(ymin, Hpad - ky)
        xs0 = xlo * KX
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(ys0, ky), :, pl.ds(xs0, KX)],
            bands.at[orow],
            sems.at[orow],
        ).start()
        descs.append((by_r, bx_r, ymin, n_y, xlo, n_x, ys0, xs0))

    # phase 2: per-row gather + (rare) extra-window sweep + corner resolve
    for orow in range(TR):
        by_r, bx_r, ymin, n_y, xlo, n_x, ys0, xs0 = descs[orow]
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(ys0, ky), :, pl.ds(xs0, KX)],
            bands.at[orow],
            sems.at[orow],
        ).wait()

        def gather_from(buf, ys, xs, in_win, by_r=by_r, bx_r=bx_r):
            xl = jnp.clip(bx_r - xs, 0, KX - 1)
            idx = jnp.broadcast_to(xl, (ky * fourC, 128)).astype(jnp.int32)
            flat = buf[...].reshape(ky * fourC, KX).astype(jnp.float32)
            g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky, fourC, KX)
            sel = (in_win & ((by_r - ys) == riota)).astype(jnp.float32)  # (ky,128)
            return jnp.sum(g * sel[:, None, :], axis=0)  # (4C, 128)

        in_win0 = ((by_r - ymin) // ky == 0) & (bx_r // KX == xlo)
        acc = gather_from(bands.at[orow], ys0, xs0, in_win0)

        def body(widx, acc, by_r=by_r, bx_r=bx_r, ymin=ymin, n_x=n_x, xlo=xlo):
            jy = widx // n_x
            jx = xlo + widx % n_x
            ys = jnp.minimum(ymin + jy * ky, Hpad - ky)
            xs = jx * KX
            in_win = ((by_r - ymin) // ky == jy) & (bx_r // KX == jx)

            def hit(_):
                copy = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(ys, ky), :, pl.ds(xs, KX)], spare, ssem
                )
                copy.start()
                copy.wait()
                return acc + gather_from(spare, ys, xs, in_win)

            return jax.lax.cond(jnp.any(in_win), hit, lambda _: acc, None)

        acc = jax.lax.fori_loop(1, n_y * n_x, body, acc)

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


def warp_pallas_v4(
    src_feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = 4,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Pipelined row-anchored-band warp; same contract as :func:`warp_pallas`."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    assert W_out % 128 == 0 and H_out % TR == 0, (H_out, W_out)
    packed = pack_src_for_warp(src_feat, channels_first=channels_first)
    Hp = ((H + ky - 1) // ky) * ky
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v4, H=H, W=W, Hpad=Hp, C=C, ky=ky, dtype=dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(D, H_out // TR, W_out // 128),
        in_specs=[
            pl.BlockSpec((1, TR, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, 128), lambda d, y, x: (d, y, x), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, 1, TR, 128), lambda d, y, x: (0, d, y, x), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((TR, ky, 4 * C, KX), dtype),
            pltpu.SemaphoreType.DMA((TR,)),
            pltpu.VMEM((ky, 4 * C, KX), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), packed)


def _warp_kernel_v7(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, Wpad,
                    C, ky, tr, nseg, dtype):
    """v7 grid step: one (depth, tr output rows, FULL output width) tile.

    The band DMA fetches (ky+1) full-width source rows in ONE transfer, so a
    small ky (per-row source spans are 1-2 rows; a tr=4 tile spans ~5-6) no
    longer costs per-row DMA issues, and x never enters the DMA at all. Each
    output row x 128-lane segment gathers from a dynamically-chosen but
    provably 128-aligned lane slice of the band (Mosaic accepts traced
    offsets that are multiples of 128 — tools/probe_lane_slice.py), sweeping
    extra x-slices only when a segment's source span exceeds 128 (slope > 1
    or incoherent geometry). Same bf16 x-pair bit-packing as v6."""
    px = px_ref[0].astype(jnp.float32)  # (tr, Wout)
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

    riota = jax.lax.broadcasted_iota(jnp.int32, (ky + 1, 128), 0)
    zero = jnp.zeros((C, 128), jnp.float32)
    accs0 = tuple((zero, zero) for _ in range(tr * nseg))

    def ybody(jy, accs):
        ys = jnp.minimum(ymin + jy * ky, Hpad - (ky + 1))
        in_y = (by - ymin) // ky == jy  # (tr, Wout)

        def hit(_):
            copy = pltpu.make_async_copy(
                src_hbm.at[pl.ds(ys, ky + 1), :, :], band, sem
            )
            copy.start()
            copy.wait()
            out = list(accs)
            for r in range(tr):
                for s in range(nseg):
                    sl = slice(s * 128, (s + 1) * 128)
                    iy = in_y[r, sl].reshape(1, 128)
                    bx_rs = bx[r, sl].reshape(1, 128)
                    yl0 = (y0[r, sl] - ys).reshape(1, 128)
                    w0 = wy0[r, sl].reshape(1, 128)
                    w1 = wy1[r, sl].reshape(1, 128)
                    xlo = jnp.min(jnp.where(iy, bx_rs, W - 2)) // 128
                    n_x = jnp.max(jnp.where(iy, bx_rs, 0)) // 128 - xlo + 1

                    def xbody(k, acc, iy=iy, bx_rs=bx_rs, yl0=yl0, w0=w0, w1=w1,
                              xlo=xlo):
                        xs = (xlo + k) * 128
                        in_w = iy & (bx_rs // 128 == xlo + k)

                        def ghit(_):
                            seg = band[:, :, pl.ds(xs, 128)]  # (ky+1, C, 128)
                            flat = seg.reshape((ky + 1) * C, 128)
                            xl = jnp.clip(bx_rs - xs, 0, 127)
                            idx = jnp.broadcast_to(xl, ((ky + 1) * C, 128)).astype(jnp.int32)
                            g = jnp.take_along_axis(flat, idx, axis=1).reshape(ky + 1, C, 128)
                            g0 = jax.lax.bitcast_convert_type(g & jnp.int32(-65536), jnp.float32)
                            g1 = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
                            w_r = (
                                jnp.where(yl0 == riota, w0, 0.0)
                                + jnp.where(yl0 + 1 == riota, w1, 0.0)
                            ) * in_w.astype(jnp.float32)
                            a0, a1 = acc
                            return (
                                a0 + jnp.sum(g0 * w_r[:, None, :], axis=0),
                                a1 + jnp.sum(g1 * w_r[:, None, :], axis=0),
                            )

                        return jax.lax.cond(jnp.any(in_w), ghit, lambda _: acc, None)

                    out[r * nseg + s] = jax.lax.fori_loop(0, n_x, xbody, out[r * nseg + s])
            return tuple(out)

        return jax.lax.cond(jnp.any(in_y), hit, lambda _: accs, None)

    accs = jax.lax.fori_loop(0, n_y, ybody, accs0)

    for r in range(tr):
        for s in range(nseg):
            sl = slice(s * 128, (s + 1) * 128)
            a0, a1 = accs[r * nseg + s]
            sshift = jnp.broadcast_to(dx[r, sl].reshape(1, 128), (C, 128))
            cx0 = jnp.where(sshift == 0, a0, a1)
            cx1 = jnp.where(sshift + 1 == 0, a0, a1)
            out = cx0 * jnp.broadcast_to(vx0[r, sl].reshape(1, 128), (C, 128)) + \
                cx1 * jnp.broadcast_to(vx1[r, sl].reshape(1, 128), (C, 128))
            out_ref[:, 0, r, sl] = out.astype(dtype)


def warp_pallas_v7(
    src_feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = 8,
    tr: int = 4,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Wide-band warp (v7): same bf16-quantizing contract as
    :func:`warp_pallas_v6`."""
    if channels_first:
        C, H, W = src_feat.shape
    else:
        H, W, C = src_feat.shape
    D, H_out, W_out = px.shape
    assert W_out % 128 == 0 and H_out % tr == 0, (H_out, W_out, tr)
    nseg = W_out // 128
    packed = pack_src_words(src_feat, channels_first=channels_first)  # (H, C, W)
    Hp = ((H + ky - 1) // ky) * ky + 1
    Wp = ((W + 127) // 128) * 128
    if (Hp, Wp) != (H, W):
        packed = jnp.pad(packed, ((0, Hp - H), (0, 0), (0, Wp - W)))
    dtype = src_feat.dtype

    kernel = functools.partial(
        _warp_kernel_v7, H=H, W=W, Hpad=Hp, Wpad=Wp, C=C, ky=ky, tr=tr,
        nseg=nseg, dtype=dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(D, H_out // tr),
        in_specs=[
            pl.BlockSpec((1, tr, W_out), lambda d, y: (d, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, W_out), lambda d, y: (d, y, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, 1, tr, W_out), lambda d, y: (0, d, y, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, D, H_out, W_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((ky + 1, C, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(px.astype(jnp.float32), py.astype(jnp.float32), packed)


def _warp_kernel_v5(px_ref, py_ref, src_hbm, out_ref, band, sem, *, H, W, Hpad, C,
                    ky, kg, tr, dtype):
    """v5 grid step: v3's one tall tile-anchored band DMA, but each output row
    gathers only a ``(kg·4C, 128)`` slice of the band starting at that row's
    own in-window y-min (dynamic leading-dim VMEM load) — an output row's
    true source y-span is 1-2 rows on coherent plane-sweep geometry, so this
    cuts the crossbar gather volume by ~ky/kg vs v3. Rows whose in-window
    lanes span more than ``kg`` band rows add a full-band fallback gather
    (lax.cond, rare on coherent geometry) — exact for arbitrary geometry."""
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

    riota_g = jax.lax.broadcasted_iota(jnp.int32, (kg, 128), 0)
    riota_f = jax.lax.broadcasted_iota(jnp.int32, (ky, 128), 0)
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
            yl = by - ys  # (TR, 128); in-window lanes fall in [0, ky)
            out = list(accs)
            for orow in range(tr):
                in_w = in_win[orow].reshape(1, 128)
                yl_r = yl[orow].reshape(1, 128)
                xl = jnp.clip(bx[orow] - xs, 0, KX - 1).reshape(1, 128)
                ylo = jnp.clip(jnp.min(jnp.where(in_w, yl_r, ky - 1)), 0, ky - kg)
                flat = band[pl.ds(ylo, kg)].reshape(kg * fourC, KX).astype(jnp.float32)
                idx = jnp.broadcast_to(xl, (kg * fourC, 128)).astype(jnp.int32)
                g = jnp.take_along_axis(flat, idx, axis=1).reshape(kg, fourC, KX)
                sel = in_w & ((yl_r - ylo) == riota_g)  # (kg, 128)
                g32 = jnp.where(sel[:, None, :], g, 0).astype(jnp.float32)
                acc = out[orow] + jnp.sum(g32, axis=0)

                resid = in_w & ((yl_r < ylo) | (yl_r >= ylo + kg))

                def slow(_, xl=xl, yl_r=yl_r, resid=resid, acc=acc):
                    flat_f = band[...].reshape(ky * fourC, KX).astype(jnp.float32)
                    idx_f = jnp.broadcast_to(xl, (ky * fourC, 128)).astype(jnp.int32)
                    gf = jnp.take_along_axis(flat_f, idx_f, axis=1).reshape(ky, fourC, KX)
                    sel_f = resid & (yl_r == riota_f)
                    return acc + jnp.sum(
                        jnp.where(sel_f[:, None, :], gf, 0).astype(jnp.float32), axis=0
                    )

                out[orow] = jax.lax.cond(jnp.any(resid), slow, lambda _, acc=acc: acc, None)
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


def warp_pallas_v5(
    src_feat: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    ky: int = KY,
    kg: int = 2,
    tr: int = TR,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Sliced-band warp: v3's tall band + one DMA per window, per-output-row
    ``kg``-row dynamic slice gathers. Same contract as :func:`warp_pallas`."""
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

    kernel = functools.partial(
        _warp_kernel_v5, H=H, W=W, Hpad=Hp, C=C, ky=ky, kg=kg, tr=tr, dtype=dtype
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
