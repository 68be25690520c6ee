"""Pallas TPU 3x3x3 conv (+ folded BN + ReLU) on W-minor cost volumes.

The cost-reg UNet's full-resolution entry conv (CostRegNet conv0, reference
models/module.py:270-315) is the single most expensive regularization layer.
The XLA route runs it via the (h, w) space-to-depth form, which fixes the
128-lane channel padding but inflates contraction FLOPs ~7.1x (3x3x3 taps
replicated across b² phases). This kernel computes the conv at its TRUE tap
count on the MXU instead:

- the (C, D, h, w) bf16 volume is zero-padded by (1, 1) in (D, h) and
  materialized as THREE x-shifted copies (dx = -1, 0, +1) by XLA — each
  copy's kernel window is then a 128-aligned lane slice, the only kind
  Mosaic can DMA, and no in-kernel lane shift is needed at all (Mosaic's
  ``tpu.dynamic_rotate`` is unimplemented for non-32-bit data, so the
  original lane-roll design failed remote compile — ablate r3 log). The
  two extra copies cost ~2 XLA passes over the volume; per-tile DMA bytes
  are unchanged (3 x 128-lane windows vs one 384-lane window);
- each grid step DMAs a (3, C, kd+2, tr+8, 128) block — the h window is
  tr+8 rows at offset y·tr because Mosaic requires HBM slice sizes AND
  offsets in the sublane dim to be 8-aligned ("Slice shape along dimension
  3 must be aligned to tiling (8)", r3 remote-compile log; tr+2 rows fail).
  The volume's h is therefore padded (1, 7) instead of (1, 1); the 6 junk
  rows per window are zeros and cost ~(tr+8)/(tr+2) extra DMA bytes;
- per depth-out, ONE (3O, 9C) @ (9C, (tr+8)·128) MXU matmul computes all
  27 taps: the three y-taps ride the M dim (O=8 alone would waste 16x of
  the 128-row systolic array), x-shifts and depth taps the K dim. The
  operand is built from ZERO-sublane-offset lane-merged views of the block
  (the proven-legal (C, n, 128) -> (C, n·128) merge; sublane-offset views
  never appear, so no relayout risk). The epilogue combines the three
  per-dy row groups with per-row 128-aligned lane slices:
  out[r] = Σ_dy acc[dy·O:, (r+dy)·128 : (r+dy+1)·128];
- bias add + ReLU fuse into the epilogue; eval BatchNorm is an affine map,
  folded into (weight, bias) by :func:`fold_bn_into_conv3d` beforehand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3d_front",
    "conv3d_front_fused",
    "conv3d_down",
    "fold_bn_into_conv3d",
]


def fold_bn_into_conv3d(conv_p, bn_p, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm3d into the conv: returns (w, bias) with
    ``w (3,3,3,C,O)`` scaled per output channel and bias absorbing the BN
    shift (reference module.py:80-121 Conv3d+BN semantics, bias-free conv)."""
    w = conv_p["weight"]
    gamma = bn_p["weight"]
    beta = bn_p["bias"]
    mean = bn_p["running_mean"]
    var = bn_p["running_var"]
    inv = gamma / jnp.sqrt(var.astype(jnp.float32) + eps)
    w_f = w * inv  # (..., O) broadcast over the last axis
    b_f = beta - mean * inv
    return w_f, b_f


def _conv3d_kernel(wmat_ref, bias_ref, vol_hbm, out_ref, block, sem,
                   *, C, O, kd, tr, dtype, stride=1):
    """One (kd, tr, 128) output tile: double-buffered haloed-block DMA,
    nine (3 x-shifts x 3 y-taps) matmuls per depth-out over zero-offset
    lane-merged (3C, (stride*tr+8)*128) views, combined by sublane-shifted
    per-row lane slices in the epilogue.

    With ``stride == 2`` the same structure computes the stride-(2,2,2)
    downsampling conv: the DMA window covers 2x the output tile's extent in
    (depth, rows), the x-stride is pre-resolved on the host (the three
    "shift" streams are even/odd lane de-interleaves, so out lane k reads
    stream lane k directly), and the epilogue picks acc columns at
    (2*row + dy) instead of (row + dy). The matmul N dim still spans the
    full input-resolution window (each dy group uses ~half its columns) —
    wasted MXU columns, but the kernel is DMA bound at these channel counts.

    The grid runs x innermost; each step waits on its own pre-issued block
    and immediately issues the NEXT step's DMA into the other buffer, so the
    transfer hides behind this step's matmuls (only the ~1 us issue cost is
    serial)."""
    od_t = pl.program_id(0)
    yt = pl.program_id(1)
    xt = pl.program_id(2)
    n_od = pl.num_programs(0)
    n_y = pl.num_programs(1)
    n_x = pl.num_programs(2)
    step = (od_t * n_y + yt) * n_x + xt
    slot = jax.lax.rem(step, 2)
    trh = stride * tr + 8  # 8-aligned haloed window

    def mk_copy(od_i, y_i, x_i, s):
        return pltpu.make_async_copy(
            vol_hbm.at[
                :,
                :,
                pl.ds(od_i * stride * kd, stride * kd + 2),
                pl.ds(y_i * stride * tr, trh),
                pl.ds(x_i * 128, 128),
            ],
            block.at[s],
            sem.at[s],
        )

    @pl.when(step == 0)
    def _():
        mk_copy(od_t, yt, xt, 0).start()

    mk_copy(od_t, yt, xt, slot).wait()

    @pl.when(step + 1 < n_od * n_y * n_x)
    def _():
        nxt = step + 1
        x2 = jax.lax.rem(nxt, n_x)
        y2 = jax.lax.rem(nxt // n_x, n_y)
        od2 = nxt // (n_x * n_y)
        mk_copy(od2, y2, x2, 1 - slot).start()

    blk0 = block[slot]  # (3, C, stride*kd+2, trh, 128) bf16, axis 0 = dx

    L = trh * 128
    for od in range(kd):
        # one MXU pass per depth-out: all 27 taps fold into a single
        # (3O, 9C) @ (9C, L) matmul — the three y-taps ride the M dim
        # (O=8 alone wastes 16x of the 128-row systolic array), the x-shifts
        # and depth taps the K dim. Operand rows are zero-sublane-offset
        # lane-merged views (the only proven-safe kind).
        a = jnp.concatenate(
            [
                blk0[sx, :, stride * od + dd].reshape(C, L)
                for sx in range(3)
                for dd in range(3)
            ],
            axis=0,
        )  # (9C, L), rows ordered (sx, dd, c)
        acc = jax.lax.dot_general(
            wmat_ref[...], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3O, L), rows ordered (dy, o)
        accs = [acc[dy * O:(dy + 1) * O] for dy in range(3)]
        # out row r reads block rows stride*r+dy: 128-aligned lane slices
        for orow in range(tr):
            r = stride * orow
            y = (
                accs[0][:, r * 128:(r + 1) * 128]
                + accs[1][:, (r + 1) * 128:(r + 2) * 128]
                + accs[2][:, (r + 2) * 128:(r + 3) * 128]
                + bias_ref[...]
            )
            out_ref[:, od, orow, :] = jnp.maximum(y, 0.0).astype(dtype)


def conv3d_front(
    vol: jnp.ndarray,  # (C, D, h, w) W-minor volume
    weight: jnp.ndarray,  # (3, 3, 3, C, O) — (kd, ky, kx, in, out), BN folded
    bias: jnp.ndarray,  # (O,)
    kd: int = 4,
    tr: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3x3 same-padded conv + bias + ReLU: ``(C, D, h, w) -> (O, D, h, w)``.

    Equals ``relu(conv3d(vol, weight) + bias)`` with zero padding (the
    reference's Conv3d(padding=1)). Requires D % kd == 0 and tr % 8 == 0
    (the DMA row offset y*tr must be 8-aligned on real compiles, same Mosaic
    constraint conv3d_down documents); h is padded up to the tile grid (junk
    rows are zero and sliced off)."""
    C, D, h, w = vol.shape
    O = weight.shape[-1]
    assert weight.shape == (3, 3, 3, C, O), weight.shape
    assert D % kd == 0, (D, kd)
    assert tr % 8 == 0, tr
    n_y = -(-h // tr)
    hp = tr * n_y + 8  # the last window reads rows tr*(n_y-1) .. hp-1
    Wp = ((w + 127) // 128) * 128
    # (1,1) halo in D, (1, hp-h-1) in h — the DMA window is tr+8 rows at
    # y*tr (Mosaic sublane slices must be 8-aligned in size AND offset); the
    # x halo is realized as three pre-shifted copies so every kernel DMA
    # window is 128-lane-aligned
    volp = jnp.pad(
        vol.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, hp - h - 1), (0, Wp - w))
    )
    z = jnp.zeros_like(volp[..., :1])
    vol3 = jnp.stack(
        [
            jnp.concatenate([z, volp[..., :-1]], axis=-1),  # dx=-1: v[x-1]
            volp,
            jnp.concatenate([volp[..., 1:], z], axis=-1),  # dx=+1: v[x+1]
        ]
    )  # (3, C, D+2, h+8, Wp)
    # weights as ONE (3O, 9C) matrix: rows (dy, o), columns (sx, dd, c)
    wmat = jnp.transpose(weight.astype(jnp.bfloat16), (1, 4, 2, 0, 3)).reshape(
        3 * O, 9 * C
    )
    dtype = vol.dtype

    kernel = functools.partial(_conv3d_kernel, C=C, O=O, kd=kd, tr=tr, dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(D // kd, n_y, Wp // 128),
        in_specs=[
            pl.BlockSpec((3 * O, 9 * C), lambda d, y, x: (0, 0)),
            pl.BlockSpec((O, 1), lambda d, y, x: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((O, kd, tr, 128), lambda d, y, x: (0, d, y, x)),
        out_shape=jax.ShapeDtypeStruct((O, D, tr * n_y, Wp), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, C, kd + 2, tr + 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wmat, bias.astype(jnp.float32).reshape(O, 1), vol3)
    return out[:, :, :h, :w]


def _lane_roll(v, shift, interpret):
    """Static lane rotate of ``v (..., 128)`` fp32. Mosaic's tpu.dynamic_rotate
    is implemented for 32-bit data only (bf16 rolls fail remote compile —
    ablate r3 log), so callers roll fp32 and cast after."""
    if interpret:
        return jnp.roll(v, shift, axis=v.ndim - 1)
    # tpu.dynamic_rotate is modular but rejects negative literals
    return pltpu.roll(v, shift % v.shape[-1], v.ndim - 1)


def _conv3d_fused_kernel(
    wmat0_ref, bias0_ref, wmat1_ref, bias1_ref, dec0_ref, dec1_ref,
    vol_hbm, out0_ref, out1_ref, block, patch, sem,
    *, C, O0, O1, kd, tr, dtype, interpret,
):
    """One grid step: the conv0 tile (kd, tr, 128) PLUS the stride-2 conv1
    tile (kd/2, tr/2, 64 lanes) computed from conv0 values still in VMEM.

    conv0 is evaluated on a haloed patch — kd+1 depths x tr+2 rows (one
    extra below in depth/rows vs the emitted tile; the DMA window and the
    host padding are one deeper/higher to feed it) — so conv1's ±1 taps
    never cross the tile except through one lane column, which comes from
    the previous x step's patch (x-parity double buffer; the grid runs x
    innermost). conv1's x taps are fp32 lane rolls (32-bit rotates are the
    implemented kind), its stride-2 lane decimation is an exact one-hot
    matmul into the even/odd half of the 128-lane out block, accumulated
    across the two x steps that share the block.

    Boundary semantics: conv1 must see conv0's ZERO padding, not conv0
    applied to padded input — only the "< 0" edges need masking (top patch
    row at y==0, first patch depth at od==0, the x==0 lane carry): valid
    conv1 outputs never read conv0 at row >= h / depth >= D / lane >= w
    (all even), and padded-grid junk rows/lanes only feed junk outputs that
    the caller crops."""
    od_t = pl.program_id(0)
    yt = pl.program_id(1)
    xt = pl.program_id(2)
    n_od = pl.num_programs(0)
    n_y = pl.num_programs(1)
    n_x = pl.num_programs(2)
    step = (od_t * n_y + yt) * n_x + xt
    slot = jax.lax.rem(step, 2)
    xpar = jax.lax.rem(xt, 2)

    def mk_copy(od_i, y_i, x_i, s):
        return pltpu.make_async_copy(
            vol_hbm.at[
                :, :,
                pl.ds(od_i * kd, kd + 3),
                pl.ds(y_i * tr, tr + 8),
                pl.ds(x_i * 128, 128),
            ],
            block.at[s],
            sem.at[s],
        )

    @pl.when(step == 0)
    def _():
        mk_copy(od_t, yt, xt, 0).start()

    mk_copy(od_t, yt, xt, slot).wait()

    @pl.when(step + 1 < n_od * n_y * n_x)
    def _():
        nxt = step + 1
        x2 = jax.lax.rem(nxt, n_x)
        y2 = jax.lax.rem(nxt // n_x, n_y)
        od2 = nxt // (n_x * n_y)
        mk_copy(od2, y2, x2, 1 - slot).start()

    blk0 = block[slot]  # (3, C, kd+3, tr+8, 128), axis 0 = dx
    L = (tr + 8) * 128

    # ---- conv0 on the haloed patch: local depth ld = global od*kd-1+ld ----
    # Patch values are bf16-rounded (conv1 must consume what the XLA route
    # would read back from HBM) and zeroed on the <0 edges.
    top_row_ok = jnp.where(yt == 0, 0.0, 1.0).astype(jnp.float32)
    top_dep_ok = jnp.where(od_t == 0, 0.0, 1.0).astype(jnp.float32)
    for ld in range(kd + 1):
        a = jnp.concatenate(
            [
                blk0[sx, :, ld + dd].reshape(C, L)
                for sx in range(3)
                for dd in range(3)
            ],
            axis=0,
        )
        acc = jax.lax.dot_general(
            wmat0_ref[...], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3O0, L)
        accs = [acc[dy * O0:(dy + 1) * O0] for dy in range(3)]
        for rr in range(tr + 2):
            y = (
                accs[0][:, rr * 128:(rr + 1) * 128]
                + accs[1][:, (rr + 1) * 128:(rr + 2) * 128]
                + accs[2][:, (rr + 2) * 128:(rr + 3) * 128]
                + bias0_ref[...]
            )
            y = jnp.maximum(y, 0.0).astype(jnp.bfloat16).astype(jnp.float32)
            if rr == 0:
                y = y * top_row_ok
            if ld == 0:
                y = y * top_dep_ok
            patch[slot, ld, :, rr, :] = y
            if 1 <= ld <= kd and 1 <= rr <= tr:
                out0_ref[:, ld - 1, rr - 1, :] = y.astype(dtype)

    # ---- conv1 from the patch: out depth od1, rows tr/2, 64 lanes ----
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (O0, tr + 2, 128), 2) == 0
    dec = (
        dec0_ref[...] * (1.0 - xpar.astype(jnp.float32))
        + dec1_ref[...] * xpar.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    tr2 = tr // 2
    Lp = (tr + 2) * 128
    for od1 in range(kd // 2):
        pieces = []
        for dx1 in range(3):
            for dd1 in range(3):
                cur = patch[slot, 2 * od1 + dd1]  # (O0, tr+2, 128) f32
                if dx1 == 0:
                    # lane 0 carries the previous x tile's lane 127; at
                    # x == 0 it is conv0's zero padding. SELECT (not scale):
                    # the x==0 prev buffer is uninitialized and NaN*0 = NaN.
                    prev = patch[1 - slot, 2 * od1 + dd1]
                    s = _lane_roll(cur, 1, interpret)
                    fix = jnp.where(xt > 0, _lane_roll(prev, 1, interpret), 0.0)
                    s = jnp.where(lane0, fix, s)
                elif dx1 == 1:
                    s = cur
                else:
                    s = _lane_roll(cur, -1, interpret)  # lane 127 junk, never
                    # selected: the decimation rows are even lanes only
                s = s.astype(jnp.bfloat16)
                pieces.append(s.reshape(O0, Lp))
        a1 = jnp.concatenate(pieces, axis=0)  # (9*O0, Lp), rows (dx1, dd1, c0)
        acc1 = jax.lax.dot_general(
            wmat1_ref[...], a1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*O1, Lp), rows (dy1, o1)
        acs = [acc1[dy * O1:(dy + 1) * O1] for dy in range(3)]
        rows = []
        for r1 in range(tr2):
            v = (
                acs[0][:, (2 * r1) * 128:(2 * r1 + 1) * 128]
                + acs[1][:, (2 * r1 + 1) * 128:(2 * r1 + 2) * 128]
                + acs[2][:, (2 * r1 + 2) * 128:(2 * r1 + 3) * 128]
                + bias1_ref[...]
            )
            rows.append(jnp.maximum(v, 0.0).astype(jnp.bfloat16))
        valm = jnp.concatenate(rows, axis=0)  # (tr2*O1, 128), rows (r1, o1)
        decd = jax.lax.dot_general(
            valm, dec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # exact one-hot selection into the xpar half
        decd = decd.reshape(tr2, O1, 128).astype(dtype)

        @pl.when(xpar == 0)
        def _(od1=od1, decd=decd):
            for r1 in range(tr2):
                out1_ref[:, od1, r1, :] = decd[r1]

        @pl.when(xpar == 1)
        def _(od1=od1, decd=decd):
            for r1 in range(tr2):
                out1_ref[:, od1, r1, :] = out1_ref[:, od1, r1, :] + decd[r1]


def conv3d_front_fused(
    vol: jnp.ndarray,  # (C, D, h, w) W-minor volume
    weight0: jnp.ndarray,  # (3, 3, 3, C, O0), BN folded
    bias0: jnp.ndarray,  # (O0,)
    weight1: jnp.ndarray,  # (3, 3, 3, O0, O1), BN folded
    bias1: jnp.ndarray,  # (O1,)
    kd: int = 4,
    tr: int = 16,
    interpret: bool = False,
):
    """conv0 AND the stride-2 conv1 in one kernel pass over the volume.

    Returns ``(out0, out1)`` = (``relu(conv3d(vol, w0) + b0)`` at (O0, D, h,
    w), ``relu(conv3d(out0, w1, stride=2) + b1)`` at (O1, D/2, h/2, w/2)) —
    the CostRegNet conv0+conv1 pair (reference models/module.py:271-276).
    Rationale: the standalone conv1 kernel (conv3d_down) measured +18.4
    ms/map because its three de-interleave streams re-read conv0's full-res
    output ~4.5x from HBM (STATUS r3); fused, conv1 reads conv0 from VMEM
    and the s2d conv1's full-res volume read + 7x padded-tap contraction
    disappear. Requires D % kd == 0, kd even, tr in (16, 32) (the conv1 out
    block's sublane dim tr/2 must be 8-aligned), D, h, w even."""
    C, D, h, w = vol.shape
    O0 = weight0.shape[-1]
    O1 = weight1.shape[-1]
    assert weight0.shape == (3, 3, 3, C, O0), weight0.shape
    assert weight1.shape == (3, 3, 3, O0, O1), weight1.shape
    assert D % kd == 0 and kd % 2 == 0, (D, kd)
    assert tr % 16 == 0, tr  # out1 sublane tr/2 must be a multiple of 8
    assert D % 2 == 0 and h % 2 == 0 and w % 2 == 0, (D, h, w)
    n_y = -(-h // tr)
    hp = tr * n_y + 8  # window rows [y*tr, y*tr+tr+8) in padded coords
    Wp = ((w + 127) // 128) * 128
    n_x = Wp // 128
    # (2, 1) halo in D and rows: the window must feed conv0 one row/depth
    # ABOVE the emitted tile (patch local index 0)
    volp = jnp.pad(
        vol.astype(jnp.bfloat16), ((0, 0), (2, 1), (2, hp - h - 2), (0, Wp - w))
    )
    z = jnp.zeros_like(volp[..., :1])
    vol3 = jnp.stack(
        [
            jnp.concatenate([z, volp[..., :-1]], axis=-1),
            volp,
            jnp.concatenate([volp[..., 1:], z], axis=-1),
        ]
    )  # (3, C, D+3, hp, Wp)
    wmat0 = jnp.transpose(weight0.astype(jnp.bfloat16), (1, 4, 2, 0, 3)).reshape(
        3 * O0, 9 * C
    )
    wmat1 = jnp.transpose(weight1.astype(jnp.bfloat16), (1, 4, 2, 0, 3)).reshape(
        3 * O1, 9 * O0
    )
    # dec_a[i, 64a+j] = [i == 2j]: even-lane decimation into half ``a``
    ii = jnp.arange(128)[:, None]
    jj = jnp.arange(128)[None, :]
    dec0 = (ii == 2 * jj).astype(jnp.bfloat16)  # cols >= 64 never match
    dec1 = ((ii == 2 * (jj - 64)) & (jj >= 64)).astype(jnp.bfloat16)
    dtype = vol.dtype
    Do, ho, wo = D // 2, h // 2, w // 2
    n_x1 = -(-n_x // 2)

    kernel = functools.partial(
        _conv3d_fused_kernel, C=C, O0=O0, O1=O1, kd=kd, tr=tr, dtype=dtype,
        interpret=interpret,
    )
    out0, out1 = pl.pallas_call(
        kernel,
        grid=(D // kd, n_y, n_x),
        in_specs=[
            pl.BlockSpec((3 * O0, 9 * C), lambda d, y, x: (0, 0)),
            pl.BlockSpec((O0, 1), lambda d, y, x: (0, 0)),
            pl.BlockSpec((3 * O1, 9 * O0), lambda d, y, x: (0, 0)),
            pl.BlockSpec((O1, 1), lambda d, y, x: (0, 0)),
            pl.BlockSpec((128, 128), lambda d, y, x: (0, 0)),
            pl.BlockSpec((128, 128), lambda d, y, x: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((O0, kd, tr, 128), lambda d, y, x: (0, d, y, x)),
            pl.BlockSpec(
                (O1, kd // 2, tr // 2, 128), lambda d, y, x: (0, d, y, x // 2)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((O0, D, tr * n_y, Wp), dtype),
            jax.ShapeDtypeStruct((O1, Do, (tr // 2) * n_y, 128 * n_x1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, C, kd + 3, tr + 8, 128), jnp.bfloat16),
            pltpu.VMEM((2, kd + 1, O0, tr + 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wmat0, bias0.astype(jnp.float32).reshape(O0, 1),
      wmat1, bias1.astype(jnp.float32).reshape(O1, 1), dec0, dec1, vol3)
    return out0[:, :, :h, :w], out1[:, :, :ho, :wo]


def conv3d_down(
    vol: jnp.ndarray,  # (C, D, h, w) W-minor volume, D/h/w even
    weight: jnp.ndarray,  # (3, 3, 3, C, O) — (kd, ky, kx, in, out), BN folded
    bias: jnp.ndarray,  # (O,)
    kd: int = 4,
    tr: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-(2,2,2) 3x3x3 conv + bias + ReLU: ``(C,D,h,w) -> (O,D/2,h/2,w/2)``.

    Equals ``relu(conv3d(vol, weight, stride=2) + bias)`` with zero padding
    — the CostRegNet downsampling convs (reference models/module.py:276-283,
    Conv3d stride=2 pad=1). Same kernel as :func:`conv3d_front` at stride=2;
    the x-stride is resolved on the host: out lane k needs padded inputs
    vp[2k + dx], so the three lane-aligned streams are the even lanes, the
    odd lanes, and the even lanes shifted by one (stream s lane k =
    vp[2k + s] exactly) — a lane de-interleave instead of conv3d_front's
    three x-shifted copies, same total bytes. Requires (D/2) % kd == 0 and
    tr % 8 == 0 (the out block's sublane dim must tile by 8, and the input
    window offset 2*tr*y must be 8-aligned)."""
    C, D, h, w = vol.shape
    O = weight.shape[-1]
    assert weight.shape == (3, 3, 3, C, O), weight.shape
    assert D % 2 == 0 and h % 2 == 0 and w % 2 == 0, (D, h, w)
    Do, ho, wo = D // 2, h // 2, w // 2
    assert Do % kd == 0 and tr % 8 == 0, (Do, kd, tr)
    n_y = -(-ho // tr)  # out rows padded up to the tile grid
    hp = 2 * tr * n_y + 8  # last window reads rows 2*tr*(n_y-1) .. hp-1
    Wp2 = ((wo + 127) // 128) * 128
    v = jnp.pad(
        vol.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, hp - h - 1), (1, 1))
    )  # padded: vp[d+1, y+1, x+1] = vol[d, y, x]
    ev = v[..., 0::2]  # (C, D+2, hp, wo+1): vp[2j]
    od = v[..., 1::2]  # vp[2j+1]
    xpad = ((0, 0), (0, 0), (0, 0), (0, Wp2 - wo))
    vol3 = jnp.stack(
        [
            jnp.pad(ev[..., :wo], xpad),  # dx=0: vp[2k]
            jnp.pad(od[..., :wo], xpad),  # dx=1: vp[2k+1]
            jnp.pad(ev[..., 1:], xpad),  # dx=2: vp[2k+2]
        ]
    )  # (3, C, D+2, hp, Wp2)
    wmat = jnp.transpose(weight.astype(jnp.bfloat16), (1, 4, 2, 0, 3)).reshape(
        3 * O, 9 * C
    )
    dtype = vol.dtype

    kernel = functools.partial(
        _conv3d_kernel, C=C, O=O, kd=kd, tr=tr, dtype=dtype, stride=2
    )
    out = pl.pallas_call(
        kernel,
        grid=(Do // kd, n_y, Wp2 // 128),
        in_specs=[
            pl.BlockSpec((3 * O, 9 * C), lambda d, y, x: (0, 0)),
            pl.BlockSpec((O, 1), lambda d, y, x: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((O, kd, tr, 128), lambda d, y, x: (0, d, y, x)),
        out_shape=jax.ShapeDtypeStruct((O, Do, tr * n_y, Wp2), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, C, 2 * kd + 2, 2 * tr + 8, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wmat, bias.astype(jnp.float32).reshape(O, 1), vol3)
    return out[:, :, :ho, :wo]
