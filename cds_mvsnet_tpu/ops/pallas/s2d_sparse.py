"""Block-sparse s2d convolution: skip the zero weight tiles on the MXU.

The s2d weight rescatter (ops/s2d.py) fixes the 128-lane channel padding but
makes the conv's DENSE contraction mostly zeros: at b=8 the (kp², b²I, b²O)
s2d weights of the feature net's dynamic convs are 72-81% zero at 128x128
tile granularity (banded (block-phase, tap) structure), and XLA multiplies
all of them — measured at the full dense-MXU rate (tools/bench_feature3.py:
every lower-b reformulation with fewer true FLOPs LOSES because XLA's fat
b=8 conv runs ~4x more efficient per padded FLOP). This kernel runs the SAME
b=8 contraction but iterates only the nonzero (tap, K-tile, M-tile) triples,
which the tap maps make static (the zero pattern depends on the rescatter
geometry, not the weight values).

Reference scope: models/module.py:28-77 + dynamic_conv.py:81-122 (the
DynamicConv branch convs this accelerates); the s2d formulation itself has
no reference counterpart.

Geometry (one kernel call = ALL branches of one layer):

- the (N, H', W', C) s2d activation is materialized by XLA as ``kpw``
  x-shifted streams, flattened to (N, kpw, SR, Cp) with one block-row of
  zeros above/below so a y-tap is a +dy·W' FLAT-row offset — legal DMA
  offsets because W' % 8 == 0 at every operating point (full/half/quarter
  grids are all W/8 = 144 at 1152-wide inputs);
- the grid runs (N, row-tiles); each step issues ONE windowed DMA of
  (kpw, R + (kph-1)·W', Cp) rows, double-buffered like ops/pallas/conv3d.py;
- per output M-tile, the static nonzero pair list drives
  ``acc += A[sx][dy·W' : dy·W'+R, kt·128:(kt+1)·128] @ tile`` — every slice
  is 128-lane-aligned / 8-sublane-aligned and fully static;
- fp32 accumulation, bf16 output (the XLA conv route accumulates f32 too).

Branches with different kernel sizes share the union tap grid (e.g. out3's
k=1 branch uses only the center tap of the k=3 grid). Branch m-columns are
padded to 128 each so downstream per-branch lane slices stay aligned.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..s2d import _s2d_weights, _tap_maps

__all__ = ["plan_sparse_layer", "pack_tiles", "sparse_s2d_conv"]


@dataclass(frozen=True)
class SparsePlan:
    """Static geometry of one fused block-sparse layer."""
    b_in: int
    b_out: int
    stride: int
    C: int                      # true s2d in-channels (b_in² · I)
    Cp: int                     # padded to 128
    kph: int                    # union y-tap count
    kpw: int                    # union x-tap count
    klo_h: int
    klo_w: int
    m_offsets: tuple            # per-branch output lane offset (128-padded)
    m_total: int
    # per pair: (m_tile, x_tap, y_tap, k_tile); sorted by m_tile
    pairs: tuple = field(repr=False)
    # per pair: (branch, tap_h, tap_w, k_tile_local) to gather the weight tile
    src: tuple = field(repr=False)
    branch_shapes: tuple = ()   # (k, I, O) per branch, for checking


def _branch_geometry(k: int, pad: int, stride: int, b_in: int, b_out: int):
    kp_h, klo_h, _ = _tap_maps(k, pad, stride, b_in, b_out)
    kp_w, klo_w, _ = _tap_maps(k, pad, stride, b_in, b_out)
    return kp_h, klo_h, kp_w, klo_w


def _s2d_weights_np(w: np.ndarray, b_in: int, b_out: int, stride: int, pad: int):
    """Pure-numpy twin of ops.s2d._s2d_weights — the plan is built at trace
    time, where jnp ops would be staged into the jit (omnistaging) instead of
    evaluated; numpy keeps the zero-pattern concrete."""
    kh, kw, I, O = w.shape
    kph, _, dy_idx = _tap_maps(kh, pad, stride, b_in, b_out)
    kpw, _, dx_idx = _tap_maps(kw, pad, stride, b_in, b_out)
    wz = np.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero tap at index k
    wp = wz[
        dy_idx[:, None, :, None, :, None],
        dx_idx[None, :, None, :, None, :],
    ]  # (kph, kpw, oy, ox, by, bx, I, O)
    wp = np.transpose(wp, (0, 1, 4, 5, 6, 2, 3, 7))
    return wp.reshape(kph, kpw, b_in * b_in * I, b_out * b_out * O)


@functools.lru_cache(maxsize=None)
def plan_sparse_layer(branches: tuple, b_in: int, stride: int = 1) -> SparsePlan:
    """Build the static plan for one layer (cached — geometry only).

    Args:
      branches: tuple of (k, I, O, pad) — every branch shares the same input.
      b_in: input s2d block size; output block = b_in // stride.
    """
    b_out = b_in // stride
    C = b_in * b_in * branches[0][1]
    for k, I, O, pad in branches:
        assert b_in * b_in * I == C, "branches must share the input"
    Cp = -(-C // 128) * 128

    geos = [_branch_geometry(k, pad, stride, b_in, b_out) for k, _, _, pad in branches]
    klo_h = min(g[1] for g in geos)
    khi_h = max(g[1] + g[0] - 1 for g in geos)
    klo_w = min(g[3] for g in geos)
    khi_w = max(g[3] + g[2] - 1 for g in geos)
    kph = khi_h - klo_h + 1
    kpw = khi_w - klo_w + 1

    m_offsets = []
    m_off = 0
    pairs = []
    src = []
    for bi, ((k, I, O, pad), (gh, glo_h, gw, glo_w)) in enumerate(zip(branches, geos)):
        m_offsets.append(m_off)
        M = b_out * b_out * O
        # zero pattern from a ones-weight (value-independent)
        wn = _s2d_weights_np(
            np.ones((k, k, I, O), np.float32), b_in, b_out, stride, pad
        )  # (gh, gw, C, M)
        n_kt = -(-C // 128)
        n_mt = -(-M // 128)
        for ty in range(gh):
            for tx in range(gw):
                for kt in range(n_kt):
                    blk_k = wn[ty, tx, kt * 128:(kt + 1) * 128]
                    for mt in range(n_mt):
                        if np.any(blk_k[:, mt * 128:(mt + 1) * 128] != 0):
                            pairs.append((
                                m_off // 128 + mt,
                                ty + glo_h - klo_h,
                                tx + glo_w - klo_w,
                                kt,
                            ))
                            src.append((bi, ty, tx, kt, mt))
        m_off += n_mt * 128
    order = sorted(range(len(pairs)), key=lambda i: pairs[i])
    return SparsePlan(
        b_in=b_in, b_out=b_out, stride=stride, C=C, Cp=Cp,
        kph=kph, kpw=kpw, klo_h=klo_h, klo_w=klo_w,
        m_offsets=tuple(m_offsets), m_total=m_off,
        pairs=tuple(pairs[i] for i in order),
        src=tuple(src[i] for i in order),
        branch_shapes=tuple((k, I, O) for k, I, O, _ in branches),
    )


def pack_tiles(plan: SparsePlan, weights, dtype=jnp.bfloat16):
    """Gather the nonzero 128x128 weight tiles: (P, 128, 128) ``dtype``.

    ``weights``: per-branch plain conv weights (k, k, I, O) (traced OK — the
    tile INDICES are static, only values flow through)."""
    s2d_w = []
    for (k, I, O), w in zip(plan.branch_shapes, weights):
        pad = (k - 1) // 2
        wp, _ = _s2d_weights(
            w.astype(dtype), plan.b_in, plan.b_out, plan.stride, pad, pad
        )
        # pad K and M up to 128 multiples
        gh, gw, K, M = wp.shape
        Kp = -(-K // 128) * 128
        Mp = -(-M // 128) * 128
        s2d_w.append(jnp.pad(wp, ((0, 0), (0, 0), (0, Kp - K), (0, Mp - M))))
    tiles = [
        jax.lax.slice(
            s2d_w[bi][ty, tx], (kt * 128, mt * 128), (kt * 128 + 128, mt * 128 + 128)
        )
        for bi, ty, tx, kt, mt in plan.src
    ]
    return jnp.stack(tiles)


def _sparse_kernel(tiles_ref, str_hbm, out_ref, band, sem, *, plan, R, Wr, dtype):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    n = pl.program_id(0)
    s = pl.program_id(1)
    slot = jax.lax.rem(step, 2)
    halo = (plan.kph - 1) * Wr

    def mk_copy(n_i, s_i, sl):
        return pltpu.make_async_copy(
            str_hbm.at[n_i, :, pl.ds(s_i * R, R + halo), :],
            band.at[sl],
            sem.at[sl],
        )

    @pl.when(step == 0)
    def _():
        mk_copy(n, s, 0).start()

    mk_copy(n, s, slot).wait()

    @pl.when(step + 1 < pl.num_programs(0) * pl.num_programs(1))
    def _():
        nxt = step + 1
        s2 = jax.lax.rem(nxt, pl.num_programs(1))
        n2 = nxt // pl.num_programs(1)
        mk_copy(n2, s2, 1 - slot).start()

    blk = band[slot]  # (kpw, R + halo, Cp)

    # static pair loop, grouped by m_tile (pairs are sorted)
    p = 0
    P = len(plan.pairs)
    for mt in range(plan.m_total // 128):
        acc = jnp.zeros((R, 128), jnp.float32)
        while p < P and plan.pairs[p][0] == mt:
            _, dy, dx, kt = plan.pairs[p]
            a = blk[dx, dy * Wr: dy * Wr + R, kt * 128:(kt + 1) * 128]
            acc = acc + jax.lax.dot_general(
                a, tiles_ref[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p += 1
        out_ref[0, :, mt * 128:(mt + 1) * 128] = acc.astype(dtype)


def _choose_R(plan: SparsePlan, Wp: int, budget_bytes: int = 12 << 20) -> int:
    """Largest row-tile fitting VMEM: double-buffered band + out block +
    the weight tiles (index-map-constant, but budgeted double to be safe)."""
    halo = (plan.kph - 1) * Wp
    tiles_b = 2 * len(plan.pairs) * 128 * 128 * 2
    for R in (512, 256, 128, 64):
        band_b = 2 * plan.kpw * (R + halo) * plan.Cp * 2
        out_b = 2 * R * plan.m_total * 2
        if tiles_b + band_b + out_b <= budget_bytes:
            return R
    return 64


def sparse_s2d_conv(
    x_s2d: jnp.ndarray,      # (N, H', W', C)
    tiles: jnp.ndarray,      # (P, 128, 128) from pack_tiles
    plan: SparsePlan,
    R: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """All branches of one layer: (N, H', W', C) -> (N, H', W', m_total).

    Branch bi's output occupies lanes [plan.m_offsets[bi], +b_out²·O) and
    equals ``s2d_conv(x_s2d, w_bi)`` (bias-free) to bf16/fp32 rounding."""
    N, Hp, Wp, C = x_s2d.shape
    if R is None:
        R = _choose_R(plan, Wp)
    assert C == plan.C, (C, plan.C)
    assert Wp % 8 == 0, Wp  # y-tap row offsets dy·W' must be 8-aligned
    HW = Hp * Wp
    steps = -(-HW // R)
    SR = steps * R + (plan.kph - 1) * Wp  # window overrun pad

    x = x_s2d.astype(jnp.bfloat16)
    if plan.Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, plan.Cp - C)))
    # x-shifted streams with 2-D zero pad, then flatten + y pad: stream sx,
    # flat row Y·W'+X (after the top pad) holds x[Y, X + klo_w + sx], so the
    # kernel's +dy·W' row offset reads x[Y + klo_h + dy, X + klo_w + sx].
    shift_list = []
    for sx in range(plan.kpw):
        off = sx + plan.klo_w  # x offset in block units
        if off < 0:
            sh = jnp.pad(x[:, :, :off], ((0, 0), (0, 0), (-off, 0), (0, 0)))
        elif off > 0:
            sh = jnp.pad(x[:, :, off:], ((0, 0), (0, 0), (0, off), (0, 0)))
        else:
            sh = x
        shift_list.append(sh)
    streams = jnp.stack(shift_list, axis=1)  # (N, kpw, H', W', Cp)
    streams = streams.reshape(N, plan.kpw, HW, plan.Cp)
    top = -plan.klo_h * Wp
    bot = SR - HW - top
    streams = jnp.pad(streams, ((0, 0), (0, 0), (top, bot), (0, 0)))

    dtype = x_s2d.dtype
    kernel = functools.partial(
        _sparse_kernel, plan=plan, R=R, Wr=Wp, dtype=dtype
    )
    halo = (plan.kph - 1) * Wp
    out = pl.pallas_call(
        kernel,
        grid=(N, steps),
        in_specs=[
            pl.BlockSpec((len(plan.pairs), 128, 128), lambda n, s: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, plan.m_total), lambda n, s: (n, s, 0)),
        out_shape=jax.ShapeDtypeStruct((N, steps * R, plan.m_total), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, plan.kpw, R + halo, plan.Cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tiles, streams)
    return out[:, :HW].reshape(N, Hp, Wp, plan.m_total)
