"""Pallas exit-fusion kernel (v9): prob head + softmax + depth/conf regression.

The cascade tail after the cost-reg UNet is, per stage (reference
models/module.py:373-391 + model.py:90-92): a 3x3x3 bias-free conv 8->1
(module.py:304), softmax over depth, soft-argmin depth regression, and a
4-bin window confidence. The XLA route runs it as: s2d prob conv ->
depth_to_space relayout -> fp32 softmax -> three more passes over the
(D, h, w) probability volume. That is ~6 full-volume HBM streams for maps
that are only (h, w) (STATUS r3: prob/exit tails +7.0/+4.0/+3.3 ms/stage,
plus the regression share of the ~35 ms tail).

This kernel consumes the s2d UNet exit (the conv0 + deconv11 skip sum,
``(D, h/4, w/4, 128)``) directly and emits just two (h, w)-sized maps:

- per grid step (one spatial band x kd depth planes), the prob conv runs as
  nine accumulated (wqp, 128) @ (128, 48) MXU matmuls — K = the 128 s2d
  channels, M = the s2d row, N = 48 = (sx, phase): the 3 depth taps and 3
  s2d-y taps ride the matmul loop (input rows are zero-sublane-offset views
  of the DMA'd band), the 3 s2d-x taps ride N and are combined by
  sublane-shifted adds in the epilogue, and the 16 = 4x4 block phases ride N
  (the d2s relayout never happens — phase maps go back to true-space pixels
  only for the final (h, w) outputs, outside the kernel);
- per-band fp32 logits accumulate in a VMEM scratch (depth planes revisit the
  band with the depth-innermost grid); at the band's last depth step a
  three-pass reduction computes max / (Z, sum p*j) / the [idx-1, idx+2]
  confidence window mass — so softmax, depth regression, AND the reference's
  take-at-regressed-index confidence (ops/sampling.py semantics) finish
  on-chip;
- stage 1's hypotheses are a (B, D) linspace — exactly affine in the plane
  index j — so the caller reconstructs depth = d0 + (d1 - d0) * idx_f from
  two hypothesis planes it already has, and the volume never enters;
- refined stages' hypotheses are NOT affine everywhere: the reference
  (module.py:413-416, matched by ops/sampling.py:66-67) saturates each
  sample independently at [depth_min, depth_max] and then resamples
  spatially, so windows at the range edges flatten (d0 == d1 == depth_min
  there — an affine reconstruction would collapse depth to depth_min
  regardless of the probability mass). For those stages the caller passes
  the true per-pixel hypothesis volume ``dvol``; the kernel streams it in
  s2d layout one (kd, trq) block per grid step and accumulates
  S_d = sum_j exp(L_j - m)·d_j flash-style (running max, rescaled), so the
  emitted depth equals depth_regression(softmax(logits), dvol) exactly.

Mosaic notes: all matmul operands are zero-sublane-offset full-minor views;
the only sublane-offset reads are the three (WQO, 16) fp32 epilogue slices;
output blocks span their full (WQO, 16) minor dims (blocking only the row
dim), sidestepping the (8, 128) divisibility rule for minor-dim-splitting
blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["exit_softargmin", "build_exit_wmat"]


def build_exit_wmat(w: jnp.ndarray, b: int = 4, C: int = 8) -> jnp.ndarray:
    """Scatter the true ``(3, 3, 3, C, 1)`` prob-conv taps into the kernel's
    ``(9, b²C, 3*b²)`` matrix: first index (dd, sy) pairs a band depth plane
    with an s2d row tap, rows are s2d channels ``(by, bx, ch)``, columns are
    ``(sx, py, px)``. Entry = w[dd, dy+1, dx+1, ch] where dy = b(sy-1)+by-py
    and dx = b(sx-1)+bx-px must be true-conv offsets in [-1, 1]."""
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == C, w.shape
    bb = b * b
    idx = [[], [], []]
    src = [[], [], [], []]
    for dd in range(3):
        for sy in range(3):
            for by in range(b):
                for py in range(b):
                    dy = b * (sy - 1) + by - py
                    if not -1 <= dy <= 1:
                        continue
                    for sx in range(3):
                        for bx in range(b):
                            for px in range(b):
                                dx = b * (sx - 1) + bx - px
                                if not -1 <= dx <= 1:
                                    continue
                                for ch in range(C):
                                    idx[0].append(dd * 3 + sy)
                                    idx[1].append((by * b + bx) * C + ch)
                                    idx[2].append((sx * b + py) * b + px)
                                    src[0].append(dd)
                                    src[1].append(dy + 1)
                                    src[2].append(dx + 1)
                                    src[3].append(ch)
    idx = [np.asarray(a) for a in idx]
    src = [np.asarray(a) for a in src]
    vals = w[src[0], src[1], src[2], src[3], 0]
    return (
        jnp.zeros((9, bb * C, 3 * bb), w.dtype).at[idx[0], idx[1], idx[2]].set(vals)
    )


def _exit_body(wmat_ref, yp_hbm, dp_hbm, out_ref, conf_ref, band, L, sem,
               dband, dsem, mrun, sd, *, D, kd, trq, WQO, wqp, nph):
    yt = pl.program_id(0)
    dt = pl.program_id(1)
    n_y = pl.num_programs(0)
    n_d = pl.num_programs(1)
    step = yt * n_d + dt
    slot = jax.lax.rem(step, 2)
    with_d = dp_hbm is not None

    def mk_copy(y_i, d_i, s):
        return pltpu.make_async_copy(
            yp_hbm.at[
                pl.ds(d_i * kd, kd + 2), pl.ds(y_i * trq, trq + 2),
                pl.ds(0, wqp), pl.ds(0, 128),
            ],
            band.at[s],
            sem.at[s],
        )

    if with_d:
        # single-slot hypothesis block for this step, started early so it
        # rides behind the band prefetch and is waited only after the
        # logits matmuls
        def mk_dcopy():
            return pltpu.make_async_copy(
                dp_hbm.at[pl.ds(dt * kd, kd), pl.ds(yt * trq, trq)],
                dband, dsem,
            )

        mk_dcopy().start()

    @pl.when(step == 0)
    def _():
        mk_copy(yt, dt, 0).start()

    mk_copy(yt, dt, slot).wait()

    @pl.when(step + 1 < n_y * n_d)
    def _():
        nxt = step + 1
        mk_copy(nxt // n_d, jax.lax.rem(nxt, n_d), 1 - slot).start()

    blk = band[slot]  # (kd+2, trq+2, wqp, 128) bf16
    for od in range(kd):
        for r in range(trq):
            acc = jnp.zeros((wqp, 3 * nph), jnp.float32)
            for dd in range(3):
                for sy in range(3):
                    acc = acc + jax.lax.dot_general(
                        blk[od + dd, r + sy], wmat_ref[dd * 3 + sy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (wqp, 3*nph)
            # out col XQ reads the sx-tap group at band sublane XQ + sx
            logits = (
                acc[0:WQO, 0:nph]
                + acc[1:WQO + 1, nph:2 * nph]
                + acc[2:WQO + 2, 2 * nph:3 * nph]
            )  # (WQO, nph) fp32
            L[dt * kd + od, r] = logits

    if with_d:
        # flash-style running (max, sum e·d): exact expectation over the
        # true per-pixel hypotheses without a (D, ...) d scratch
        @pl.when(dt == 0)
        def _():
            mrun[...] = jnp.full((trq, WQO, nph), -1e30, jnp.float32)
            sd[...] = jnp.zeros((trq, WQO, nph), jnp.float32)

        mk_dcopy().wait()
        for od in range(kd):
            for r in range(trq):
                lg = L[dt * kd + od, r]  # (WQO, nph) fp32
                m0 = mrun[r]
                mn = jnp.maximum(m0, lg)
                sd[r] = sd[r] * jnp.exp(m0 - mn) + jnp.exp(lg - mn) * dband[od, r]
                mrun[r] = mn

    @pl.when(dt == n_d - 1)
    def _():
        shape = (trq, WQO, nph)
        m = jax.lax.fori_loop(
            0, D, lambda i, m: jnp.maximum(m, L[i]),
            jnp.full(shape, -1e30, jnp.float32),
        )

        def zs(i, c):
            Z, S = c
            e = jnp.exp(L[i] - m)
            return Z + e, S + e * i.astype(jnp.float32)

        Z, S = jax.lax.fori_loop(
            0, D, zs, (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
        )
        idx_f = S / Z
        # truncation (not floor) matches the reference's .long() — idx_f >= 0
        idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)

        def cw(i, c):
            e = jnp.exp(L[i] - m)
            msk = (i >= idx - 1) & (i <= idx + 2)
            return c + jnp.where(msk, e, 0.0)

        Cw = jax.lax.fori_loop(0, D, cw, jnp.zeros(shape, jnp.float32))
        # with_d: mrun ended at the same global max m, so sd / Z is the
        # exact softmax expectation over the streamed hypotheses
        out_ref[...] = sd[...] / Z if with_d else idx_f
        conf_ref[...] = Cw / Z


def _exit_kernel(wmat_ref, yp_hbm, out_ref, conf_ref, band, L, sem, **kw):
    _exit_body(wmat_ref, yp_hbm, None, out_ref, conf_ref, band, L, sem,
               None, None, None, None, **kw)


def _exit_kernel_d(wmat_ref, yp_hbm, dp_hbm, out_ref, conf_ref, band, L, sem,
                   dband, dsem, mrun, sd, **kw):
    _exit_body(wmat_ref, yp_hbm, dp_hbm, out_ref, conf_ref, band, L, sem,
               dband, dsem, mrun, sd, **kw)


def exit_softargmin(
    y: jnp.ndarray,  # (D, hq, wq, b²·C) s2d UNet exit (bf16)
    w_prob: jnp.ndarray,  # (3, 3, 3, C, 1) prob-conv weight (bias-free)
    dvol: jnp.ndarray | None = None,  # (D, b·hq, b·wq) fp32 hypotheses
    b: int = 4,
    kd: int | None = None,
    trq: int = 4,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused exit: returns ``(out, conf)`` maps, each ``(b·hq, b·wq)`` fp32.

    Without ``dvol``, ``out`` is the soft-argmin depth-plane index
    (``sum softmax(logits)*j``); the caller reconstructs metric depth as
    ``d0 + (d1 - d0) * idx_f`` — exact ONLY when the hypotheses are affine in
    the plane index (stage 1's linspace). With ``dvol`` — the true per-pixel
    hypothesis volume, clamped at the range edges and spatially resampled
    (ops/sampling.py:66-69, reference module.py:413-416) — ``out`` is the
    metric depth ``depth_regression(softmax(logits), dvol)`` computed exactly
    in-kernel, which refined stages need because the saturating clamp breaks
    affinity at the range edges. ``conf`` equals
    ``confidence_regression(softmax(logits))`` (ops/sampling.py). Matches
    ``depth_to_space(s2d_conv3d(y, w, pad=1))`` -> fp32 softmax -> regression
    up to fp32-accumulation-vs-bf16-logit rounding."""
    from ..s2d import depth_to_space, space_to_depth

    D, hq, wq, CC = y.shape
    C = CC // (b * b)
    assert w_prob.shape == (3, 3, 3, C, 1), (w_prob.shape, C)
    nph = b * b
    if kd is None:
        kd = next(k for k in (4, 2, 1) if D % k == 0)
    assert D % kd == 0
    WQO = ((wq + 7) // 8) * 8
    wqp = WQO + 8
    n_y = -(-hq // trq)
    hq_p = n_y * trq + 2
    yp = jnp.pad(
        y.astype(jnp.bfloat16),
        ((1, 1), (1, hq_p - hq - 1), (1, wqp - wq - 1), (0, 0)),
    )
    wmat = build_exit_wmat(w_prob.astype(jnp.bfloat16), b=b, C=C)

    with_d = dvol is not None
    kern = functools.partial(
        _exit_kernel_d if with_d else _exit_kernel,
        D=D, kd=kd, trq=trq, WQO=WQO, wqp=wqp, nph=nph,
    )
    in_specs = [
        pl.BlockSpec((9, CC, 3 * nph), lambda y_, d_: (0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, kd + 2, trq + 2, wqp, CC), jnp.bfloat16),
        pltpu.VMEM((D, trq, WQO, nph), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    operands = [wmat, yp]
    if with_d:
        assert dvol.shape == (D, hq * b, wq * b), (dvol.shape, (D, hq * b, wq * b))
        dp = space_to_depth(dvol.astype(jnp.float32)[..., None], b)  # (D,hq,wq,16)
        dp = jnp.pad(dp, ((0, 0), (0, n_y * trq - hq), (0, WQO - wq), (0, 0)))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((kd, trq, WQO, nph), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((trq, WQO, nph), jnp.float32),
            pltpu.VMEM((trq, WQO, nph), jnp.float32),
        ]
        operands.append(dp)
    out_shape = jax.ShapeDtypeStruct((n_y * trq, WQO, nph), jnp.float32)
    out, conf = pl.pallas_call(
        kern,
        grid=(n_y, D // kd),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((trq, WQO, nph), lambda y_, d_: (y_, 0, 0)),
            pl.BlockSpec((trq, WQO, nph), lambda y_, d_: (y_, 0, 0)),
        ],
        out_shape=[out_shape, out_shape],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)
    out_map = depth_to_space(out[None, :hq, :wq], b)[0, ..., 0]
    conf_map = depth_to_space(conf[None, :hq, :wq], b)[0, ..., 0]
    return out_map, conf_map
