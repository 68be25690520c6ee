"""Space-to-depth FeatureNet: the TPU-shaped dynamic-scale feature extractor.

Same math as :mod:`feature_net`, computed on space-to-depth activations
(block sizes 8/4/2 at full/half/quarter resolution, so channel counts are
b²·C = 128…512 instead of 3…48). Every conv runs via :func:`s2d_conv` (exact
weight rescatter), InstanceNorm reduces over phases+space (exact), the
curvature attention acts per (pixel-phase, kernel-size) (exact), and the FPN
2x upsamples become constant channel permutations on a fixed grid.

Eval-only, like the folded variant. Requires H, W divisible by 8.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.pallas.s2d_sparse import pack_tiles, plan_sparse_layer, sparse_s2d_conv
from ..ops.s2d import (
    depth_to_space,
    s2d_conv,
    s2d_instance_norm,
    s2d_upsample2x_nearest,
    space_to_depth,
)
from .dynamic_conv import epipolar_direction_quadratic
from .feature_net import _DYN_KERNELS, BASE_CHANNELS
from .layers import Params, batch_norm, default_precision, leaky_relu

__all__ = ["feature_net_s2d"]


def _d2s_map(x, b):
    """(N, H', W', b²) channel-less phase map -> (N, H'·b, W'·b)."""
    N, Hp, Wp, _ = x.shape
    x = x.reshape(N, Hp, Wp, b, b)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(N, Hp * b, Wp * b)


def _sparse_set() -> frozenset:
    """Layers routed through the block-sparse Pallas conv kernel
    (ops/pallas/s2d_sparse.py). ``CDS_FEAT_SPARSE``: comma list of layer
    names, ``all``, or ``off``/empty."""
    v = os.environ.get("CDS_FEAT_SPARSE", _FEAT_SPARSE_DEFAULT).strip().lower()
    if v in ("", "0", "off", "none"):
        return frozenset()
    return frozenset(v.split(","))


# conv01 is the ONE layer where skipping zero weight tiles beats XLA's dense
# s2d conv (r4 measurements: −5.1 ms standalone, −1.3 ms/map in-model; every
# other layer loses to the kernel's x-shift stream materialization + fixed
# costs — tools/bench_feature3.py, tools/ablate.py r4sparse).
_FEAT_SPARSE_DEFAULT = "conv01"
_SPARSE_ALL = (
    "conv00", "conv01", "conv10", "conv11", "conv20", "conv21",
    "out1", "out2", "out3", "downsample1", "downsample2", "inner1", "inner2",
)


def _want_sparse(name: str, Wp: int, dtype) -> bool:
    s = _sparse_set()
    if not ("all" in s or name in s):
        return False
    if dtype != jnp.bfloat16:
        return False  # the kernel computes bf16; keep fp32 parity evals dense
    if not (jax.default_backend() in ("tpu", "axon")
            or os.environ.get("CDS_PALLAS_INTERPRET")):
        return False  # Mosaic needs real TPU (same gate as stage_net)
    return Wp % 8 == 0  # y-tap DMA row offsets need 8-aligned flat rows


def _plain_conv_s2d(x, w, name, b_in, stride=1, padding=None):
    """Single plain conv, sparse-kernel-routable (downsample*/inner*)."""
    N, Hp, Wp, _ = x.shape
    if not _want_sparse(name, Wp, x.dtype):
        return s2d_conv(x, w, b_in=b_in, stride=stride, padding=padding)
    k = w.shape[0]
    pad = (k - 1) // 2 if padding is None else padding
    plan = plan_sparse_layer(((k, w.shape[2], w.shape[3], pad),), b_in, stride=stride)
    tiles = pack_tiles(plan, [w.astype(x.dtype)])
    out = sparse_s2d_conv(
        x, tiles, plan, interpret=bool(os.environ.get("CDS_PALLAS_INTERPRET"))
    )
    b_out = b_in // stride
    return out[..., : b_out * b_out * w.shape[3]]


def _dyn_s2d(p: Params, x, quad, temperature, size_kernels, b, name=None):
    """s2d DynamicConv. ``x (N,H',W',b²·I)``, ``quad (N,H',W',b²·3)`` ->
    (out ``(N,H',W',b²·O)``, norm_curv ``(N,H',W',b²)``)."""
    N, Hp, Wp, _ = x.shape
    bb = b * b
    quad_r = quad.reshape(N, Hp, Wp, bb, 3)

    fused_ws = []
    for i, k in enumerate(size_kernels):
        fused_ws.append(jnp.concatenate(
            [p["convs"][str(i)]["weight"], p["att_convs"][str(i)]["weight"]],
            axis=-1))  # (k,k,I,O+3)

    ys = None
    if name is not None and _want_sparse(name, Wp, x.dtype):
        # ONE kernel call for all branches: skip the zero weight tiles
        I = fused_ws[0].shape[2]
        OA = fused_ws[0].shape[3]
        branches = tuple(
            (k, I, OA, (k - 1) // 2) for k in size_kernels
        )
        plan = plan_sparse_layer(branches, b)
        tiles = pack_tiles(plan, [w.astype(x.dtype) for w in fused_ws])
        outall = sparse_s2d_conv(
            x, tiles, plan, interpret=bool(os.environ.get("CDS_PALLAS_INTERPRET"))
        )
        ys = [
            outall[..., mo : mo + bb * OA] for mo in plan.m_offsets
        ]

    curvs = []
    results = []
    for i, k in enumerate(size_kernels):
        conv_p = p["convs"][str(i)]
        out_c = conv_p["weight"].shape[-1]
        if ys is not None:
            y = ys[i]
        else:
            y = s2d_conv(x, fused_ws[i], b_in=b, padding=(k - 1) // 2)
        y = y.reshape(N, Hp, Wp, bb, out_c + 3)
        res, coef = y[..., :out_c], y[..., out_c:]
        if conv_p.get("bias") is not None:
            res = res + conv_p["bias"].astype(res.dtype)
        curvs.append(jnp.sum(coef * quad_r.astype(coef.dtype), axis=-1))  # (N,H',W',bb)
        results.append(res)

    curvs = jnp.stack(curvs, axis=-1)  # (N, H', W', bb, K)
    w0 = p["att_weights"]["0"]["weight"][0, 0]  # (K, hidden)
    w = jnp.einsum("...k,kd->...d", curvs, w0.astype(curvs.dtype),
                   precision=default_precision())
    w = batch_norm(w, p["att_weights"]["1"], train=False)
    w = jax.nn.relu(w)
    w3 = p["att_weights"]["3"]["weight"][0, 0]  # (hidden, K)
    w = jnp.einsum("...d,dk->...k", w, w3.astype(w.dtype), precision=default_precision())
    w = jax.nn.softmax(w.astype(jnp.float32) / temperature, axis=-1).astype(x.dtype)

    out = sum(results[i] * w[..., i : i + 1] for i in range(len(size_kernels)))
    norm_curv = jnp.sum(curvs * w, axis=-1)  # (N, H', W', bb)
    return out.reshape(N, Hp, Wp, -1), norm_curv


def _cat_s2d(a, b_arr, bb):
    """Per-phase channel concat: both (N,H',W',bb·C*)."""
    N, Hp, Wp, NA = a.shape
    NB = b_arr.shape[-1]
    ar = a.reshape(N, Hp, Wp, bb, NA // bb)
    br = b_arr.reshape(N, Hp, Wp, bb, NB // bb)
    return jnp.concatenate([ar, br], axis=-1).reshape(N, Hp, Wp, -1)


def _d2s_cfirst(x, b, C):
    """(N, H', W', b²·C) -> (N, C, H, W): depth-to-space straight into a
    channels-first (W-minor) layout, skipping the 128-lane-padded NHWC
    intermediate entirely."""
    N, Hp, Wp, _ = x.shape
    x = x.reshape(N, Hp, Wp, b, b, C)
    return jnp.transpose(x, (0, 5, 1, 3, 2, 4)).reshape(N, C, Hp * b, Wp * b)


def _d2s_rows(x, b, C):
    """(N, H', W', b²·C) -> (N, H, C, W): depth-to-space straight into the
    v7m/v8 warp kernels' band-source layout (warp.py prep_src_rows), so the
    (C, H, W) intermediate and its second relayout pass never materialize
    (CDS_SRC_ROWS route; VERDICT r4 #4). Equals
    ``transpose(_d2s_cfirst(x), (0, 2, 1, 3))`` exactly."""
    N, Hp, Wp, _ = x.shape
    x = x.reshape(N, Hp, Wp, b, b, C)
    return jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(N, Hp * b, C, Wp * b)


def feature_net_s2d(p: Params, x: jnp.ndarray, epipole: jnp.ndarray, temperature,
                    channels_first: bool = False, src_rows_split: int = 0):
    """``x (N,H,W,3)``, ``epipole (N,2)`` -> per-stage (feat (N,h,w,C) — or
    (N,C,h,w) with ``channels_first`` — nc_sum (N,h,w), |nc| (N,h,w));
    equals :func:`feature_net` at eval.

    ``src_rows_split > 0``: batch entries ``[split:]`` are warp SOURCE views,
    consumed only by the v7m/v8 kernels' (H, C, W) band DMA — their feats are
    emitted in that layout directly off the s2d exit (one relayout pass
    instead of d2s + prep_src_rows; VERDICT r4 #4). Each stage's feat is then
    a tuple ``(lead (split, C|.., ...) per channels_first, rows_srcs
    (N-split, h, C, w))``; nc maps stay whole-batch."""
    N, H, W, _ = x.shape
    base = BASE_CHANNELS
    B0, B1, B2 = 8, 4, 2  # block sizes at full / half / quarter resolution

    quad0 = space_to_depth(epipolar_direction_quadratic(epipole, H, W, x.dtype), B0)
    quad1 = space_to_depth(
        epipolar_direction_quadratic(epipole / 2, H // 2, W // 2, x.dtype), B1
    )
    quad2 = space_to_depth(
        epipolar_direction_quadratic(epipole / 4, H // 4, W // 4, x.dtype), B2
    )

    def dyn_wrapped(name, xf, quad, b, C):
        y, nc = _dyn_s2d(p[name]["conv"], xf, quad, temperature, _DYN_KERNELS[name], b,
                         name=name)
        return leaky_relu(s2d_instance_norm(y, b, C)), nc

    xs = space_to_depth(x, B0)
    conv00, nc00 = dyn_wrapped("conv00", xs, quad0, B0, base)
    conv01, nc01 = dyn_wrapped("conv01", conv00, quad0, B0, base)
    down0 = leaky_relu(s2d_instance_norm(
        _plain_conv_s2d(conv01, p["downsample1"]["conv"]["weight"], "downsample1",
                        b_in=B0, stride=2, padding=1),
        B1, 2 * base))
    conv10, nc10 = dyn_wrapped("conv10", down0, quad1, B1, 2 * base)
    conv11, nc11 = dyn_wrapped("conv11", conv10, quad1, B1, 2 * base)
    down1 = leaky_relu(s2d_instance_norm(
        _plain_conv_s2d(conv11, p["downsample2"]["conv"]["weight"], "downsample2",
                        b_in=B1, stride=2, padding=1),
        B2, 4 * base))
    conv20, nc20 = dyn_wrapped("conv20", down1, quad2, B2, 4 * base)
    conv21, nc21 = dyn_wrapped("conv21", conv20, quad2, B2, 4 * base)

    outputs = {}
    lead_d2s = (lambda t, b, C: _d2s_cfirst(t, b, C)) if channels_first else (
        lambda t, b, C: depth_to_space(t, b))
    if src_rows_split:
        S0 = src_rows_split

        def d2s(t, b, C):
            return (lead_d2s(t[:S0], b, C), _d2s_rows(t[S0:], b, C))
    else:
        d2s = lead_d2s
    intra = conv21
    out, nc22 = _dyn_s2d(p["out1"], intra, quad2, temperature, _DYN_KERNELS["out1"], B2,
                         name="out1")
    out = jnp.tanh(s2d_instance_norm(out, B2, 4 * base))
    outputs["stage1"] = (
        d2s(out, B2, 4 * base),
        _d2s_map((nc20**2 + nc21**2 + nc22**2) / 3, B2),
        _d2s_map(jnp.abs(nc22), B2),
    )

    up = s2d_upsample2x_nearest(intra, B2, 4 * base)  # -> s2d(B1) on half grid
    intra = _cat_s2d(up, conv11, B1 * B1)
    intra = leaky_relu(s2d_instance_norm(
        _plain_conv_s2d(intra, p["inner1"]["conv"]["weight"], "inner1", b_in=B1, padding=0),
        B1, 2 * base))
    out, nc12 = _dyn_s2d(p["out2"], intra, quad1, temperature, _DYN_KERNELS["out2"], B1,
                         name="out2")
    out = jnp.tanh(s2d_instance_norm(out, B1, 2 * base))
    outputs["stage2"] = (
        d2s(out, B1, 2 * base),
        _d2s_map((nc10**2 + nc11**2 + nc12**2) / 3, B1),
        _d2s_map(jnp.abs(nc12), B1),
    )

    up = s2d_upsample2x_nearest(out, B1, 2 * base)  # -> s2d(B0) on full grid
    intra = _cat_s2d(up, conv01, B0 * B0)
    intra = leaky_relu(s2d_instance_norm(
        _plain_conv_s2d(intra, p["inner2"]["conv"]["weight"], "inner2", b_in=B0, padding=0),
        B0, base))
    out, nc02 = _dyn_s2d(p["out3"], intra, quad0, temperature, _DYN_KERNELS["out3"], B0,
                         name="out3")
    out = jnp.tanh(s2d_instance_norm(out, B0, base))
    outputs["stage3"] = (
        d2s(out, B0, base),
        _d2s_map((nc00**2 + nc01**2 + nc02**2) / 3, B0),
        _d2s_map(jnp.abs(nc02), B0),
    )
    return outputs
