"""Image-folded FeatureNet: N images as channel groups of ONE conv batch.

XLA:TPU pads every conv activation's channel dim to 128 lanes. This network
has 3–32 channels, so the plain NHWC formulation wastes up to 42x of HBM
bandwidth on padding, and the feature extractor becomes bandwidth-bound.
Folding the 2·(V−1) stacked images into channel groups of a single image —
activations ``(1, H, W, N·C)``, grouped convolutions with
``feature_group_count=N`` and weights tiled across groups — fills the lanes
(N·C = 64…256) while computing the *identical* per-image math:

  * grouped conv == per-image conv with shared weights
  * InstanceNorm normalizes each (image, channel) over H,W — unchanged
  * the curvature attention softmax acts per (image, kernel-size) — unchanged
  * BatchNorm inside the attention MLP uses running stats at eval — unchanged

Eval-only (training uses the unfolded path where torch-style batch stats
apply). Returns per-stage tensors unfolded back to ``(N, h, w, C)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import upsample2x_nearest
from .dynamic_conv import epipolar_direction_quadratic
from .feature_net import _DYN_KERNELS
from .layers import Params, batch_norm, default_precision, instance_norm, leaky_relu

__all__ = ["feature_net_folded"]


def _gconv(x, w, n_groups, stride=1, padding=None):
    """Grouped conv: ``x (1,H,W,N·I)``, ``w (kh,kw,I,O)`` shared per group."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    elif isinstance(padding, int):
        padding = (padding, padding)
    w_tiled = jnp.tile(w.astype(x.dtype), (1, 1, 1, n_groups))  # (kh,kw,I,N·O)
    return jax.lax.conv_general_dilated(
        x, w_tiled,
        window_strides=(stride, stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n_groups,
        precision=default_precision(),
    )


def _dynamic_conv_folded(p: Params, x, quad, temperature, size_kernels, n, bias_keys=True):
    """Folded DynamicConv. ``x (1,H,W,N·I)``, ``quad (N,H,W,3)`` ->
    (out ``(1,H,W,N·O)``, norm_curv ``(N,H,W,1)``)."""
    _, H, W, _ = x.shape
    quad_t = jnp.moveaxis(quad, 0, 2)  # (H, W, N, 3)

    curvs = []
    results = []
    for i, k in enumerate(size_kernels):
        conv_p = p["convs"][str(i)]
        att_w = p["att_convs"][str(i)]["weight"]
        out_c = conv_p["weight"].shape[-1]
        fused_w = jnp.concatenate([conv_p["weight"], att_w], axis=-1)
        y = _gconv(x, fused_w, n, padding=(k - 1) // 2)  # (1,H,W,N(O+3))
        y = y.reshape(H, W, n, out_c + 3)
        res, coef = y[..., :out_c], y[..., out_c:]
        if conv_p.get("bias") is not None:
            res = res + conv_p["bias"].astype(res.dtype)
        curvs.append(jnp.sum(coef * quad_t.astype(coef.dtype), axis=-1, keepdims=True))
        results.append(res)

    curvs = jnp.concatenate(curvs, axis=-1)  # (H, W, N, K)
    w0 = p["att_weights"]["0"]["weight"][0, 0]  # (K, hidden)
    w = jnp.einsum("hwnk,kd->hwnd", curvs, w0.astype(curvs.dtype),
                   precision=default_precision())
    w = batch_norm(w, p["att_weights"]["1"], train=False)
    w = jax.nn.relu(w)
    w3 = p["att_weights"]["3"]["weight"][0, 0]  # (hidden, K)
    w = jnp.einsum("hwnd,dk->hwnk", w, w3.astype(w.dtype), precision=default_precision())
    w = jax.nn.softmax(w.astype(jnp.float32) / temperature, axis=-1).astype(x.dtype)

    out = sum(results[i] * w[..., i : i + 1] for i in range(len(size_kernels)))
    norm_curv = jnp.sum(curvs * w, axis=-1)  # (H, W, N)
    out = out.reshape(1, H, W, -1)
    return out, jnp.moveaxis(norm_curv, 2, 0)  # (N, H, W)


def _fold(x):  # (N,H,W,C) -> (1,H,W,N*C)
    return jnp.moveaxis(x, 0, 2).reshape(1, x.shape[1], x.shape[2], -1)


def _unfold(x, n):  # (1,H,W,N*C) -> (N,H,W,C)
    _, H, W, NC = x.shape
    return jnp.moveaxis(x.reshape(H, W, n, NC // n), 2, 0)


def feature_net_folded(p: Params, x: jnp.ndarray, epipole: jnp.ndarray, temperature):
    """``x (N,H,W,3)``, ``epipole (N,2)`` -> per-stage (feat, nc_sum, |nc|)
    each ``(N,h,w,C)``; numerically equal to :func:`feature_net` at eval."""
    N, H, W, _ = x.shape

    def dyn_wrapped(name, xf, quad):
        y, nc = _dynamic_conv_folded(
            p[name]["conv"], xf, quad, temperature, _DYN_KERNELS[name], N
        )
        return leaky_relu(_in_folded(y, N)), nc

    quad0 = epipolar_direction_quadratic(epipole, H, W, x.dtype)
    quad1 = epipolar_direction_quadratic(epipole / 2, H // 2, W // 2, x.dtype)
    quad2 = epipolar_direction_quadratic(epipole / 4, H // 4, W // 4, x.dtype)

    xf = _fold(x)
    conv00, nc00 = dyn_wrapped("conv00", xf, quad0)
    conv01, nc01 = dyn_wrapped("conv01", conv00, quad0)
    down0 = leaky_relu(_in_folded(_gconv(conv01, p["downsample1"]["conv"]["weight"], N, stride=2, padding=1), N))
    conv10, nc10 = dyn_wrapped("conv10", down0, quad1)
    conv11, nc11 = dyn_wrapped("conv11", conv10, quad1)
    down1 = leaky_relu(_in_folded(_gconv(conv11, p["downsample2"]["conv"]["weight"], N, stride=2, padding=1), N))
    conv20, nc20 = dyn_wrapped("conv20", down1, quad2)
    conv21, nc21 = dyn_wrapped("conv21", conv20, quad2)

    outputs = {}
    intra = conv21
    out, nc22 = _dynamic_conv_folded(p["out1"], intra, quad2, temperature, _DYN_KERNELS["out1"], N)
    out = jnp.tanh(_in_folded(out, N))
    outputs["stage1"] = (_unfold(out, N), (nc20**2 + nc21**2 + nc22**2) / 3, jnp.abs(nc22))

    intra = _cat_folded(upsample2x_nearest(intra, axes=(1, 2)), conv11, N)
    intra = leaky_relu(_in_folded(_gconv(intra, p["inner1"]["conv"]["weight"], N), N))
    out, nc12 = _dynamic_conv_folded(p["out2"], intra, quad1, temperature, _DYN_KERNELS["out2"], N)
    out = jnp.tanh(_in_folded(out, N))
    outputs["stage2"] = (_unfold(out, N), (nc10**2 + nc11**2 + nc12**2) / 3, jnp.abs(nc12))

    intra = _cat_folded(upsample2x_nearest(out, axes=(1, 2)), conv01, N)
    intra = leaky_relu(_in_folded(_gconv(intra, p["inner2"]["conv"]["weight"], N), N))
    out, nc02 = _dynamic_conv_folded(p["out3"], intra, quad0, temperature, _DYN_KERNELS["out3"], N)
    out = jnp.tanh(_in_folded(out, N))
    outputs["stage3"] = (_unfold(out, N), (nc00**2 + nc01**2 + nc02**2) / 3, jnp.abs(nc02))
    return outputs


def _in_folded(x, n):
    """InstanceNorm in folded layout: per (image, channel) over H, W — which
    is exactly per folded channel, so the standard instance_norm applies."""
    return instance_norm(x)


def _cat_folded(a, b, n):
    """Per-image channel concat in folded layout."""
    _, H, W, NA = a.shape
    _, _, _, NB = b.shape
    ar = a.reshape(H, W, n, NA // n)
    br = b.reshape(H, W, n, NB // n)
    return jnp.concatenate([ar, br], axis=-1).reshape(1, H, W, -1)
