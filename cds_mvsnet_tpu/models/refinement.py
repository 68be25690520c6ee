"""Image-conditioned depth refinement head (2x upsample + residual).

Behavioral reference: models/module.py:318-370 in TruongKhang/cds-mvsnet.
Depth is normalized to [0, 10] by the scene range, upsampled with a learned
transposed conv fused with image features, and a residual is added on top of
a bilinear (align_corners=True) 2x upsample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    StatsCollector,
    batch_norm,
    conv2d,
    deconv2d,
    init_batch_norm,
    init_conv2d,
    init_deconv,
)
from ..ops.resize import resize_linear

__all__ = ["refinement", "init_refinement", "conv_bn_relu_2d", "init_conv_bn_relu_2d"]


def conv_bn_relu_2d(p, x, train, collector, path, axis_name=None, stride=1):
    """ConvBnReLU (reference module.py:169-198): conv (no bias) + BN + ReLU."""
    y = conv2d(x, {"weight": p["conv"]["weight"]}, stride=stride)
    y = batch_norm(y, p["bn"], train, collector, path + ".bn", axis_name=axis_name)
    return jax.nn.relu(y)


def init_conv_bn_relu_2d(key, cin, cout, k=3):
    return {"conv": init_conv2d(key, k, k, cin, cout, False), "bn": init_batch_norm(cout)}


def refinement(
    p: Params,
    img: jnp.ndarray,
    depth: jnp.ndarray,
    depth_min: jnp.ndarray,
    depth_max: jnp.ndarray,
    train: bool = False,
    collector: StatsCollector | None = None,
    path: str = "refine_network",
    axis_name: str | None = None,
) -> jnp.ndarray:
    """``img (B,H,W,3)``, ``depth (B,H/2,W/2,1)``, range ``(B,)`` -> (B,H,W,1)."""
    rng = (depth_max - depth_min)[:, None, None, None]
    d = (depth - depth_min[:, None, None, None]) / rng * 10

    conv0 = conv_bn_relu_2d(p["conv0"], img, train, collector, f"{path}.conv0", axis_name)
    y = conv_bn_relu_2d(
        p["conv1"], d.astype(img.dtype), train, collector, f"{path}.conv1", axis_name
    )
    y = conv_bn_relu_2d(p["conv2"], y, train, collector, f"{path}.conv2", axis_name)
    y = deconv2d(y, p["deconv"])
    y = jax.nn.relu(batch_norm(y, p["bn"], train, collector, f"{path}.bn", axis_name=axis_name))
    cat = jnp.concatenate([y, conv0], axis=-1)
    res = conv2d(
        conv_bn_relu_2d(p["conv3"], cat, train, collector, f"{path}.conv3", axis_name),
        {"weight": p["res"]["weight"]},
    )

    up = resize_linear(d, (img.shape[1], img.shape[2]), axes=(1, 2), align_corners=True)
    d = (up + res.astype(d.dtype)) / 10
    return d * rng + depth_min[:, None, None, None]


def init_refinement(key) -> Params:
    keys = jax.random.split(key, 6)
    return {
        "conv0": init_conv_bn_relu_2d(keys[0], 3, 8),
        "conv1": init_conv_bn_relu_2d(keys[1], 1, 8),
        "conv2": init_conv_bn_relu_2d(keys[2], 8, 8),
        "deconv": {"weight": init_deconv(keys[3], (3, 3, 8, 8), 8, 8, False)["weight"]},
        "bn": init_batch_norm(8),
        "conv3": init_conv_bn_relu_2d(keys[4], 16, 8),
        "res": {"weight": init_conv2d(keys[5], 3, 3, 8, 1, False)["weight"]},
    }
