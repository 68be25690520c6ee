"""3D cost-volume regularization UNet (CostRegNet).

Behavioral reference: models/module.py:270-315 in TruongKhang/cds-mvsnet:
three stride-2 downsamples, three transposed-conv upsamples with skip adds,
and a final 1-channel conv. Volumes are ``(B, D, H, W, C)`` (NDHWC).
Stage-1 spatial dims must be divisible by 8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    StatsCollector,
    batch_norm,
    conv3d,
    deconv3d,
    init_batch_norm,
    init_conv3d,
    init_deconv,
)

__all__ = ["cost_reg_net", "init_cost_reg_net"]


def _cbr3d(p, x, stride, train, collector, path, axis_name):
    """Conv3d + BatchNorm3d + ReLU (reference module.py:80-121; no conv bias)."""
    y = conv3d(x, p["conv"], stride=stride)
    y = batch_norm(y, p["bn"], train, collector, path + ".bn", axis_name=axis_name)
    return jax.nn.relu(y)


def _dbr3d(p, x, train, collector, path, axis_name):
    """Deconv3d (2x) + BatchNorm3d + ReLU (reference module.py:124-166)."""
    y = deconv3d(x, p["conv"])
    y = batch_norm(y, p["bn"], train, collector, path + ".bn", axis_name=axis_name)
    return jax.nn.relu(y)


def cost_reg_net(
    p: Params,
    x: jnp.ndarray,
    train: bool = False,
    collector: StatsCollector | None = None,
    path: str = "",
    axis_name: str | None = None,
    last_layer: bool = True,
) -> jnp.ndarray:
    """``x (B, D, H, W, C)`` -> ``(B, D, H, W, 1)`` regularized cost."""

    def c(name, inp, stride=1):
        return _cbr3d(p[name], inp, stride, train, collector, f"{path}.{name}", axis_name)

    def d(name, inp):
        return _dbr3d(p[name], inp, train, collector, f"{path}.{name}", axis_name)

    conv0 = c("conv0", x)
    conv2 = c("conv2", c("conv1", conv0, 2))
    conv4 = c("conv4", c("conv3", conv2, 2))
    y = c("conv6", c("conv5", conv4, 2))
    y = conv4 + d("conv7", y)
    y = conv2 + d("conv9", y)
    y = conv0 + d("conv11", y)
    if last_layer:
        y = conv3d(y, p["prob"])
    return y


def init_cost_reg_net(key, in_channels: int, base_channels: int = 8) -> Params:
    b = base_channels
    keys = jax.random.split(key, 11)

    def cbr(k, cin, cout):
        return {"conv": init_conv3d(k, 3, cin, cout, False), "bn": init_batch_norm(cout)}

    def dbr(k, cin, cout):
        return {
            "conv": init_deconv(k, (3, 3, 3, cin, cout), cin, cout, False),
            "bn": init_batch_norm(cout),
        }

    return {
        "conv0": cbr(keys[0], in_channels, b),
        "conv1": cbr(keys[1], b, 2 * b),
        "conv2": cbr(keys[2], 2 * b, 2 * b),
        "conv3": cbr(keys[3], 2 * b, 4 * b),
        "conv4": cbr(keys[4], 4 * b, 4 * b),
        "conv5": cbr(keys[5], 4 * b, 8 * b),
        "conv6": cbr(keys[6], 8 * b, 8 * b),
        "conv7": dbr(keys[7], 8 * b, 4 * b),
        "conv9": dbr(keys[8], 4 * b, 2 * b),
        "conv11": dbr(keys[9], 2 * b, b),
        "prob": {"weight": init_conv3d(keys[10], 3, b, 1, False)["weight"]},
    }
