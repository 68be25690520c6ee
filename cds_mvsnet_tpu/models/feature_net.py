"""Dynamic-scale FPN feature extractor.

Behavioral reference: models/module.py:201-267 (FeatureNet) in
TruongKhang/cds-mvsnet: 6 dynamic convs across 3 scales, plain strided convs
for downsampling, 1×1 lateral merges, and per-stage DynamicConv +
InstanceNorm + Tanh output heads. Per stage returns (features, mean squared
curvature, |curvature|); channels are [32, 16, 8] for stages 1..3 at 1/4,
1/2, 1/1 of the working resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dynamic_conv import dynamic_conv, init_dynamic_conv
from .layers import (
    Params,
    StatsCollector,
    conv2d,
    init_conv2d,
    instance_norm,
    leaky_relu,
)
from ..ops.resize import upsample2x_nearest

__all__ = ["feature_net", "init_feature_net", "FEATURE_OUT_CHANNELS"]

BASE_CHANNELS = 8
FEATURE_OUT_CHANNELS = (BASE_CHANNELS * 4, BASE_CHANNELS * 2, BASE_CHANNELS)

# (name, kernel sizes) of the dynamic conv trunk, in application order.
_DYN_KERNELS = {
    "conv00": (3, 7, 11),
    "conv01": (3, 5, 7),
    "conv10": (3, 5),
    "conv11": (3, 5),
    "conv20": (1, 3),
    "conv21": (1, 3),
    "out1": (1, 3),
    "out2": (1, 3),
    "out3": (1, 3),
}


def _dyn_block(p, x, epipole, temperature, kernels, train, collector, path, axis_name,
               stat_groups=1, group_order=None):
    """Conv2d(dynamic=True) wrapper: DynamicConv + InstanceNorm + leaky_relu(0.1)
    (reference module.py:59-71; conv bias disabled when normed)."""
    y, nc = dynamic_conv(
        p["conv"], x, epipole, temperature, kernels,
        train=train, collector=collector, path=path + ".conv", axis_name=axis_name,
        stat_groups=stat_groups, group_order=group_order,
    )
    return leaky_relu(instance_norm(y)), nc


def _plain_block(p, x, stride=1):
    """Conv2d wrapper: conv (no bias) + InstanceNorm + leaky_relu(0.1)."""
    return leaky_relu(instance_norm(conv2d(x, p["conv"], stride=stride)))


def feature_net(
    p: Params,
    x: jnp.ndarray,
    epipole: jnp.ndarray,
    temperature: float,
    train: bool = False,
    collector: StatsCollector | None = None,
    path: str = "feature",
    axis_name: str | None = None,
    bn_groups: int = 1,
    bn_group_order: tuple[int, ...] | None = None,
) -> dict[str, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """``x (B,H,W,3)``, ``epipole (B,2)`` -> per-stage (feat, nc_sum, |nc|).

    ``bn_groups``: when the batch stacks several reference-level FeatureNet
    calls (model.py:154-161 runs one per (ref, src) pair), train-mode
    attention-BN statistics must be computed per group of B images, not over
    the whole stack — see layers.batch_norm. Eval is unaffected."""

    def dyn(name, inp, epi):
        return _dyn_block(
            p[name], inp, epi, temperature, _DYN_KERNELS[name],
            train, collector, f"{path}.{name}", axis_name,
            stat_groups=bn_groups, group_order=bn_group_order,
        )

    conv00, nc00 = dyn("conv00", x, epipole)
    conv01, nc01 = dyn("conv01", conv00, epipole)
    down0 = _plain_block(p["downsample1"], conv01, stride=2)
    epi0 = epipole / 2
    conv10, nc10 = dyn("conv10", down0, epi0)
    conv11, nc11 = dyn("conv11", conv10, epi0)
    down1 = _plain_block(p["downsample2"], conv11, stride=2)
    epi1 = epipole / 4
    conv20, nc20 = dyn("conv20", down1, epi1)
    conv21, nc21 = dyn("conv21", conv20, epi1)

    outputs = {}
    intra = conv21
    out, nc22 = dynamic_conv(
        p["out1"], intra, epi1, temperature, _DYN_KERNELS["out1"],
        train=train, collector=collector, path=f"{path}.out1", axis_name=axis_name,
        stat_groups=bn_groups, group_order=bn_group_order,
    )
    out = jnp.tanh(instance_norm(out))
    outputs["stage1"] = (out, (nc20**2 + nc21**2 + nc22**2) / 3, jnp.abs(nc22))

    intra = jnp.concatenate([upsample2x_nearest(intra), conv11], axis=-1)
    intra = _plain_block(p["inner1"], intra)
    out, nc12 = dynamic_conv(
        p["out2"], intra, epi0, temperature, _DYN_KERNELS["out2"],
        train=train, collector=collector, path=f"{path}.out2", axis_name=axis_name,
        stat_groups=bn_groups, group_order=bn_group_order,
    )
    out = jnp.tanh(instance_norm(out))
    outputs["stage2"] = (out, (nc10**2 + nc11**2 + nc12**2) / 3, jnp.abs(nc12))

    intra = jnp.concatenate([upsample2x_nearest(out), conv01], axis=-1)
    intra = _plain_block(p["inner2"], intra)
    out, nc02 = dynamic_conv(
        p["out3"], intra, epipole, temperature, _DYN_KERNELS["out3"],
        train=train, collector=collector, path=f"{path}.out3", axis_name=axis_name,
        stat_groups=bn_groups, group_order=bn_group_order,
    )
    out = jnp.tanh(instance_norm(out))
    outputs["stage3"] = (out, (nc00**2 + nc01**2 + nc02**2) / 3, jnp.abs(nc02))
    return outputs


def init_feature_net(key) -> Params:
    b = BASE_CHANNELS
    keys = jax.random.split(key, 16)
    p: Params = {}
    # dynamic trunk (wrapped: normed => no conv bias)
    p["conv00"] = {"conv": init_dynamic_conv(keys[0], 3, b, _DYN_KERNELS["conv00"], bias=False)}
    p["conv01"] = {"conv": init_dynamic_conv(keys[1], b, b, _DYN_KERNELS["conv01"], bias=False)}
    p["downsample1"] = {"conv": init_conv2d(keys[2], 3, 3, b, 2 * b, False)}
    p["conv10"] = {"conv": init_dynamic_conv(keys[3], 2 * b, 2 * b, _DYN_KERNELS["conv10"], bias=False)}
    p["conv11"] = {"conv": init_dynamic_conv(keys[4], 2 * b, 2 * b, _DYN_KERNELS["conv11"], bias=False)}
    p["downsample2"] = {"conv": init_conv2d(keys[5], 3, 3, 2 * b, 4 * b, False)}
    p["conv20"] = {"conv": init_dynamic_conv(keys[6], 4 * b, 4 * b, _DYN_KERNELS["conv20"], bias=False)}
    p["conv21"] = {"conv": init_dynamic_conv(keys[7], 4 * b, 4 * b, _DYN_KERNELS["conv21"], bias=False)}
    # heads (raw DynamicConv => bias=True)
    p["out1"] = init_dynamic_conv(keys[8], 4 * b, 4 * b, _DYN_KERNELS["out1"], bias=True)
    p["inner1"] = {"conv": init_conv2d(keys[9], 1, 1, 6 * b, 2 * b, False)}
    p["out2"] = init_dynamic_conv(keys[10], 2 * b, 2 * b, _DYN_KERNELS["out2"], bias=True)
    p["inner2"] = {"conv": init_conv2d(keys[11], 1, 1, 3 * b, b, False)}
    p["out3"] = init_dynamic_conv(keys[12], b, b, _DYN_KERNELS["out3"], bias=True)
    return p
