"""Functional NN primitives: convolutions and normalization, NHWC/NDHWC layout.

Everything is a pure function over explicit parameter pytrees. Parameter
trees mirror the reference's ``state_dict`` paths (weights transposed to
TPU-friendly HWIO / DHWIO) so the checkpoint converter is a mechanical map
and parity is auditable leaf-by-leaf.

Norm semantics replicated exactly (SURVEY §2.5 — they matter for checkpoint
parity): InstanceNorm2d has no affine params and computes per-sample stats
even at eval; BatchNorm uses running stats at eval, biased batch variance for
normalization and unbiased for the running update at train (torch defaults,
eps 1e-5, momentum 0.1).

Matmul/conv precision is explicit: TPUs default to bf16 MXU passes, so parity
paths set HIGHEST (fp32-accurate) while perf paths may lower it.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# Module-global default; HIGHEST = fp32-accurate on the MXU (bf16x6 passes).
_DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def set_default_precision(p) -> None:
    global _DEFAULT_PRECISION
    _DEFAULT_PRECISION = p


def default_precision():
    return _DEFAULT_PRECISION


class StatsCollector:
    """Collects BatchNorm running-stat updates during a traced train step.

    Apply functions record ``{path: new_value}`` entries while tracing; the
    train step merges the resulting flat dict back into the state pytree.
    """

    def __init__(self):
        self.updates: dict[str, jnp.ndarray] = {}

    def add(self, path: str, mean: jnp.ndarray, var: jnp.ndarray) -> None:
        self.updates[path + ".running_mean"] = mean
        self.updates[path + ".running_var"] = var


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def conv2d(
    x: jnp.ndarray,
    p: Params,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | None = None,
    precision=None,
) -> jnp.ndarray:
    """2D conv, ``x (B,H,W,I)``, ``p['weight'] (kh,kw,I,O)``, optional bias."""
    w = p["weight"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    elif isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(stride, int):
        stride = (stride, stride)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision or _DEFAULT_PRECISION,
    )
    if p.get("bias") is not None:
        out = out + p["bias"].astype(out.dtype)
    return out


def conv3d(
    x: jnp.ndarray,
    p: Params,
    stride: int = 1,
    padding: int | None = None,
    precision=None,
) -> jnp.ndarray:
    """3D conv, ``x (B,D,H,W,I)``, ``p['weight'] (kd,kh,kw,I,O)``."""
    w = p["weight"].astype(x.dtype)
    if padding is None:
        padding = (w.shape[0] - 1) // 2
    pad = [(padding, padding)] * 3
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,) * 3,
        padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision or _DEFAULT_PRECISION,
    )
    if p.get("bias") is not None:
        out = out + p["bias"]
    return out


def _deconv(x, p, rank: int, stride: int, padding: int, output_padding: int, precision):
    """Transposed conv as an input-dilated direct conv.

    The converter stores transposed-conv weights spatially flipped and
    transposed to (k..., I, O), so this is an exact torch ConvTranspose
    equivalent: pad_lo = k-1-p, pad_hi = k-1-p+output_padding, lhs_dilation =
    stride.
    """
    w = p["weight"]
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    dims = ("NDHWC", "DHWIO", "NDHWC") if rank == 3 else ("NHWC", "HWIO", "NHWC")
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,) * rank,
        padding=[(lo, hi)] * rank,
        lhs_dilation=(stride,) * rank,
        dimension_numbers=dims,
        precision=precision or _DEFAULT_PRECISION,
    )
    if p.get("bias") is not None:
        out = out + p["bias"]
    return out


def deconv2d(x, p, stride=2, padding=1, output_padding=1, precision=None):
    return _deconv(x, p, 2, stride, padding, output_padding, precision)


def deconv3d(x, p, stride=2, padding=1, output_padding=1, precision=None):
    return _deconv(x, p, 3, stride, padding, output_padding, precision)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm without affine: normalize over all spatial axes
    (every axis but batch 0 and channel -1), per sample. torch's
    InstanceNorm2d defaults (affine=False, track_running_stats=False) mean
    this same computation runs at train *and* eval. Statistics are computed
    in fp32 regardless of the activation dtype."""
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def batch_norm(
    x: jnp.ndarray,
    p: Params,
    train: bool,
    collector: StatsCollector | None = None,
    path: str = "",
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: str | None = None,
    stat_groups: int = 1,
    group_order: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """BatchNorm over all axes but channel (-1). Affine if weight present.

    In train mode, records updated running stats into ``collector``. If
    ``axis_name`` is given, batch stats are averaged across that mapped mesh
    axis (sync-BN for data-parallel training).

    ``stat_groups > 1`` splits the leading batch dim into that many equal
    groups and computes batch statistics PER GROUP. This replicates the
    reference's per-call BN semantics when several logically-separate module
    invocations are batched into one (the 2·(V−1) FeatureNet calls,
    model.py:154-161): torch's DynamicConv attention BN sees one image per
    call, so stack-wide stats silently change the train-mode forward AND
    gradients (caught by tests/test_grad_parity.py). ``group_order`` maps
    stack-group index -> reference call index so the running-stat EMA
    replays torch's sequential r ← (1−m)·r + m·batch_k in call order.
    """
    if train and stat_groups > 1:
        G = stat_groups
        xg = x.reshape(G, x.shape[0] // G, *x.shape[1:])
        gaxes = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axis=gaxes)  # (G, C)
        mean_sq = jnp.mean(jnp.square(xg), axis=gaxes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        if collector is not None:
            n = xg[0].size // x.shape[-1]
            if axis_name is not None:
                n = n * jax.lax.psum(1, axis_name)
            unbiased = var * (n / max(n - 1, 1))
            order = group_order if group_order is not None else tuple(range(G))
            # closed form of G sequential EMA updates, in reference call order
            w = [0.0] * G
            for stack_idx, call_idx in enumerate(order):
                w[stack_idx] = momentum * (1 - momentum) ** (G - 1 - call_idx)
            wv = jnp.asarray(w, jnp.float32)
            decay = (1 - momentum) ** G
            collector.add(
                path,
                decay * p["running_mean"] + jnp.tensordot(wv, mean, 1),
                decay * p["running_var"] + jnp.tensordot(wv, unbiased, 1),
            )
        bshape = (G, *([1] * (xg.ndim - 2)), x.shape[-1])
        scale = jax.lax.rsqrt(var.astype(jnp.float32).reshape(bshape) + eps).astype(x.dtype)
        out = (xg - mean.reshape(bshape).astype(x.dtype)) * scale
        out = out.reshape(x.shape)
        if p.get("weight") is not None:
            out = out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
        return out
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        mean_sq = jnp.mean(jnp.square(x), axis=axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        if collector is not None:
            n = x.size // x.shape[-1]
            if axis_name is not None:
                n = n * jax.lax.psum(1, axis_name)
            unbiased = var * (n / max(n - 1, 1))
            collector.add(
                path,
                (1 - momentum) * p["running_mean"] + momentum * mean,
                (1 - momentum) * p["running_var"] + momentum * unbiased,
            )
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    scale = (jax.lax.rsqrt(var.astype(jnp.float32) + eps)).astype(x.dtype)
    out = (x - mean.astype(x.dtype)) * scale
    if p.get("weight") is not None:
        out = out * p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return out


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


# ---------------------------------------------------------------------------
# Initialization (torch-default semantics, for from-scratch training)
# ---------------------------------------------------------------------------


def init_conv(key, kshape: tuple[int, ...], cin_eff: int, bias: bool) -> Params:
    """torch Conv default init: kaiming_uniform(a=sqrt(5)) ⇒ U(±1/sqrt(fan_in))
    for the weight; bias U(±1/sqrt(fan_in)). ``kshape`` = (k..., I, O)."""
    wkey, bkey = jax.random.split(key)
    receptive = math.prod(kshape[:-2])
    fan_in = cin_eff * receptive
    bound = 1.0 / math.sqrt(fan_in)
    p: Params = {"weight": jax.random.uniform(wkey, kshape, jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(bkey, (kshape[-1],), jnp.float32, -bound, bound)
    return p


def init_conv2d(key, kh, kw, cin, cout, bias) -> Params:
    return init_conv(key, (kh, kw, cin, cout), cin, bias)


def init_conv3d(key, k, cin, cout, bias) -> Params:
    return init_conv(key, (k, k, k, cin, cout), cin, bias)


def init_deconv(key, kshape, cin, cout, bias) -> Params:
    """ConvTranspose fan_in in torch is cout * receptive (weight shape
    (I,O,k..)); stored here already flipped/transposed to (k..., I, O)."""
    wkey, bkey = jax.random.split(key)
    receptive = math.prod(kshape[:-2])
    fan_in = cout * receptive
    bound = 1.0 / math.sqrt(fan_in)
    p: Params = {"weight": jax.random.uniform(wkey, kshape, jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def init_batch_norm(c: int) -> Params:
    return {
        "weight": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }
