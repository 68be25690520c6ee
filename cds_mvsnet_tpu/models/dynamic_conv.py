"""Curvature-guided dynamic-scale convolution — the reference's core novelty.

Behavioral reference: models/dynamic_conv.py:81-122 in TruongKhang/cds-mvsnet.

Per candidate kernel size k, a 3-channel "curvature coefficient" conv and a
full conv share the same input; the per-pixel directional curvature along the
epipolar direction (u, v) = normalize((x, y) − epipole) is
``coeffs · (u², 2uv, v²)``, and a small 1×1-conv MLP + temperature softmax
over the K curvatures mixes the K conv branches per pixel.

TPU-first formulation: for each kernel size, the curvature conv and the full
conv are fused into ONE ``lax.conv`` by concatenating their output channels at
trace time (parameters stay separate for checkpoint parity — XLA folds the
concat of two constant weights). All branches evaluate densely (there is no
divergence to exploit; the mixture is a VPU-friendly weighted sum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import Params, StatsCollector, batch_norm, conv2d

__all__ = ["dynamic_conv", "init_dynamic_conv", "epipolar_direction_quadratic"]


def epipolar_direction_quadratic(
    epipole: jnp.ndarray, height: int, width: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Per-pixel (u², 2uv, v²) of the unit epipolar direction.

    Args:
      epipole: ``(B, 2)`` pixel coordinates of the epipole.
    Returns:
      ``(B, H, W, 3)``.
    """
    epipole = epipole.astype(jnp.float32)  # direction math needs fp32 range
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    u = xs[None, None, :] - epipole[:, 0, None, None]  # (B, 1, W) -> broadcast
    v = ys[None, :, None] - epipole[:, 1, None, None]  # (B, H, 1)
    u = jnp.broadcast_to(u, (epipole.shape[0], height, width))
    v = jnp.broadcast_to(v, (epipole.shape[0], height, width))
    norm = jnp.sqrt(u * u + v * v)
    u = u / (norm + 1e-6)
    v = v / (norm + 1e-6)
    return jnp.stack([u * u, 2 * u * v, v * v], axis=-1).astype(dtype)


def dynamic_conv(
    p: Params,
    x: jnp.ndarray,
    epipole: jnp.ndarray,
    temperature: float,
    size_kernels: tuple[int, ...],
    train: bool = False,
    collector: StatsCollector | None = None,
    path: str = "",
    axis_name: str | None = None,
    stat_groups: int = 1,
    group_order: tuple[int, ...] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a dynamic conv. ``x (B,H,W,I)`` -> (out ``(B,H,W,O)``, norm_curv
    ``(B,H,W,1)``). ``stat_groups``/``group_order``: per-call attention-BN
    statistics when multiple reference-level calls are batched (layers.py
    batch_norm docstring)."""
    B, H, W, _ = x.shape
    quad = epipolar_direction_quadratic(epipole, H, W, x.dtype)  # (B,H,W,3)

    curvs = []
    results = []
    for i, k in enumerate(size_kernels):
        conv_p = p["convs"][str(i)]
        att_w = p["att_convs"][str(i)]["weight"]
        out_c = conv_p["weight"].shape[-1]
        fused_w = jnp.concatenate([conv_p["weight"], att_w], axis=-1)  # (k,k,I,O+3)
        fused = conv2d(x, {"weight": fused_w}, padding=(k - 1) // 2)
        res, curv_coef = fused[..., :out_c], fused[..., out_c:]
        if conv_p.get("bias") is not None:
            res = res + conv_p["bias"]
        curvs.append(jnp.sum(curv_coef * quad, axis=-1, keepdims=True))
        results.append(res)

    curvs = jnp.concatenate(curvs, axis=-1)  # (B, H, W, K)
    w = conv2d(curvs, p["att_weights"]["0"])  # 1x1, K -> hidden
    w = batch_norm(w, p["att_weights"]["1"], train, collector, path + ".att_weights.1",
                   axis_name=axis_name, stat_groups=stat_groups,
                   group_order=group_order)
    w = jax.nn.relu(w)
    w = conv2d(w, p["att_weights"]["3"])  # 1x1, hidden -> K
    # temperature softmax in fp32: at T=0.01 logits scale by 100x, which
    # saturates in bf16
    w = jax.nn.softmax(w.astype(jnp.float32) / temperature, axis=-1).astype(x.dtype)

    out = sum(results[i] * w[..., i : i + 1] for i in range(len(size_kernels)))
    # norm_curv is carried channel-less (B,H,W): a trailing singleton channel
    # would be lane-padded to 128 on TPU (128x HBM waste on full-res maps)
    norm_curv = jnp.sum(curvs * w, axis=-1)
    return out, norm_curv


def init_dynamic_conv(
    key, in_c: int, out_c: int, size_kernels: tuple[int, ...], bias: bool = True,
    hidden_dim: int = 4,
) -> Params:
    """Reference init: att_convs ~ N(0, 0.1); convs/MLP torch conv defaults."""
    from .layers import init_batch_norm, init_conv2d

    keys = jax.random.split(key, 2 * len(size_kernels) + 2)
    p: Params = {"att_convs": {}, "convs": {}, "att_weights": {}}
    for i, k in enumerate(size_kernels):
        p["att_convs"][str(i)] = {
            "weight": 0.1 * jax.random.normal(keys[2 * i], (k, k, in_c, 3), jnp.float32)
        }
        p["convs"][str(i)] = init_conv2d(keys[2 * i + 1], k, k, in_c, out_c, bias)
    nk = len(size_kernels)
    p["att_weights"]["0"] = {"weight": init_conv2d(keys[-2], 1, 1, nk, hidden_dim, False)["weight"]}
    p["att_weights"]["1"] = init_batch_norm(hidden_dim)
    p["att_weights"]["3"] = {"weight": init_conv2d(keys[-1], 1, 1, hidden_dim, nk, False)["weight"]}
    return p
