"""Depth-hypothesis generation and probability-volume regression.

Behavioral reference: models/module.py:373-439 (depth/conf regression, depth
range sampling) in TruongKhang/cds-mvsnet. Depth-plane tensors here live in
``(B, D, H, W)`` layout; probability volumes likewise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import resize_linear

__all__ = [
    "initial_depth_hypotheses",
    "refined_depth_hypotheses",
    "depth_regression",
    "confidence_regression",
    "softmax_entropy",
]


def initial_depth_hypotheses(depth_values: jnp.ndarray, ndepth: int) -> jnp.ndarray:
    """Uniformly respan ``(B, Dfull)`` depth values to ``(B, ndepth)``.

    Equals the reference's stage-1 ``get_depth_range_samples`` on a (B, D)
    input (module.py:420-433): linspace from first to last value. The spatial
    broadcast + trilinear resample in the reference is an identity on a
    spatially-constant volume, so it is elided here.
    """
    lo = depth_values[:, 0]
    hi = depth_values[:, -1]
    step = (hi - lo) / (ndepth - 1)
    return lo[:, None] + jnp.arange(ndepth, dtype=depth_values.dtype)[None, :] * step[:, None]


def refined_depth_hypotheses(
    cur_depth: jnp.ndarray,
    ndepth: int,
    depth_interval_pixel: jnp.ndarray,
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    out_hw: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Per-pixel depth windows centered on the previous stage's prediction.

    Args:
      cur_depth: ``(B, H, W)`` previous-stage depth at working resolution.
      depth_interval_pixel: ``(B, 1, 1)``-broadcastable step size.
      min_depth, max_depth: ``(B, 1, 1, 1)``-broadcastable range clamps.
        Like the reference (module.py:413-416), each sample saturates
        INDEPENDENTLY — windows at the range edges flatten (d0 == d1 ==
        min_depth there), so the hypotheses are NOT affine in the plane
        index at the edges (the ADVICE r4 finding the v9 exit-fusion tail
        must respect).
      out_hw: optional spatial size to bilinearly (align_corners=False)
        downsample the hypothesis volume to, matching the reference's
        trilinear resample to stage resolution (model.py:191-193; the D axis
        is an identity resample there).

    Returns:
      ``(B, ndepth, h, w)``.
    """
    B, H, W = cur_depth.shape
    nl = (ndepth - 1) // 2
    lo = cur_depth - nl * depth_interval_pixel  # (B, H, W)
    steps = jnp.arange(ndepth, dtype=cur_depth.dtype).reshape(1, ndepth, 1, 1)
    samples = lo[:, None] + steps * depth_interval_pixel[:, None]
    samples = min_depth + jnp.maximum(samples - min_depth, 0)
    samples = max_depth + jnp.minimum(samples - max_depth, 0)
    if out_hw is not None and out_hw != (H, W):
        samples = resize_linear(samples, out_hw, axes=(-2, -1), align_corners=False)
    return samples


def depth_regression(prob: jnp.ndarray, depth_values: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmin expectation: ``(B,D,h,w) x (B,D[,h,w]) -> (B,h,w)``."""
    if depth_values.ndim <= 2:
        depth_values = depth_values[:, :, None, None]
    return jnp.sum(prob * depth_values, axis=1)


def confidence_regression(prob: jnp.ndarray, n: int = 4) -> jnp.ndarray:
    """Photometric confidence: probability mass in a ±window around the
    regressed depth index (reference: module.py:382-391, window [d-1, d+2]).
    """
    B, D, h, w = prob.shape
    pad = jnp.pad(prob, ((0, 0), (n // 2 - 1, n // 2), (0, 0), (0, 0)))
    win = sum(pad[:, i : i + D] for i in range(n))  # (B, D, h, w)
    idx_f = depth_regression(
        jax.lax.stop_gradient(prob), jnp.arange(D, dtype=prob.dtype)[None]
    )
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)  # trunc matches .long()
    return jnp.take_along_axis(win, idx[:, None], axis=1)[:, 0]


def softmax_entropy(sim: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Entropy of softmax(sim) along ``axis`` (gradient-stopped input),
    keepdims. Reference: model.py:49-50."""
    p = jax.nn.softmax(jax.lax.stop_gradient(sim), axis=axis)
    return -jnp.sum(p * jnp.log(p), axis=axis, keepdims=True)
