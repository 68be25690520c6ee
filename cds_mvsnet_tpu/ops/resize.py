"""Shape-static image/volume resizing with PyTorch-compatible sampling semantics.

The reference pipeline resamples tensors in several places whose exact index
arithmetic matters for numerical parity (reference: models/model.py:159-160,
181-193 and the cv2-based dataset resizes). All output shapes here are static,
so sampling indices and weights are precomputed on the host with float64 and
baked into the compiled program as constants — the device does pure gathers
and fused multiply-adds, which XLA maps onto the VPU without dynamic indexing.

Semantics implemented:
  * ``nearest``   — torch ``F.interpolate(mode='nearest')`` / cv2 INTER_NEAREST:
                    src = floor(i * in/out).
  * ``linear``    — torch ``align_corners=False`` / cv2 INTER_LINEAR:
                    src = clamp((i + 0.5) * in/out - 0.5, 0), clamp-to-edge.
  * ``linear_ac`` — torch ``align_corners=True``: src = i * (in-1)/(out-1).

Linear interpolation is separable, so N-D resizes are applied axis-by-axis;
this matches torch's joint bilinear/trilinear exactly.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_nearest", "resize_linear", "upsample2x_nearest"]


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch computes the scale in float32 and floors i * scale.
    scale = np.float32(in_size / out_size)
    idx = np.floor(np.arange(out_size, dtype=np.float32) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(i)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        src = np.maximum((i + 0.5) * in_size / out_size - 0.5, 0.0)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = (src - lo).astype(np.float32)
    return lo, hi, t


def _gather_axis(x: jnp.ndarray, idx: np.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _resize_axis(x: jnp.ndarray, out_size: int, axis: int, mode: str) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if mode == "nearest":
        return _gather_axis(x, _nearest_indices(in_size, out_size), axis)
    lo, hi, t = _linear_weights(in_size, out_size, mode == "linear_ac")
    shape = [1] * x.ndim
    shape[axis] = out_size
    tw = jnp.asarray(t).reshape(shape).astype(x.dtype)
    return _gather_axis(x, lo, axis) * (1 - tw) + _gather_axis(x, hi, axis) * tw


def resize(x: jnp.ndarray, out_shape: tuple[int, ...], axes: tuple[int, ...], mode: str) -> jnp.ndarray:
    """Resize ``x`` along ``axes`` to ``out_shape`` (one entry per axis)."""
    assert len(out_shape) == len(axes)
    for size, axis in zip(out_shape, axes):
        x = _resize_axis(x, size, axis, mode)
    return x


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int], axes=(-3, -2)) -> jnp.ndarray:
    """Nearest-neighbor spatial resize (default: NHWC layout)."""
    axes = tuple(a % x.ndim for a in axes)
    return resize(x, out_hw, axes, "nearest")


def resize_linear(
    x: jnp.ndarray, out_shape: tuple[int, ...], axes, align_corners: bool = False
) -> jnp.ndarray:
    axes = tuple(a % x.ndim for a in axes)
    return resize(x, out_shape, axes, "linear_ac" if align_corners else "linear")


def upsample2x_nearest(x: jnp.ndarray, axes=(-3, -2)) -> jnp.ndarray:
    """2x nearest upsample == repeat; cheaper than a gather on TPU."""
    for a in axes:
        x = jnp.repeat(x, 2, axis=a % x.ndim)
    return x
