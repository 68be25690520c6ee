"""Bilinear image sampling (the gather at the heart of plane-sweep warping).

Matches the semantics of torch ``F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)`` as used by the reference warping
(reference: models/utils/warping.py:100-103) and fusion (fusion.py:64), but is
formulated directly in *pixel* coordinates: with ``align_corners=True`` the
normalize→denormalize round trip is the identity, so the framework skips it
and never materializes a normalized grid.

This is the pure-XLA fallback path (a 4-corner gather + FMA); the fused
Pallas plane-sweep kernel supersedes it on the hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_pixel", "grid_sample_normalized"]


def grid_sample_pixel(src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``src`` at continuous pixel coordinates with zeros padding.

    Args:
      src: ``(B, H, W, C)`` feature map.
      x, y: ``(B, *S)`` pixel coordinates (x along W, y along H).

    Returns:
      ``(B, *S, C)`` bilinearly interpolated samples; coordinates outside the
      image contribute zeros per-corner (torch ``padding_mode='zeros'``).
    """
    B, H, W, C = src.shape
    sample_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(src.dtype)
    ty = (y - y0).astype(src.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    src_flat = src.reshape(B, H * W, C)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        idx = yi_c * W + xi_c  # (B, N)
        vals = jnp.take_along_axis(src_flat, idx[:, :, None], axis=1)  # (B, N, C)
        return vals * (w * inb.astype(src.dtype))[:, :, None]

    out = (
        corner(x0i, y0i, (1 - tx) * (1 - ty))
        + corner(x0i + 1, y0i, tx * (1 - ty))
        + corner(x0i, y0i + 1, (1 - tx) * ty)
        + corner(x0i + 1, y0i + 1, tx * ty)
    )
    return out.reshape(B, *sample_shape, C)


def grid_sample_normalized(src: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch-style sampling from a ``[-1, 1]`` normalized grid (align_corners=True).

    Args:
      src: ``(B, H, W, C)``.
      grid: ``(B, *S, 2)`` with ``grid[..., 0]`` = x, ``grid[..., 1]`` = y.
    """
    B, H, W, _ = src.shape
    x = (grid[..., 0] + 1) * ((W - 1) / 2)
    y = (grid[..., 1] + 1) * ((H - 1) / 2)
    return grid_sample_pixel(src, x, y)
