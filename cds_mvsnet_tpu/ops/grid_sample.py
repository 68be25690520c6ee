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

__all__ = [
    "grid_sample_pixel",
    "grid_sample_pixel_packed",
    "grid_sample_normalized",
    "pack_2x2",
    "sample_packed_2x2",
]


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


def grid_sample_pixel_packed(src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with ONE gather per output instead of four.

    TPU gathers are latency-bound per gathered row, so the four corner
    lookups dominate plane-sweep cost. This variant pre-packs each pixel's
    2x2 neighborhood into channels — packed[y, x] = (src[y,x], src[y,x+1],
    src[y+1,x], src[y+1,x+1]) — so a single row-gather at (y0, x0) fetches
    all four corners (and fills 4C lanes instead of C, quadrupling lane
    utilization of the padded gather row). Numerically identical to
    :func:`grid_sample_pixel`.
    """
    return sample_packed_2x2(pack_2x2(src), src.shape, x, y)


def pack_2x2(src: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W,4C) with each pixel's 2x2 neighborhood in channels."""
    right = jnp.pad(src[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = jnp.pad(src[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    diag = jnp.pad(src[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([src, right, down, diag], axis=-1)


def sample_packed_2x2(
    packed: jnp.ndarray, src_shape, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample from a :func:`pack_2x2` tensor at pixel coordinates."""
    B, H, W, C = src_shape
    dtype = packed.dtype
    sample_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(dtype)
    ty = (y - y0).astype(dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Clamp the gather base so (bx+1, by+1) always exist; when the true base
    # is clamped, an in-bounds corner's packed slot shifts by (dy, dx) — and
    # whenever a corner IS in bounds its shifted slot stays within the 2x2
    # block, so a slot-select recovers exact zeros-padding semantics.
    bx = jnp.clip(x0i, 0, W - 2)
    by = jnp.clip(y0i, 0, H - 2)
    dx = x0i - bx  # in {…,-1,0,1,…}; only -1/0/1 can co-occur with valid masks
    dy = y0i - by
    idx = by * W + bx
    rows = jnp.take_along_axis(packed.reshape(B, H * W, 4 * C), idx[:, :, None], axis=1)
    c00 = rows[..., :C]
    c01 = rows[..., C : 2 * C]
    c10 = rows[..., 2 * C : 3 * C]
    c11 = rows[..., 3 * C :]

    def corner(ox, oy, w):
        xi = x0i + ox
        yi = y0i + oy
        mask = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).astype(dtype)
        px = (dx + ox)[:, :, None] == 0
        py = (dy + oy)[:, :, None] == 0
        val = jnp.where(py, jnp.where(px, c00, c01), jnp.where(px, c10, c11))
        return val * (w * mask)[:, :, None]

    out = (
        corner(0, 0, (1 - tx) * (1 - ty))
        + corner(1, 0, tx * (1 - ty))
        + corner(0, 1, (1 - tx) * ty)
        + corner(1, 1, tx * ty)
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
