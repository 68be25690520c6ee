"""Space-to-depth convolution: exact small-channel convs without lane waste.

XLA:TPU pads conv channels to 128 lanes and its conv cost scales with the
padded contraction size, so a k x k conv with 3-32 channels runs ~10-50x
below the hardware's ceiling. Re-expressing the conv on a space-to-depth
representation — pixels grouped into b x b blocks whose phases live in the
channel dim — raises channel counts to b²·C (>=128) and shrinks the kernel to
k' = ceil-ish((k + b - 1)/b) taps, making the conv MXU-shaped. The transform
is EXACT: the s2d weights are a scatter of the original weights over
(block-phase, tap) coordinates with zeros elsewhere.

Derivation (per spatial dim): with input s2d block size b_in, output block
size b_out, and conv stride s satisfying b_in = s·b_out, an output at block
offset oy reads input offset m = s·oy + dy − pad; its s2d tap is
floor(m / b_in) and its input phase m mod b_in. Taps are padded with zero
blocks, which reproduces torch zero padding exactly.

Channel order convention: ``(by, bx, c)`` flattened, i.e.
``x_s2d[n, y', x', (by·b + bx)·C + c] = x[n, b·y' + by, b·x' + bx, c]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "s2d_conv",
    "s2d_conv3d",
    "s2d_deconv3d_2x",
    "s2d_upsample2x_nearest",
    "s2d_instance_norm",
]


def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b·b·C)."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // b, b, W // b, b, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(N, H // b, W // b, b * b * C)


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(N, H', W', b·b·C) -> (N, H'·b, W'·b, C)."""
    N, Hp, Wp, BBC = x.shape
    C = BBC // (b * b)
    x = x.reshape(N, Hp, Wp, b, b, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(N, Hp * b, Wp * b, C)


@functools.lru_cache(maxsize=None)
def _tap_maps(k: int, pad: int, stride: int, b_in: int, b_out: int):
    """Static per-dim index maps. Returns (k', klo, dy_idx) with
    dy_idx[ky', oy, by] in [0, k] where k means 'zero tap'."""
    assert b_in == stride * b_out, (b_in, stride, b_out)
    m_min = -pad
    m_max = stride * (b_out - 1) + k - 1 - pad
    klo = m_min // b_in  # floor division
    khi = m_max // b_in
    kp = khi - klo + 1
    dy_idx = np.full((kp, b_out, b_in), k, dtype=np.int64)  # default: zero tap
    for kyp in range(kp):
        for oy in range(b_out):
            for by in range(b_in):
                m = (kyp + klo) * b_in + by
                dy = m + pad - stride * oy
                if 0 <= dy < k:
                    dy_idx[kyp, oy, by] = dy
    return kp, klo, dy_idx


def _s2d_weights(w: jnp.ndarray, b_in: int, b_out: int, stride: int, pad_h: int, pad_w: int):
    """(kh, kw, I, O) -> (kh', kw', b_in²·I, b_out²·O) plus s2d conv padding."""
    kh, kw, I, O = w.shape
    kph, klo_h, dy_idx = _tap_maps(kh, pad_h, stride, b_in, b_out)
    kpw, klo_w, dx_idx = _tap_maps(kw, pad_w, stride, b_in, b_out)

    wz = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero tap at index k
    dy = jnp.asarray(dy_idx)  # (kph, b_out, b_in)
    dx = jnp.asarray(dx_idx)
    # gather to (kph, kpw, oy, ox, by, bx, I, O)
    wp = wz[
        dy[:, None, :, None, :, None],  # (kph,1,oy,1,by,1)
        dx[None, :, None, :, None, :],  # (1,kpw,1,ox,1,bx)
    ]  # -> (kph, kpw, oy, ox, by, bx, I, O)
    # to (kph, kpw, (by,bx,I), (oy,ox,O))
    wp = jnp.transpose(wp, (0, 1, 4, 5, 6, 2, 3, 7))
    wp = wp.reshape(kph, kpw, b_in * b_in * I, b_out * b_out * O)
    pad_s2d = ((-klo_h, kph - 1 + klo_h), (-klo_w, kpw - 1 + klo_w))
    return wp, pad_s2d


def s2d_conv(
    x_s2d: jnp.ndarray,
    w: jnp.ndarray,
    b_in: int,
    b_out: int | None = None,
    stride: int = 1,
    padding: int | tuple[int, int] | None = None,
    precision=None,
) -> jnp.ndarray:
    """Conv on an s2d tensor, exactly equal to the plain conv on pixels.

    Args:
      x_s2d: ``(N, H/b_in, W/b_in, b_in²·I)``.
      w: plain conv weights ``(kh, kw, I, O)``.
      b_out: output block size; defaults to ``b_in // stride``.
    Returns:
      ``(N, H', W', b_out²·O)`` with H' = H/(stride·b_out).
    """
    from ..models.layers import default_precision

    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    elif isinstance(padding, int):
        padding = (padding, padding)
    if b_out is None:
        assert b_in % stride == 0
        b_out = b_in // stride
    wp, pad_s2d = _s2d_weights(w.astype(x_s2d.dtype), b_in, b_out, stride, *padding)
    return jax.lax.conv_general_dilated(
        x_s2d, wp,
        window_strides=(1, 1),
        padding=pad_s2d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision or default_precision(),
    )


def s2d_conv3d(
    x_s2d: jnp.ndarray,
    w: jnp.ndarray,
    b_in: int,
    stride: int = 1,
    padding: int = 1,
    precision=None,
) -> jnp.ndarray:
    """3D conv on a volume whose (h, w) dims are s2d: ``x (B, D, H', W',
    b_in²·I)``, plain weights ``(kd, kh, kw, I, O)``. The D axis is handled
    natively (stride/pad apply to it too); the spatial axes via the exact s2d
    weight rescatter. Output block = b_in // stride."""
    from ..models.layers import default_precision

    kd, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    b_out = b_in // stride
    planes = []
    for dz in range(kd):
        wp, pad_s2d = _s2d_weights(
            w[dz].astype(x_s2d.dtype), b_in, b_out, stride, (kh - 1) // 2, (kw - 1) // 2
        )
        planes.append(wp)
    w3 = jnp.stack(planes, axis=0)  # (kd, kh', kw', b_in² I, b_out² O)
    return jax.lax.conv_general_dilated(
        x_s2d, w3,
        window_strides=(stride, 1, 1),
        padding=[(padding, padding), pad_s2d[0], pad_s2d[1]],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision or default_precision(),
    )


@functools.lru_cache(maxsize=None)
def _deconv2x_tap_map(k: int, pad: int, b_in: int):
    """Per-dim map for a stride-2 transposed conv in s2d space with the SAME
    grid and b_out = 2·b_in. Weights are assumed stored pre-flipped (as by
    the converter, for direct-conv equivalence): w_flip[j] = W_t[k-1-j].

    out[y_o] = sum over (y_i, j): 2 y_i + (k-1-j) - pad = y_o of x[y_i]·w_flip[j].
    """
    b_out = 2 * b_in
    # m = y_i offset relative to block start; tap ky' = floor(m / b_in)
    entries = {}
    klo, khi = 0, 0
    for oy in range(b_out):
        for j in range(k):
            t = oy + pad - (k - 1 - j)
            if t % 2 != 0:
                continue
            m = t // 2
            ky = m // b_in
            klo = min(klo, ky)
            khi = max(khi, ky)
            entries[(oy, j)] = (ky, m - ky * b_in)
    kp = khi - klo + 1
    idx = np.full((kp, b_out, b_in), k, dtype=np.int64)  # k = zero tap
    for (oy, j), (ky, by) in entries.items():
        idx[ky - klo, oy, by] = j
    return kp, klo, idx


def s2d_deconv3d_2x(
    x_s2d: jnp.ndarray,
    w: jnp.ndarray,
    b_in: int,
    precision=None,
) -> jnp.ndarray:
    """Transposed 3D conv (k=3, stride=2, pad=1, output_padding=1 — exact 2x
    upsampling) on an (h,w)-s2d volume. ``w (3,3,3,I,O)`` stored pre-flipped
    in ALL spatial dims (converter layout). D is upsampled via lhs_dilation;
    (h, w) stay on the SAME grid with b_out = 2·b_in.

    Output: ``(B, 2D, H', W', (2·b_in)²·O)``.
    """
    from ..models.layers import default_precision

    k = w.shape[0]
    b_out = 2 * b_in
    kp_h, klo_h, hy = _deconv2x_tap_map(k, 1, b_in)
    kp_w, klo_w, hx = _deconv2x_tap_map(k, 1, b_in)
    I, O = w.shape[3], w.shape[4]

    planes = []
    for dz in range(k):
        wz = jnp.pad(w[dz].astype(x_s2d.dtype), ((0, 1), (0, 1), (0, 0), (0, 0)))
        dy = jnp.asarray(hy)
        dx = jnp.asarray(hx)
        wp = wz[
            dy[:, None, :, None, :, None],
            dx[None, :, None, :, None, :],
        ]  # (kp, kp, oy(2b), ox(2b), by, bx, I, O)
        wp = jnp.transpose(wp, (0, 1, 4, 5, 6, 2, 3, 7)).reshape(
            kp_h, kp_w, b_in * b_in * I, b_out * b_out * O
        )
        planes.append(wp)
    w3 = jnp.stack(planes, axis=0)

    # D axis: transposed k3/s2/p1/op1 == direct conv on 2x-dilated input with
    # pre-flipped taps and padding (1, 2) (see models/layers._deconv)
    return jax.lax.conv_general_dilated(
        x_s2d, w3,
        window_strides=(1, 1, 1),
        padding=[(1, 2), (-klo_h, kp_h - 1 + klo_h), (-klo_w, kp_w - 1 + klo_w)],
        lhs_dilation=(2, 1, 1),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision or default_precision(),
    )


def s2d_upsample2x_nearest(x_s2d: jnp.ndarray, b_src: int, C: int) -> jnp.ndarray:
    """Nearest 2x upsample, s2d(b_src) source -> s2d(2·b_src) target on the
    SAME spatial grid: a constant channel permutation/duplication.

    target phase (oy, ox) reads source phase (oy//2, ox//2).
    """
    b_t = 2 * b_src
    idx = np.empty(b_t * b_t * C, dtype=np.int64)
    for oy in range(b_t):
        for ox in range(b_t):
            for c in range(C):
                idx[(oy * b_t + ox) * C + c] = ((oy // 2) * b_src + (ox // 2)) * C + c
    return jnp.take(x_s2d, jnp.asarray(idx), axis=-1)


def s2d_instance_norm(x_s2d: jnp.ndarray, b: int, C: int, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm matching plain pixel-space semantics: statistics per
    (sample, TRUE channel) over all pixels — i.e. reduce over spatial dims AND
    the b² phase sub-axis."""
    N, Hp, Wp, _ = x_s2d.shape
    xr = x_s2d.reshape(N, Hp, Wp, b * b, C).astype(jnp.float32)
    mean = jnp.mean(xr, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xr, axis=(1, 2, 3), keepdims=True)
    out = (xr - mean) * jax.lax.rsqrt(var + eps)
    return out.reshape(N, Hp, Wp, -1).astype(x_s2d.dtype)
