"""Multi-view projective geometry: fundamental matrices, epipoles, plane-sweep warps.

Behavioral reference: models/dynamic_conv.py:7-47 (F-matrix/epipole) and
models/utils/warping.py:69-104 (homography warping) in TruongKhang/cds-mvsnet.
All functions are pure, batched, and jit-safe (static shapes, no host syncs).

Camera convention (same as the reference's cam.txt files): a view is a pair
``(extrinsic 4x4 world->cam, intrinsic 3x3)``, packed as ``(B, 2, 4, 4)`` with
``cams[:, 0]`` = extrinsic and ``cams[:, 1, :3, :3]`` = intrinsic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import grid_sample_pixel, pack_2x2, sample_packed_2x2

# Geometry matmuls are tiny but precision-critical: an un-annotated `@` runs
# as a single bf16 MXU pass on TPU, which costs up to several PIXELS of
# plane-sweep coordinate error. Always full fp32.
_P = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_P)

__all__ = [
    "skew_matrix",
    "fundamental_matrix",
    "epipole_from_fundamental",
    "compose_projection",
    "relative_warp_transform",
    "homography_warp",
]


def skew_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix of ``(B, 3)`` vectors -> ``(B, 3, 3)``."""
    zero = jnp.zeros_like(v[:, 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[:, 2], v[:, 1]], -1),
            jnp.stack([v[:, 2], zero, -v[:, 0]], -1),
            jnp.stack([-v[:, 1], v[:, 0], zero], -1),
        ],
        -2,
    )


def fundamental_matrix(cams1: jnp.ndarray, cams2: jnp.ndarray) -> jnp.ndarray:
    """F mapping image-1 points to epipolar lines in image 2.

    F = [e2']_x @ (K2 R2) @ (K1 R1)^-1 with e2' the projection of camera-1's
    center into image 2 (reference: dynamic_conv.py:19-38).
    """
    intr1, extr1 = cams1[:, 1, :3, :3], cams1[:, 0, :3, :4]
    intr2, extr2 = cams2[:, 1, :3, :3], cams2[:, 0, :3, :4]
    rot1, t1 = extr1[:, :, :3], extr1[:, :, 3:]
    rot2, t2 = extr2[:, :, :3], extr2[:, :, 3:]
    # Structure-exploiting inverses (exact, unlike a general fp32 LU):
    # rotations invert by transpose; the upper-triangular K analytically.
    rot1_T = jnp.swapaxes(rot1, -1, -2)
    rot2_T = jnp.swapaxes(rot2, -1, -2)
    center1 = -_mm(rot1_T, t1)
    center2 = -_mm(rot2_T, t2)
    proj2 = _mm(intr2, rot2)
    e2 = _mm(proj2, center1 - center2)[..., 0]  # (B, 3)
    # inv(K1 R1) = R1^T inv(K1)
    return _mm(_mm(_mm(skew_matrix(e2), proj2), rot1_T), _invert_intrinsics(intr1))


def _invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched upper-triangular pinhole intrinsics."""
    fx, s, cx = K[:, 0, 0], K[:, 0, 1], K[:, 0, 2]
    fy, cy = K[:, 1, 1], K[:, 1, 2]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([1 / fx, -s / (fx * fy), (s * cy - cx * fy) / (fx * fy)], -1)
    row1 = jnp.stack([zero, 1 / fy, -cy / fy], -1)
    row2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([row0, row1, row2], -2)


def epipole_from_fundamental(F: jnp.ndarray, det_eps: float = 1e-12) -> jnp.ndarray:
    """Epipole in image 1 (right null direction of F), dehomogenized to pixels.

    The reference solves a 2x2 linear system built from the rows of F
    (dynamic_conv.py:41-47), which is singular when the epipole lies at
    infinity (pure sideways translation). We reproduce that solve exactly in
    the regular case and fall back to the SVD null vector when the system
    degenerates, clamping the homogeneous scale, so the op never produces
    inf/nan under jit.
    """
    c = 1e3
    eq1 = c * F[:, 0] + F[:, 1] + F[:, 2]
    eq2 = c * F[:, 0] - F[:, 1] - F[:, 2]
    a, b = eq1[:, 0], eq1[:, 1]
    d, e = eq2[:, 0], eq2[:, 1]
    det = a * e - b * d
    ok = jnp.abs(det) > det_eps
    safe_det = jnp.where(ok, det, 1.0)
    rhs1, rhs2 = -eq1[:, 2], -eq2[:, 2]
    ex = (e * rhs1 - b * rhs2) / safe_det
    ey = (-d * rhs1 + a * rhs2) / safe_det
    direct = jnp.stack([ex, ey], -1)

    # Null-space fallback: smallest right singular vector of F, dehomogenized
    # with a clamped scale (epipole-at-infinity becomes a large finite point,
    # which only sets the *direction* field in DynamicConv, so magnitude past
    # the image frame is irrelevant).
    _, _, vt = jnp.linalg.svd(F)
    n = vt[:, -1, :]
    w = n[:, 2]
    w = jnp.sign(jnp.where(w == 0, 1.0, w)) * jnp.maximum(jnp.abs(w), 1e-8)
    fallback = n[:, :2] / w[:, None]
    return jnp.where(ok[:, None], direct, fallback)


def compose_projection(cams: jnp.ndarray) -> jnp.ndarray:
    """Fold intrinsics into the extrinsic: 4x4 with [:3,:4] = K @ E[:3,:4].

    Reference: model.py:40-43.
    """
    proj = cams[:, 0]
    top = _mm(cams[:, 1, :3, :3], cams[:, 0, :3, :4])
    return proj.at[:, :3, :4].set(top)


def relative_warp_transform(ref_cam: jnp.ndarray, src_cam: jnp.ndarray):
    """(rot, trans) of the ref-pixel→src-pixel homography basis.

    Equals ``(K_src·E_src) @ (K_ref·E_ref)^-1`` (reference: warping.py:80-82)
    but computed with exact structured inverses — rotation transpose and the
    analytic intrinsic inverse — instead of an fp32 LU of an ill-conditioned
    composed 4x4 (which loses ~1e-2 relative accuracy).

    Args:
      ref_cam, src_cam: ``(B, 2, 4, 4)`` packed (extrinsic, intrinsic).
    Returns:
      rot ``(B, 3, 3)``, trans ``(B, 3, 1)`` with
      ``x_src_h ∝ rot @ x_ref_h * depth + trans``.
    """
    K1, E1 = ref_cam[:, 1, :3, :3], ref_cam[:, 0]
    K2, E2 = src_cam[:, 1, :3, :3], src_cam[:, 0]
    R1, t1 = E1[:, :3, :3], E1[:, :3, 3:]
    R2, t2 = E2[:, :3, :3], E2[:, :3, 3:]
    R_rel = _mm(R2, jnp.swapaxes(R1, -1, -2))
    t_rel = t2 - _mm(R_rel, t1)
    rot = _mm(_mm(K2, R_rel), _invert_intrinsics(K1))
    trans = _mm(K2, t_rel)
    return rot, trans


def plane_sweep_coords(
    ref_cam: jnp.ndarray, src_cam: jnp.ndarray, depth_values: jnp.ndarray, H: int, W: int
):
    """Source-pixel coordinates of every (depth plane, ref pixel) pair.

    Returns (px, py) each ``(B, D, H*W)``, gradient-stopped (the reference
    computes the grid under no_grad — warping.py:79).
    """
    B, D = depth_values.shape[0], depth_values.shape[1]
    dtype = depth_values.dtype
    rot, trans = relative_warp_transform(ref_cam, src_cam)

    y, x = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    xyz = jnp.stack([x.ravel(), y.ravel(), jnp.ones(H * W, dtype=dtype)])  # (3, HW)
    rot_xyz = _mm(rot, xyz)  # (B, 3, HW)
    depth = depth_values.reshape(B, 1, D, -1)  # (B,1,D,1) or (B,1,D,HW)
    proj_xyz = rot_xyz[:, :, None, :] * depth + trans[:, :, None, :]  # (B, 3, D, HW)
    px = proj_xyz[:, 0] / (proj_xyz[:, 2] + 1e-6)  # (B, D, HW)
    py = proj_xyz[:, 1] / (proj_xyz[:, 2] + 1e-6)
    return jax.lax.stop_gradient(px), jax.lax.stop_gradient(py)


def homography_warp(
    src_feat: jnp.ndarray,
    ref_cam: jnp.ndarray,
    src_cam: jnp.ndarray,
    depth_values: jnp.ndarray,
    depth_chunk: int | None = None,
) -> jnp.ndarray:
    """Plane-sweep warp of source features into the reference frustum.

    Args:
      src_feat: ``(B, H, W, C)`` source-view features.
      ref_cam, src_cam: ``(B, 2, 4, 4)`` packed (extrinsic, intrinsic).
      depth_values: ``(B, D)`` fronto-parallel planes or ``(B, D, H, W)``
        per-pixel hypotheses.
      depth_chunk: if set, gather ``depth_chunk`` planes at a time — the
        bilinear gather materializes 4 corner temporaries, so chunking bounds
        HBM peak to ~4·chunk·H·W·C instead of 4·D·H·W·C.

    Returns:
      ``(B, D, H, W, C)`` warped features (zeros where a plane projects
      outside the source image). Reference: warping.py:69-104.
    """
    B, H, W, C = src_feat.shape
    D = depth_values.shape[1]
    px, py = plane_sweep_coords(ref_cam, src_cam, depth_values, H, W)

    packed = pack_2x2(src_feat)
    if depth_chunk is None or depth_chunk >= D:
        warped = sample_packed_2x2(
            packed, src_feat.shape, px.reshape(B, -1), py.reshape(B, -1)
        )
        return warped.reshape(B, D, H, W, C)

    chunks = []
    for d0 in range(0, D, depth_chunk):
        d1 = min(d0 + depth_chunk, D)
        w = sample_packed_2x2(
            packed,
            src_feat.shape,
            px[:, d0:d1].reshape(B, -1),
            py[:, d0:d1].reshape(B, -1),
        )
        chunks.append(w.reshape(B, d1 - d0, H, W, C))
    return jnp.concatenate(chunks, axis=1)
