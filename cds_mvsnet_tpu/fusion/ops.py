"""On-device depth-map fusion: geometric consistency + averaging.

Behavioral reference: fusion.py (vendored from Vis-MVSNet) in
TruongKhang/cds-mvsnet — prob_filter / get_reproj / vis_filter / ave_fusion
(lines 68-114), used by test.py's "normal" filter path. All ops are batched
JAX (jit-able, static shapes); the reference's hardcoded ``.cuda()`` pixel
grid becomes a traced constant.

Conventions: depths ``(B, H, W)``, confidences channel-last, packed cams
``(B, 2, 4, 4)`` (``[:, 1, :3, :3]`` intrinsic). Pixel grid uses +0.5 centers
(reference get_pixel_grids). The reference's normalize-by-width +
align_corners=True sampling quirk (an (W-1)/W coordinate scale) is preserved
for output parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import _invert_intrinsics

_P = jax.lax.Precision.HIGHEST  # geometry matmuls must not drop to bf16
from ..ops.grid_sample import grid_sample_pixel

__all__ = [
    "pixel_center_grid",
    "unproject_to_world",
    "project_world_to_img",
    "prob_filter",
    "reproject",
    "visibility_filter",
    "average_fusion",
]


def pixel_center_grid(height: int, width: int, dtype=jnp.float32):
    """(x+0.5, y+0.5) grids, each (H, W)."""
    x = jnp.arange(width, dtype=dtype) + 0.5
    y = jnp.arange(height, dtype=dtype) + 0.5
    return jnp.broadcast_to(x[None, :], (height, width)), jnp.broadcast_to(
        y[:, None], (height, width)
    )


def _cam_inverses(cam: jnp.ndarray):
    """Exact K^-1 (3x3) and E^-1 (4x4) of packed cams (B,2,4,4)."""
    K = cam[:, 1, :3, :3]
    Kinv = _invert_intrinsics(K)
    R = cam[:, 0, :3, :3]
    t = cam[:, 0, :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    Einv = jnp.zeros_like(cam[:, 0])
    Einv = Einv.at[:, :3, :3].set(Rt)
    Einv = Einv.at[:, :3, 3:].set(-jnp.matmul(Rt, t, precision=_P))
    Einv = Einv.at[:, 3, 3].set(1.0)
    return Kinv, Einv


def unproject_to_world(depth: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """``depth (B,H,W)`` -> world points ``(B,H,W,3)`` (reference
    idx_img2cam + idx_cam2world, fusion.py:22-34, +0.5 pixel centers)."""
    B, H, W = depth.shape
    Kinv, Einv = _cam_inverses(cam)
    x, y = pixel_center_grid(H, W, depth.dtype)
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1).reshape(1, H * W, 3)
    cam_dirs = jnp.matmul(pix, jnp.swapaxes(Kinv, -1, -2), precision=_P)  # (B, HW, 3)
    cam_dirs = cam_dirs / (cam_dirs[..., 2:3] + 1e-9)
    cam_pts = cam_dirs * depth.reshape(B, H * W, 1)
    world = jnp.matmul(cam_pts, jnp.swapaxes(Einv[:, :3, :3], -1, -2), precision=_P) + Einv[:, None, :3, 3]
    return world.reshape(B, H, W, 3)


def project_world_to_img(points: jnp.ndarray, cam: jnp.ndarray):
    """World points ``(B,...,3)`` -> (x, y, z_cam) in +0.5-center pixel coords
    (reference idx_world2cam + idx_cam2img, fusion.py:36-47)."""
    shape = points.shape
    pts = points.reshape(shape[0], -1, 3)
    E = cam[:, 0]
    K = cam[:, 1, :3, :3]
    cam_pts = jnp.matmul(pts, jnp.swapaxes(E[:, :3, :3], -1, -2), precision=_P) + E[:, None, :3, 3]
    z = cam_pts[..., 2:3]
    img = jnp.matmul(cam_pts / (z + 1e-9), jnp.swapaxes(K, -1, -2), precision=_P)
    img = img / (img[..., 2:3] + 1e-9)
    out_shape = shape[:-1]
    return (
        img[..., 0].reshape(out_shape),
        img[..., 1].reshape(out_shape),
        z[..., 0].reshape(out_shape),
    )


def prob_filter(conf: jnp.ndarray, thresholds) -> jnp.ndarray:
    """Per-stage confidence AND-mask: ``conf (B,H,W,S)`` vs thresholds[S]
    (reference fusion.py:68-76)."""
    mask = None
    for i, t in enumerate(thresholds):
        m = conf[..., i] > t
        mask = m if mask is None else (mask & m)
    return mask


def _sample_ref_quirk(src_map: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample with the reference's normalize->clamp(±1.1)->align_corners=True
    round trip: pixel coords are scaled by (size-1)/size (fusion.py:60-64)."""
    B, H, W, _ = src_map.shape
    xn = jnp.clip(x / W * 2 - 1, -1.1, 1.1)
    yn = jnp.clip(y / H * 2 - 1, -1.1, 1.1)
    in_range = (
        jnp.minimum(
            jnp.minimum((xn >= -1), (xn <= 1)), jnp.minimum((yn >= -1), (yn <= 1))
        )
    ).astype(src_map.dtype)
    xs = (xn + 1) * ((W - 1) / 2)
    ys = (yn + 1) * ((H - 1) / 2)
    return grid_sample_pixel(src_map, xs, ys), in_range


def reproject(
    ref_depth: jnp.ndarray,
    src_depths: jnp.ndarray,
    ref_cam: jnp.ndarray,
    src_cams: jnp.ndarray,
):
    """For each ref pixel and src view: where the matching src pixel lands
    back in the ref image and the ref-frame depth it implies.

    Args:
      ref_depth ``(B,H,W)``, src_depths ``(B,V,H,W)``, ref_cam ``(B,2,4,4)``,
      src_cams ``(B,V,2,4,4)``.
    Returns:
      reproj_xyd ``(B,V,H,W,3)``, in_range ``(B,V,H,W)``
      (reference get_reproj, fusion.py:79-97).
    """
    B, V, H, W = src_depths.shape
    src_depths_f = src_depths.reshape(B * V, H, W)
    src_cams_f = src_cams.reshape(B * V, 2, 4, 4)
    ref_depth_r = jnp.broadcast_to(ref_depth[:, None], (B, V, H, W)).reshape(B * V, H, W)
    ref_cam_r = jnp.broadcast_to(ref_cam[:, None], (B, V, 2, 4, 4)).reshape(B * V, 2, 4, 4)

    # src pixel -> world -> ref image (x, y, ref-frame z)
    world = unproject_to_world(src_depths_f, src_cams_f)
    rx, ry, rz = project_world_to_img(world, ref_cam_r)
    xyd_src = jnp.stack([rx, ry, rz], axis=-1)  # (BV, H, W, 3)

    # warp that map into ref pixel space: project each ref pixel into the src
    # image (via ref depth) and sample.
    ref_world = unproject_to_world(ref_depth_r, ref_cam_r)
    sx, sy, _ = project_world_to_img(ref_world, src_cams_f)
    sampled, in_range = _sample_ref_quirk(xyd_src, sx, sy)
    return (
        sampled.reshape(B, V, H, W, 3),
        in_range.reshape(B, V, H, W),
    )


def visibility_filter(
    ref_depth: jnp.ndarray,
    reproj_xyd: jnp.ndarray,
    in_range: jnp.ndarray,
    img_dist_thresh: float,
    depth_thresh: float,
    vthresh: float,
):
    """Geometric-consistency masks (reference vis_filter, fusion.py:100-109).

    Returns (per-view masks ``(B,V,H,W)`` float, fused mask ``(B,H,W)`` bool:
    visible in >= vthresh-1.1 source views).
    """
    B, V, H, W = in_range.shape
    x, y = pixel_center_grid(H, W, ref_depth.dtype)
    dist = jnp.sqrt(
        (reproj_xyd[..., 0] - x) ** 2 + (reproj_xyd[..., 1] - y) ** 2
    )
    dist_mask = (dist < img_dist_thresh).astype(ref_depth.dtype)
    rd = reproj_xyd[..., 2]
    depth_mask = (
        jnp.abs(ref_depth[:, None] - rd) < jnp.maximum(ref_depth[:, None], rd) * depth_thresh
    ).astype(ref_depth.dtype)
    masks = jnp.minimum(jnp.minimum(in_range, dist_mask), depth_mask)
    mask = jnp.sum(masks, axis=1) >= (vthresh - 1.1)
    return masks, mask


def average_fusion(ref_depth: jnp.ndarray, reproj_xyd: jnp.ndarray, masks: jnp.ndarray):
    """Masked mean of reprojected depths incl. the reference (fusion.py:112-114)."""
    num = jnp.sum(reproj_xyd[..., 2] * masks, axis=1) + ref_depth
    den = jnp.sum(masks, axis=1) + 1
    return num / den
