"""Scan-level fusion pipeline: filter per-view depth maps and fuse into a
point cloud (.ply).

Behavioral reference: test.py:268-395 (TTDataset + filter_depth) in
TruongKhang/cds-mvsnet. The per-view math (prob filter, reprojection,
visibility filter, average fusion, unprojection) runs as ONE jitted program
per view; only the variable-size point gather happens on the host.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..io.cams import read_cam_file, read_pair_file
from ..io.pfm import read_pfm
from ..io.ply import write_ply
from .ops import (
    average_fusion,
    prob_filter,
    reproject,
    unproject_to_world,
    visibility_filter,
)

__all__ = ["FusionConfig", "fuse_scan", "fuse_view", "fuse_scan_native"]


@dataclass(frozen=True)
class FusionConfig:
    n_src_views: int = 10
    conf_thresholds: tuple[float, ...] = (0.0, 0.0, 0.0)
    img_dist_thresh: float = 1.0
    depth_thresh: float = 0.01
    vthresh: float = 3.0


@partial(jax.jit, static_argnames=("cfg",))
def fuse_view(
    ref_depth: jnp.ndarray,  # (H, W)
    ref_conf: jnp.ndarray,  # (H, W, S)
    src_depths: jnp.ndarray,  # (V, H, W)
    src_confs: jnp.ndarray,  # (V, H, W, S)
    ref_cam: jnp.ndarray,  # (2, 4, 4)
    src_cams: jnp.ndarray,  # (V, 2, 4, 4)
    cfg: FusionConfig,
):
    """One reference view -> (world points (H,W,3), final mask (H,W),
    fused depth (H,W)). Mirrors test.py:326-352."""
    rd = ref_depth[None]
    rc = ref_cam[None]
    sd = src_depths[None]
    sc = src_cams[None]

    src_mask = prob_filter(src_confs, cfg.conf_thresholds)  # (V, H, W)
    sd = sd * src_mask[None].astype(sd.dtype)
    ref_mask = prob_filter(ref_conf[None], cfg.conf_thresholds)  # (1, H, W)

    reproj_xyd, in_range = reproject(rd, sd, rc, sc)
    vis_masks, vis_mask = visibility_filter(
        rd, reproj_xyd, in_range, cfg.img_dist_thresh, cfg.depth_thresh, cfg.vthresh
    )
    fused = average_fusion(rd, reproj_xyd, vis_masks)  # (1, H, W)
    mask = jnp.minimum(ref_mask, vis_mask)
    points = unproject_to_world(fused, rc)  # (1, H, W, 3)
    return points[0], mask[0], fused[0]


def _load_view(scan_folder: str, vid: int):
    depth = read_pfm(os.path.join(scan_folder, f"depth_est/{vid:0>8}.pfm"))[0]
    conf = read_pfm(os.path.join(scan_folder, f"confidence/{vid:0>8}.pfm"))[0]
    cf = read_cam_file(os.path.join(scan_folder, f"cams/{vid:0>8}_cam.txt"))
    cam = np.zeros((2, 4, 4), dtype=np.float32)
    cam[0] = cf.extrinsic
    cam[1, :3, :3] = cf.intrinsic
    cam[1, 3, 3] = 1.0
    return depth, conf, cam


def fuse_scan(
    pair_folder: str,
    scan_folder: str,
    ply_path: str,
    cfg: FusionConfig = FusionConfig(),
    verbose: bool = False,
) -> int:
    """Fuse every reference view of a scan into one .ply. Returns #points."""
    from ..data.image import load_image

    pairs = read_pair_file(os.path.join(pair_folder, "pair.txt"))
    all_pts, all_cols = [], []
    for ref_id, src_ids in pairs:
        src_ids = list(src_ids)[: cfg.n_src_views]
        if not src_ids:
            continue
        ref_depth, ref_conf, ref_cam = _load_view(scan_folder, ref_id)
        srcs = [_load_view(scan_folder, v) for v in src_ids]
        src_depths = np.stack([s[0] for s in srcs])
        src_confs = np.stack([s[1] for s in srcs])
        src_cams = np.stack([s[2] for s in srcs])

        points, mask, _ = fuse_view(
            jnp.asarray(ref_depth),
            jnp.asarray(ref_conf),
            jnp.asarray(src_depths),
            jnp.asarray(src_confs),
            jnp.asarray(ref_cam),
            jnp.asarray(src_cams),
            cfg,
        )
        mask_np = np.asarray(mask).astype(bool)
        pts = np.asarray(points)[mask_np]
        img = load_image(os.path.join(scan_folder, f"images/{ref_id:0>8}.jpg"))
        if img.shape[:2] != mask_np.shape:
            from ..data.image import resize_nearest_np

            img = resize_nearest_np(img, mask_np.shape)
        cols = (img[mask_np] * 255).astype(np.uint8)
        all_pts.append(pts)
        all_cols.append(cols)
        if verbose:
            print(
                f"{scan_folder} ref {ref_id:02d}: mask {mask_np.mean():.3f}, "
                f"{len(pts)} pts"
            )

    pts = np.concatenate(all_pts, axis=0) if all_pts else np.zeros((0, 3), np.float32)
    cols = np.concatenate(all_cols, axis=0) if all_cols else np.zeros((0, 3), np.uint8)
    write_ply(ply_path, pts, cols)
    return len(pts)


def fuse_scan_native(
    scan_folder: str,
    ply_path: str,
    conf_thresholds=(0.0, 0.0, 0.0),
    disp_thresh: float = 0.2,
    num_consistent: int = 3,
    view_ids: list[int] | None = None,
) -> int:
    """Fuse a scan with the native C++ fusibile-equivalent (duplicate-
    suppressing) fusion — the path behind the reference's published DTU
    numbers (scripts/dtu_eval.sh uses the gipuma filter)."""
    from ..data.image import load_image
    from .native import fuse_depth_maps_native

    if view_ids is None:
        view_ids = sorted(
            int(p.stem) for p in (Path(scan_folder) / "depth_est").glob("*.pfm")
        )
    if not view_ids:
        raise FileNotFoundError(
            f"no depth maps under {scan_folder}/depth_est — run inference first "
            "(or check --testlist: 'all' lists every directory in --testpath, "
            "including a nested --outdir)"
        )
    depths, cams, colors = [], [], []
    for vid in view_ids:
        d, conf, cam = _load_view(scan_folder, vid)
        keep = np.ones(d.shape, bool)
        for s, t in enumerate(conf_thresholds):
            keep &= conf[..., s] > t
        depths.append(np.where(keep, d, 0.0).astype(np.float32))
        cams.append(cam)
        img = load_image(os.path.join(scan_folder, f"images/{vid:0>8}.jpg"))
        colors.append((img * 255).astype(np.uint8))
    pts, cols = fuse_depth_maps_native(
        np.stack(depths), np.stack(cams), np.stack(colors),
        disp_thresh=disp_thresh, num_consistent=num_consistent,
    )
    write_ply(ply_path, pts, cols)
    return len(pts)
