"""Standalone depth-map evaluation vs DTU ground truth.

Behavioral reference: evaluations/precision.py in TruongKhang/cds-mvsnet —
MAE / RMSE / <1,2,4 mm inlier ratios of estimated depth PFMs against GT
depth, masked by the GT visibility mask, at the estimate's resolution.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..data.image import resize_nearest_np
from ..io.pfm import read_pfm

__all__ = ["DepthMetrics", "eval_depth_map", "eval_scan_depths"]


@dataclass
class DepthMetrics:
    mae: float
    rmse: float
    inlier_1mm: float
    inlier_2mm: float
    inlier_4mm: float
    n_pixels: int

    def as_dict(self):
        return self.__dict__.copy()


def eval_depth_map(est: np.ndarray, gt: np.ndarray, mask: np.ndarray | None = None) -> DepthMetrics:
    if gt.shape != est.shape:
        gt = resize_nearest_np(gt, est.shape[:2])
        if mask is not None:
            mask = resize_nearest_np(mask, est.shape[:2])
    valid = gt > 0
    if mask is not None:
        valid &= mask > 0.5
    err = np.abs(est - gt)[valid]
    if err.size == 0:
        return DepthMetrics(np.nan, np.nan, np.nan, np.nan, np.nan, 0)
    return DepthMetrics(
        mae=float(err.mean()),
        rmse=float(np.sqrt((err**2).mean())),
        inlier_1mm=float((err < 1).mean()),
        inlier_2mm=float((err < 2).mean()),
        inlier_4mm=float((err < 4).mean()),
        n_pixels=int(err.size),
    )


def eval_scan_depths(est_dir: str, gt_dir: str, view_ids, mask_dir: str | None = None):
    """Average metrics over a scan's views. est layout: depth_est/%08d.pfm;
    gt layout: depth_map_%04d.pfm (+ optional depth_visual_%04d.png masks)."""
    from PIL import Image

    per_view = []
    for vid in view_ids:
        est = read_pfm(os.path.join(est_dir, f"depth_est/{vid:0>8}.pfm"))[0]
        gt = read_pfm(os.path.join(gt_dir, f"depth_map_{vid:0>4}.pfm"))[0]
        mask = None
        if mask_dir:
            mp = os.path.join(mask_dir, f"depth_visual_{vid:0>4}.png")
            if os.path.exists(mp):
                mask = (np.asarray(Image.open(mp), dtype=np.float32) > 10).astype(np.float32)
        per_view.append(eval_depth_map(est, gt, mask))
    keys = ["mae", "rmse", "inlier_1mm", "inlier_2mm", "inlier_4mm"]
    mean = {k: float(np.nanmean([getattr(m, k) for m in per_view])) for k in keys}
    return per_view, mean
