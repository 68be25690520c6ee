"""Masked depth validation metrics.

Behavioral reference: utils.py:107-167 in TruongKhang/cds-mvsnet
(DictAverageMeter, Thres_metrics, AbsDepthError_metrics) — per-image masked
reductions averaged over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["threshold_error", "abs_depth_error", "DictAverageMeter", "validation_metrics"]


def _per_image(fn, depth_est, depth_gt, mask):
    vals = [fn(depth_est[i], depth_gt[i], mask[i]) for i in range(depth_est.shape[0])]
    return jnp.stack(vals).mean()


def threshold_error(depth_est, depth_gt, mask, thres: float):
    """Fraction of masked pixels with |err| > thres (per image, then mean)."""

    def one(est, gt, m):
        err = jnp.abs(est - gt) > thres
        msum = jnp.maximum(m.sum(), 1.0)
        return jnp.sum(err * m) / msum

    return _per_image(one, depth_est, depth_gt, mask.astype(depth_est.dtype))


def abs_depth_error(depth_est, depth_gt, mask, band: tuple[float, float] | None = None):
    """Mean |err| over masked pixels, optionally restricted to an error band."""

    def one(est, gt, m):
        err = jnp.abs(est - gt)
        sel = m
        if band is not None:
            sel = sel * ((err >= band[0]) & (err <= band[1])).astype(m.dtype)
        return jnp.sum(err * sel) / jnp.maximum(jnp.sum(sel), 1.0)

    return _per_image(one, depth_est, depth_gt, mask.astype(depth_est.dtype))


def validation_metrics(depth_est, depth_gt, mask, depth_interval: float) -> dict:
    """The reference's validation panel (trainer/trainer.py:140-164):
    di = interval / 2.65, thresholds at 2/4/8/14/20 di plus banded abs errors."""
    di = depth_interval / 2.65
    m = mask > 0.5
    out = {"abs_depth_error": abs_depth_error(depth_est, depth_gt, m)}
    for k in (2, 4, 8, 14, 20):
        out[f"thres{k}mm_error"] = threshold_error(depth_est, depth_gt, m, di * k)
    bands = [
        ("thres2mm_abserror", 0, 2),
        ("thres4mm_abserror", 2, 4),
        ("thres8mm_abserror", 4, 8),
        ("thres14mm_abserror", 8, 14),
        ("thres20mm_abserror", 14, 20),
        ("thres>20mm_abserror", 20, 1e5 / di),
    ]
    for name, lo, hi in bands:
        out[name] = abs_depth_error(depth_est, depth_gt, m, (di * lo, di * hi))
    return out


class DictAverageMeter:
    def __init__(self):
        self.data: dict[str, float] = {}
        self.count = 0

    def reset(self):
        self.data = {}
        self.count = 0

    def update(self, new: dict, n: int = 1):
        self.count += n
        for k, v in new.items():
            self.data[k] = self.data.get(k, 0.0) + float(v) * n

    def mean(self) -> dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.data.items()}
