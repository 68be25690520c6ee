"""DTU training/validation dataset (Yao Yao's preprocessed layout).

Behavioral reference: datasets/dtu_yao.py in TruongKhang/cds-mvsnet.
Metas = scan x 49 ref views (Cameras/pair.txt) x 7 lights; images are
halved then center-cropped to 512x640; GT depth/visibility-mask pyramids at
1/8, 1/4, 1/2, 1/1 of the crop; intrinsics (pre-scaled to 1/4 res by the
dataset author) form the stage pyramid x0.5/x1/x2/x4.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..io.cams import read_cam_file, read_pair_file
from ..io.pfm import read_pfm
from .image import load_image, resize_nearest_np

__all__ = ["DTUDataset"]

CROP_H, CROP_W = 512, 640


def _prepare_img(hr: np.ndarray) -> np.ndarray:
    """1200x1600 -> nearest-downsample x1/2 -> center-crop 512x640
    (reference dtu_yao.py:79-94)."""
    h, w = hr.shape[:2]
    ds = resize_nearest_np(hr, (h // 2, w // 2))
    h, w = ds.shape[:2]
    sh, sw = (h - CROP_H) // 2, (w - CROP_W) // 2
    return ds[sh : sh + CROP_H, sw : sw + CROP_W]


def _pyramid(img: np.ndarray) -> dict[str, np.ndarray]:
    h, w = img.shape[:2]
    return {
        "stage1": resize_nearest_np(img, (h // 8, w // 8)),
        "stage2": resize_nearest_np(img, (h // 4, w // 4)),
        "stage3": resize_nearest_np(img, (h // 2, w // 2)),
        "stage4": img,
    }


class DTUDataset:
    def __init__(
        self,
        datapath: str,
        listfile: str,
        mode: str = "train",
        nviews: int = 5,
        ndepths: int = 192,
        interval_scale: float = 1.06,
        rng: np.random.Generator | None = None,
    ):
        assert mode in ("train", "val", "test")
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.ndepths = ndepths
        self.interval_scale = interval_scale
        self.rng = rng or np.random.default_rng(123)

        scans = [s for s in Path(listfile).read_text().split() if s]
        pairs = read_pair_file(os.path.join(datapath, "Cameras/pair.txt"))
        self.metas = [
            (scan, light, ref, srcs)
            for scan in scans
            for ref, srcs in pairs
            for light in range(7)
        ]

    def __len__(self):
        return len(self.metas)

    def __getitem__(self, idx: int) -> dict:
        scan, light, ref_view, src_views = self.metas[idx]
        src_views = list(src_views)
        if self.mode == "train":
            self.rng.shuffle(src_views)
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, cams = [], []
        depth_values = depth_ms = mask_ms = None
        for i, vid in enumerate(view_ids):
            img = load_image(
                os.path.join(
                    self.datapath,
                    f"Rectified/{scan}_train/rect_{vid + 1:0>3}_{light}_r5000.png",
                )
            )
            cf = read_cam_file(os.path.join(self.datapath, f"Cameras/train/{vid:0>8}_cam.txt"))
            interval = cf.depth_interval * self.interval_scale
            cam = np.zeros((2, 4, 4), dtype=np.float32)
            cam[0] = cf.extrinsic
            cam[1, :3, :3] = cf.intrinsic
            cams.append(cam)
            imgs.append(img)

            if i == 0:
                from PIL import Image

                raw = np.asarray(
                    Image.open(
                        os.path.join(self.datapath, f"Depths_raw/{scan}/depth_visual_{vid:0>4}.png")
                    ),
                    dtype=np.float32,
                )
                if raw.ndim == 3:
                    raw = raw[..., 0]
                mask_hr = (raw > 10).astype(np.float32)
                depth_hr = read_pfm(
                    os.path.join(self.datapath, f"Depths_raw/{scan}/depth_map_{vid:0>4}.pfm")
                )[0]
                mask_ms = _pyramid(_prepare_img(mask_hr))
                depth_ms = _pyramid(_prepare_img(depth_hr))
                depth_max = interval * self.ndepths + cf.depth_min
                depth_values = np.arange(cf.depth_min, depth_max, interval, dtype=np.float32)[
                    : self.ndepths
                ]

        imgs = np.stack(imgs)  # (V, H, W, 3)
        cams = np.stack(cams)  # (V, 2, 4, 4)
        proj = {}
        for stage, scale in [("stage1", 0.5), ("stage2", 1.0), ("stage3", 2.0), ("stage4", 4.0)]:
            m = cams.copy()
            m[:, 1, :2, :] *= scale
            proj[stage] = m

        return {
            "imgs": imgs,
            "proj_matrices": proj,
            "depth": depth_ms,
            "depth_values": depth_values,
            "mask": mask_ms,
        }
