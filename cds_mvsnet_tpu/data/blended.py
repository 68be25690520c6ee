"""BlendedMVS training/validation dataset.

Behavioral reference: datasets/blended_dataset.py in TruongKhang/cds-mvsnet.
Images center-cropped to 576x768 (usually identity — BlendedMVS ships at that
size), intrinsics pre-divided by 4, GT depth from rendered_depth_maps PFMs
with mask = depth > 0; train mode shuffles the first 7 source views.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..io.cams import read_cam_file, read_pair_file
from ..io.pfm import read_pfm
from .image import load_image, resize_nearest_np

__all__ = ["BlendedMVSDataset"]

CROP_H, CROP_W = 576, 768


def _crop(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    sh, sw = (h - CROP_H) // 2, (w - CROP_W) // 2
    return img[sh : sh + CROP_H, sw : sw + CROP_W]


def _pyramid(img: np.ndarray) -> dict[str, np.ndarray]:
    h, w = img.shape[:2]
    return {
        "stage1": resize_nearest_np(img, (h // 8, w // 8)),
        "stage2": resize_nearest_np(img, (h // 4, w // 4)),
        "stage3": resize_nearest_np(img, (h // 2, w // 2)),
        "stage4": img,
    }


class BlendedMVSDataset:
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
        self.metas = []
        for scan in scans:
            for ref, srcs in read_pair_file(os.path.join(datapath, scan, "cams/pair.txt")):
                if len(srcs) < nviews:
                    srcs = srcs + [srcs[0]] * (nviews - len(srcs))
                self.metas.append((scan, ref, srcs))

    def __len__(self):
        return len(self.metas)

    def _read_cam(self, path):
        cf = read_cam_file(path)
        intr = cf.intrinsic.copy()
        intr[:2, :] /= 4.0
        interval = cf.depth_interval
        if cf.num_depth is not None:
            depth_max = cf.depth_min + int(cf.num_depth) * interval
            interval = (depth_max - cf.depth_min) / self.ndepths
        interval *= self.interval_scale
        return intr, cf.extrinsic, cf.depth_min, interval

    def __getitem__(self, idx: int) -> dict:
        scan, ref_view, src_views = self.metas[idx]
        src_views = list(src_views)
        if self.mode == "train":
            src_views = src_views[:7]
            self.rng.shuffle(src_views)
        view_ids = [ref_view] + src_views[: self.nviews - 1]

        imgs, cams = [], []
        depth_values = depth_ms = mask_ms = None
        for i, vid in enumerate(view_ids):
            img = _crop(load_image(os.path.join(self.datapath, scan, f"blended_images/{vid:0>8}.jpg")))
            intr, extr, dmin, dint = self._read_cam(
                os.path.join(self.datapath, scan, f"cams/{vid:0>8}_cam.txt")
            )
            cam = np.zeros((2, 4, 4), dtype=np.float32)
            cam[0] = extr
            cam[1, :3, :3] = intr
            cams.append(cam)
            imgs.append(img)

            if i == 0:
                depth = read_pfm(
                    os.path.join(self.datapath, scan, f"rendered_depth_maps/{vid:0>8}.pfm")
                )[0]
                mask_ms = _pyramid(_crop((depth > 0).astype(np.float32)))
                depth_ms = _pyramid(_crop(depth))
                depth_max = dint * (self.ndepths - 0.5) + dmin
                depth_values = np.arange(dmin, depth_max, dint, dtype=np.float32)[: self.ndepths]

        imgs = np.stack(imgs)
        cams = np.stack(cams)
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
            "filename": scan + "/{}/" + f"{view_ids[0]:0>8}" + "{}",
        }
