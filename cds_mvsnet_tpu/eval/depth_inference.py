"""Step 1 of evaluation: run the cascade over a scan list and persist
per-view depth, stacked confidence, camera, and image files.

Behavioral reference: test.py:153-263 (save_depth) in TruongKhang/cds-mvsnet.
Output layout: ``{out}/{scan}/depth_est/xxxxxxxx.pfm``, ``confidence/*.pfm``
(3 stage confidences nearest-resized to final res, stacked HxWx3),
``cams/*_cam.txt``, ``images/*.jpg``.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.eval_set import EvalDataset
from ..data.image import resize_nearest_np, save_image
from ..data.loader import DataLoader
from ..io.cams import write_cam_file
from ..io.pfm import write_pfm
from ..models.cds_mvsnet import apply_cds_mvsnet

__all__ = ["save_depths", "make_eval_forward"]


def make_eval_forward(model_cfg: ModelConfig, temperature: float = 0.01):
    @jax.jit
    def forward(params, imgs, proj_matrices, depth_values):
        outputs, _ = apply_cds_mvsnet(
            params, model_cfg, imgs, proj_matrices, depth_values,
            temperature=temperature, train=False,
        )
        return {
            "refined_depth": outputs["refined_depth"],
            "conf": {s: outputs[s]["photometric_confidence"] for s in
                     [f"stage{i+1}" for i in range(model_cfg.num_stages)]},
        }

    return forward


def save_depths(
    params,
    model_cfg: ModelConfig,
    datapath: str,
    scans: list[str],
    outdir: str,
    nviews: int = 5,
    ndepths: int = 192,
    interval_scale: float | dict = 1.06,
    max_h: int = 864,
    max_w: int = 1152,
    fix_res: bool = False,
    dataset: str = "dtu",
    temperature: float = 0.01,
    batch_size: int = 1,
    num_workers: int = 4,
    verbose: bool = True,
) -> dict:
    """Returns timing stats {mean_s, p50_s, maps_per_sec, n}."""
    ds = EvalDataset(
        datapath, scans, nviews=nviews, ndepths=ndepths, interval_scale=interval_scale,
        max_h=max_h, max_w=max_w, fix_res=fix_res, dataset=dataset,
        refine=model_cfg.refine,
    )
    loader = DataLoader(ds, batch_size=batch_size, shuffle=False, num_workers=num_workers)
    forward = make_eval_forward(model_cfg, temperature)
    params = jax.device_put(params)

    times = []
    stage_final = f"stage{model_cfg.num_stages + (1 if model_cfg.refine else 0)}"
    for i, batch in enumerate(loader):
        t0 = time.perf_counter()
        out = forward(params, batch["imgs"], batch["proj_matrices"], batch["depth_values"])
        out = jax.tree.map(np.asarray, jax.block_until_ready(out))
        times.append(time.perf_counter() - t0)

        cams = np.asarray(batch["proj_matrices"][stage_final])
        imgs = np.asarray(batch["imgs"])
        for b, filename in enumerate(batch["filename"]):
            depth = out["refined_depth"][b]
            h, w = depth.shape
            confs = [
                resize_nearest_np(np.asarray(out["conf"][f"stage{s+1}"][b]), (h, w))
                for s in range(model_cfg.num_stages)
            ]
            conf = np.stack(confs, axis=-1)

            write_pfm(os.path.join(outdir, filename.format("depth_est", ".pfm")), depth)
            write_pfm(os.path.join(outdir, filename.format("confidence", ".pfm")), conf)
            cam = cams[b, 0].copy()
            cam[1, 3] = [0, 0, 0, 1]
            cam_path = os.path.join(outdir, filename.format("cams", "_cam.txt"))
            os.makedirs(os.path.dirname(cam_path), exist_ok=True)
            write_cam_file(cam_path, cam)
            img = resize_nearest_np(imgs[b, 0], (h, w))
            img_path = os.path.join(outdir, filename.format("images", ".jpg"))
            os.makedirs(os.path.dirname(img_path), exist_ok=True)
            save_image(img_path, img)
        if verbose:
            print(f"view {i + 1}/{len(loader)}: {times[-1]:.3f}s, res {depth.shape}")

    times_arr = np.asarray(times[1:] if len(times) > 1 else times)  # drop compile
    return {
        "mean_s": float(times_arr.mean()),
        "p50_s": float(np.median(times_arr)),
        "maps_per_sec": float(batch_size / np.median(times_arr)),
        "n": len(times),
    }
