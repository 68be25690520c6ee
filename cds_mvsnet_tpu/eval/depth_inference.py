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
from concurrent.futures import ThreadPoolExecutor

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

__all__ = ["save_depths", "make_eval_forward", "resolve_fast_path"]


def resolve_fast_path(
    compute_dtype: str = "auto",
    feature_impl: str = "auto",
    precision: str = "auto",
    max_h: int | None = None,
    max_w: int | None = None,
):
    """Resolve the TPU fast-path knobs (the bench.py configuration) for eval.

    ``auto`` means: on TPU use bf16 compute, the space-to-depth feature path,
    and default (bf16 MXU) matmul precision — the configuration validated
    fast by bench.py and validated accurate on the GT fixture; on CPU use
    plain fp32 / HIGHEST (golden-parity configuration). s2d needs stage dims
    divisible by 8, so fall back to "plain" when the resolution rules it out.
    """
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if compute_dtype == "auto":
        compute_dtype = "bf16" if on_tpu else "fp32"
    if feature_impl == "auto":
        feature_impl = "s2d" if on_tpu else "plain"
    if precision == "auto":
        precision = "default" if on_tpu else "highest"
    if feature_impl == "s2d" and max_h is not None and max_w is not None:
        if max_h % 8 != 0 or max_w % 8 != 0:
            feature_impl = "plain"
    dtype = jnp.bfloat16 if compute_dtype == "bf16" else jnp.float32
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    return dtype, feature_impl, prec


def make_eval_forward(
    model_cfg: ModelConfig,
    temperature: float = 0.01,
    compute_dtype=jnp.float32,
    feature_impl: str = "plain",
):
    @jax.jit
    def forward(params, imgs, proj_matrices, depth_values):
        outputs, _ = apply_cds_mvsnet(
            params, model_cfg, imgs, proj_matrices, depth_values,
            temperature=temperature, train=False,
            compute_dtype=compute_dtype, feature_impl=feature_impl,
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
    compute_dtype: str = "auto",
    feature_impl: str = "auto",
    precision: str = "auto",
) -> dict:
    """Returns timing stats {mean_s, p50_s, maps_per_sec, n}.

    compute_dtype/feature_impl/precision select the compute path
    (see resolve_fast_path); ``auto`` = the bench configuration on TPU,
    plain fp32 on CPU.
    """
    from ..models import layers

    dtype, impl, prec = resolve_fast_path(
        compute_dtype, feature_impl, precision, max_h=max_h, max_w=max_w
    )
    layers.set_default_precision(prec)

    ds = EvalDataset(
        datapath, scans, nviews=nviews, ndepths=ndepths, interval_scale=interval_scale,
        max_h=max_h, max_w=max_w, fix_res=fix_res, dataset=dataset,
        refine=model_cfg.refine,
    )
    loader = DataLoader(ds, batch_size=batch_size, shuffle=False, num_workers=num_workers)
    forward = make_eval_forward(model_cfg, temperature, compute_dtype=dtype, feature_impl=impl)
    params = jax.device_put(params)

    def write_outputs(out, cams, imgs, filenames):
        # Runs on the writer thread: all file IO off the inference hot path.
        for b, filename in enumerate(filenames):
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
        return depth.shape

    times = []
    pending = []
    stage_final = f"stage{model_cfg.num_stages + (1 if model_cfg.refine else 0)}"
    writer = ThreadPoolExecutor(max_workers=2, thread_name_prefix="depth-writer")

    def drain(item, idx, t0):
        # Host transfer of view idx's outputs — runs AFTER view idx+1's
        # forward has been dispatched, so the device computes the next map
        # while this one crosses the wire (the remote-TPU relay adds a fixed
        # per-transfer latency that would otherwise serialize with compute).
        out_dev, cams, imgs, filenames = item
        out = jax.tree.map(
            lambda x: np.asarray(x, dtype=np.float32), jax.block_until_ready(out_dev)
        )
        times.append(time.perf_counter() - t0)
        pending.append(writer.submit(write_outputs, out, cams, imgs, filenames))
        if verbose:
            print(f"view {idx + 1}: {times[-1]:.3f}s")

    def pad_ragged(batch):
        # A ragged final batch (scan views % batch_size != 0) would retrace
        # the whole B-specific unrolled program at a new shape — minutes on
        # the remote compile server. Replicate the last sample up to
        # batch_size instead; write_outputs iterates the (unpadded) filename
        # list, so the padded outputs are discarded.
        n = len(batch["filename"])
        if n == batch_size:
            return batch

        def _pad(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], batch_size - n, axis=0)], axis=0
            )

        return {
            k: (v if k == "filename" else jax.tree.map(_pad, v))
            for k, v in batch.items()
        }

    try:
        prev = None
        prev_t0 = None
        for i, batch in enumerate(loader):
            t0 = time.perf_counter()
            batch = pad_ragged(batch)
            out_dev = forward(
                params, batch["imgs"], batch["proj_matrices"], batch["depth_values"]
            )
            if prev is not None:
                drain(prev, i - 1, prev_t0)
            prev = (
                out_dev,
                np.asarray(batch["proj_matrices"][stage_final]),
                np.asarray(batch["imgs"]),
                batch["filename"],
            )
            prev_t0 = t0
        if prev is not None:
            drain(prev, len(times), prev_t0)
        shapes = [f.result() for f in pending]  # surface writer errors
        if verbose and shapes:
            print(f"output res {shapes[-1]}")
    finally:
        writer.shutdown(wait=True)

    times_arr = np.asarray(times[1:] if len(times) > 1 else times)  # drop compile
    return {
        "mean_s": float(times_arr.mean()),
        "p50_s": float(np.median(times_arr)),
        "maps_per_sec": float(batch_size / np.median(times_arr)),
        "n": len(times),
        "compute_dtype": "bf16" if dtype == jnp.bfloat16 else "fp32",
        "feature_impl": impl,
    }
