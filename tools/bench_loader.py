"""Host data-path measurement (VERDICT r1 #10): DTU-shape decode throughput.

Synthesizes a DTU-train-layout scan on disk (real 1200x1600 PNG decode cost),
then measures:
  * DataLoader batches/sec at B=8, V=5 with 1/4/8 decode threads (the
    in-tree thread-pool design),
  * the same __getitem__ work in a process pool (the reference uses 4 worker
    processes — datasets/data_loaders.py:27),
so STATUS.md can record whether GIL-bound thread decode starves the train
step. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cds_mvsnet_tpu.data.dtu import DTUDataset
from cds_mvsnet_tpu.data.loader import DataLoader
from cds_mvsnet_tpu.io.pfm import write_pfm

N_REFS = 10
B, V = 8, 5


def build_dataset(root: str) -> str:
    from PIL import Image

    os.makedirs(f"{root}/Cameras/train", exist_ok=True)
    os.makedirs(f"{root}/Rectified/scan1_train", exist_ok=True)
    os.makedirs(f"{root}/Depths_raw/scan1", exist_ok=True)

    # smooth texture so the PNGs are realistically sized (not noise-bloated)
    ys, xs = np.meshgrid(np.arange(1200), np.arange(1600), indexing="ij")
    n_views = 13
    for v in range(n_views):
        img = (
            127 + 60 * np.sin(0.01 * xs + v) * np.cos(0.013 * ys)
            + 40 * np.sin(0.031 * (xs + ys) + 0.5 * v)
        ).astype(np.uint8)
        img = np.stack([img, np.roll(img, 7, 0), np.roll(img, 13, 1)], -1)
        base = f"{root}/Rectified/scan1_train/rect_{v + 1:0>3}_0_r5000.png"
        Image.fromarray(img).save(base)
        for light in range(1, 7):
            link = f"{root}/Rectified/scan1_train/rect_{v + 1:0>3}_{light}_r5000.png"
            if not os.path.exists(link):
                os.symlink(base, link)
        with open(f"{root}/Cameras/train/{v:0>8}_cam.txt", "w") as f:
            f.write("extrinsic\n1 0 0 0 \n0 1 0 0 \n0 0 1 0 \n0 0 0 1 \n\n")
            f.write("intrinsic\n360 0 200 \n0 360 160 \n0 0 1 \n\n425.0 2.5\n")
        depth = (600 + 30 * np.sin(0.01 * xs[:1200, :1600])).astype(np.float32)
        write_pfm(f"{root}/Depths_raw/scan1/depth_map_{v:0>4}.pfm", depth)
        vis = (np.random.default_rng(v).uniform(0, 255, (1200, 1600))).astype(np.uint8)
        Image.fromarray(vis).save(f"{root}/Depths_raw/scan1/depth_visual_{v:0>4}.png")

    lines = [str(N_REFS)]
    for r in range(N_REFS):
        srcs = [s for s in range(n_views) if s != r][: V + 3]
        lines.append(str(r))
        lines.append(f"{len(srcs)} " + " ".join(f"{s} 10.0" for s in srcs))
    with open(f"{root}/Cameras/pair.txt", "w") as f:
        f.write("\n".join(lines) + "\n")

    listfile = f"{root}/list.txt"
    with open(listfile, "w") as f:
        f.write("scan1\n")
    return listfile


def _getitem(args):
    root, listfile, idx = args
    ds = DTUDataset(root, listfile, mode="train", nviews=V)
    s = ds[idx]
    return s["imgs"].shape


def main():
    root = tempfile.mkdtemp(prefix="dtu_loader_bench_")
    listfile = build_dataset(root)
    ds = DTUDataset(root, listfile, mode="train", nviews=V)
    n_batches = 4
    results = {}

    for workers in (1, 4, 8):
        loader = DataLoader(
            ds, batch_size=B, shuffle=True, num_workers=workers, prefetch=2,
            device_put_fn=lambda x: x,  # host path only
        )
        it = iter(loader)
        next(it)  # warm page cache / lazy imports
        t0 = time.perf_counter()
        got = 0
        for batch in it:
            got += 1
            if got >= n_batches:
                break
        dt = time.perf_counter() - t0
        results[f"threads{workers}_samples_per_s"] = round(got * B / dt, 2)

    # process-pool decode of the same samples (reference-style workers)
    for workers in (4, 8):
        with mp.get_context("spawn").Pool(workers) as pool:
            args = [(root, listfile, i) for i in range(n_batches * B)]
            pool.map(_getitem, args[:2])  # warm the workers
            t0 = time.perf_counter()
            pool.map(_getitem, args)
            dt = time.perf_counter() - t0
        results[f"procs{workers}_samples_per_s"] = round(n_batches * B / dt, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
