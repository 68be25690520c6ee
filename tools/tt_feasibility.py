"""Tanks & Temples-scale feasibility: compile + run the no-refine cascade at
every resolution bucket of scripts/tt_eval.sh on one real TPU chip.

Proves (VERDICT r1 missing #6 / SURVEY §7.3.4-5) that the stage-1 volume at
1088x1920x64 fits one chip with the tree's depth-chunked warp, and records
per-bucket maps/sec. Run: python tools/tt_feasibility.py [--buckets 1088x1920]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/cds_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# reference scripts/tt_eval.sh:2-9 resolution table -> the three buckets
BUCKETS = {"1088x1920": (1088, 1920), "896x1600": (896, 1600), "544x960": (544, 960)}
V, D = 10, 256  # tt_eval.sh: --num_view 10 --numdepth 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default=",".join(BUCKETS), help="comma list")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    layers.set_default_precision(jax.lax.Precision.DEFAULT)
    cfg = ModelConfig(refine=False)
    ckpt = "/root/reference/pretrained/blended/model_blended.pth"
    if not os.path.exists(ckpt):
        ckpt = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
    if os.path.exists(ckpt):
        from cds_mvsnet_tpu.models.convert import convert_checkpoint

        params = convert_checkpoint(ckpt)
        params.pop("refine_network", None)
    else:
        params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)

    @jax.jit
    def forward(imgs, proj, dv):
        out, _ = apply_cds_mvsnet(
            params, cfg, imgs, proj, dv, temperature=0.01, train=False,
            compute_dtype=jnp.bfloat16, feature_impl="s2d",
        )
        return out["refined_depth"], out["stage3"]["photometric_confidence"]

    results = {}
    for name in args.buckets.split(","):
        H, W = BUCKETS[name]
        print(f"bucket {name}: building batch ({V} views, {D} depths)", flush=True)
        batch = jax.tree.map(
            jnp.asarray, textured_plane_batch(V=V, H=H, W=W, D=D, refine=False)
        )
        batch.pop("gt_plane_depth", None)
        fargs = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])
        t0 = time.perf_counter()
        out = forward(*fargs)
        np.asarray(jax.device_get(out[0].ravel()[0]))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = forward(*fargs)
            np.asarray(jax.device_get(out[0].ravel()[0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        results[name] = {
            "compile_s": round(compile_s, 1),
            "sec_per_map": round(dt, 3),
            "maps_per_sec": round(1.0 / dt, 3),
            "finite": bool(np.isfinite(np.asarray(out[0])).all()),
        }
        print(f"bucket {name}: {results[name]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
