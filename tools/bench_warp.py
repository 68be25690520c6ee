"""Micro-bench the plane-sweep warp kernel variants on the real TPU.

Times v1 (tile band, per-row masked gathers), v2 (row-anchored small bands,
batched gather), v3 (tile band, batched per-row gathers) and the XLA
packed-gather sampler at each cascade stage's shape with coherent real-camera
coordinates. Usage: python tools/bench_warp.py [--reps 7]
"""

from __future__ import annotations

import argparse
import functools
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

H, W, V, D = 864, 1152, 5, 192


def timed(fn, args, reps, name):
    try:
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    except Exception as e:  # noqa: BLE001 — report per-variant failures, keep going
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"{name:34s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--stages", default="stage1,stage2,stage3")
    args = ap.parse_args()

    from cds_mvsnet_tpu.ops.geometry import plane_sweep_coords
    from cds_mvsnet_tpu.ops.grid_sample import pack_2x2, sample_packed_2x2
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_padded
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    batch = textured_plane_batch(V=2, H=H, W=W, D=D, refine=False)
    cdtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    stage_shapes = {
        "stage1": (48, H // 4, W // 4, 32),
        "stage2": (32, H // 2, W // 2, 16),
        "stage3": (8, H, W, 8),
    }
    results = {}
    for sname in args.stages.split(","):
        d, h, w, c = stage_shapes[sname]
        scams = jnp.asarray(batch["proj_matrices"][sname])
        base = jnp.full((1, h, w), 600.0, jnp.float32)
        hyp = base[:, None] + jnp.linspace(-50, 50, d)[None, :, None, None]
        px, py = plane_sweep_coords(scams[:, 0], scams[:, 1], hyp, h, w)
        px = jax.device_put(px.reshape(1, d, h, w)[0])
        py = jax.device_put(py.reshape(1, d, h, w)[0])
        src = jax.device_put(jax.random.normal(rng, (c, h, w), cdtype))

        variants = {
            "v1": functools.partial(warp_pallas_padded, variant="v1", channels_first=True),
            "v3ky8": functools.partial(warp_pallas_padded, variant="v3", ky=8, channels_first=True),
            "v3ky16": functools.partial(warp_pallas_padded, variant="v3", ky=16, channels_first=True),
            "v6ky8": functools.partial(warp_pallas_padded, variant="v6", ky=8, channels_first=True),
            "v6ky16": functools.partial(warp_pallas_padded, variant="v6", ky=16, channels_first=True),
            "v7tr4ky8": functools.partial(warp_pallas_padded, variant="v7", ky=8, tr=4, channels_first=True),
            "v7tr8ky12": functools.partial(warp_pallas_padded, variant="v7", ky=12, tr=8, channels_first=True),
        }
        # reduce to one scalar INSIDE the jit: a single relay dispatch per
        # measurement, no big-output relayout/transfer distortion
        for vname, fn in variants.items():
            jfn = jax.jit(lambda s, x, y, fn=fn: jnp.sum(fn(s, x, y).astype(jnp.float32)))
            dt = timed(jfn, (src, px, py), args.reps, f"{sname} {vname}")
            if dt is not None:
                results[f"{sname}_{vname}"] = round(dt * 1e3, 2)

        # XLA packed-gather baseline (the non-Pallas eval route)
        src_nhwc = jax.device_put(jnp.moveaxis(src, 0, -1)[None])

        @jax.jit
        def xla_route(s, x, y):
            packed = pack_2x2(s)
            out = sample_packed_2x2(packed, s.shape, x.reshape(1, -1), y.reshape(1, -1))
            return jnp.sum(out.astype(jnp.float32))

        dt = timed(xla_route, (src_nhwc, px, py), args.reps, f"{sname} xla-packed")
        if dt is not None:
            results[f"{sname}_xla"] = round(dt * 1e3, 2)

        @jax.jit
        def xla_wminor(s, x, y):
            packed = pack_2x2(s)
            out = sample_packed_2x2(packed, s.shape, x.reshape(1, -1), y.reshape(1, -1))
            out = jnp.moveaxis(out.reshape(*x.shape, -1), -1, 0)  # (C, D, h, w)
            return jnp.sum(out.astype(jnp.float32))

        dt = timed(xla_wminor, (src_nhwc, px, py), args.reps, f"{sname} xla-wminor")
        if dt is not None:
            results[f"{sname}_xla_wminor"] = round(dt * 1e3, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
