"""Per-layer attribution of feature_net_s2d on the real TPU.

Times truncated prefixes of the s2d feature extractor in ONE process
(same-process deltas cancel relay drift, CLAUDE.md). The stack of 8 images
(2·(V-1)) at 864x1152 matches the bench operating point.
Run: python tools/bench_feature.py [--reps 5]
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

H, W, N = 864, 1152, 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.feature_net import BASE_CHANNELS, _DYN_KERNELS
    from cds_mvsnet_tpu.models.feature_net_s2d import (
        _cat_s2d,
        _d2s_cfirst,
        _d2s_map,
        _dyn_s2d,
        feature_net_s2d,
    )
    from cds_mvsnet_tpu.models.dynamic_conv import epipolar_direction_quadratic
    from cds_mvsnet_tpu.models.layers import leaky_relu
    from cds_mvsnet_tpu.ops.s2d import (
        s2d_conv,
        s2d_instance_norm,
        s2d_upsample2x_nearest,
        space_to_depth,
    )

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    p = jax.device_put(params["feature"])
    rng = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.uniform(rng, (N, H, W, 3), jnp.bfloat16))
    epi = jax.device_put(jnp.full((N, 2), 5000.0, jnp.float32))
    base = BASE_CHANNELS
    B0, B1, B2 = 8, 4, 2

    def prefix(upto):
        def fn(x, epi):
            quad0 = space_to_depth(epipolar_direction_quadratic(epi, H, W, x.dtype), B0)
            quad1 = space_to_depth(
                epipolar_direction_quadratic(epi / 2, H // 2, W // 2, x.dtype), B1)
            quad2 = space_to_depth(
                epipolar_direction_quadratic(epi / 4, H // 4, W // 4, x.dtype), B2)
            acc = []

            def dyn(name, xf, quad, b, C):
                y, nc = _dyn_s2d(p[name]["conv"], xf, quad, 0.01, _DYN_KERNELS[name], b)
                return leaky_relu(s2d_instance_norm(y, b, C)), nc

            xs = space_to_depth(x, B0)
            if upto == "s2d-in":
                return jnp.sum(xs.astype(jnp.float32)) + jnp.sum(quad0) + jnp.sum(quad1) + jnp.sum(quad2)
            c00, nc00 = dyn("conv00", xs, quad0, B0, base)
            if upto == "conv00":
                return jnp.sum(c00.astype(jnp.float32))
            c01, nc01 = dyn("conv01", c00, quad0, B0, base)
            if upto == "conv01":
                return jnp.sum(c01.astype(jnp.float32))
            d0 = leaky_relu(s2d_instance_norm(
                s2d_conv(c01, p["downsample1"]["conv"]["weight"], b_in=B0, stride=2, padding=1),
                B1, 2 * base))
            c10, nc10 = dyn("conv10", d0, quad1, B1, 2 * base)
            c11, nc11 = dyn("conv11", c10, quad1, B1, 2 * base)
            if upto == "half":
                return jnp.sum(c11.astype(jnp.float32))
            d1 = leaky_relu(s2d_instance_norm(
                s2d_conv(c11, p["downsample2"]["conv"]["weight"], b_in=B1, stride=2, padding=1),
                B2, 4 * base))
            c20, nc20 = dyn("conv20", d1, quad2, B2, 4 * base)
            c21, nc21 = dyn("conv21", c20, quad2, B2, 4 * base)
            if upto == "quarter":
                return jnp.sum(c21.astype(jnp.float32))
            out1, nc22 = _dyn_s2d(p["out1"], c21, quad2, 0.01, _DYN_KERNELS["out1"], B2)
            out1 = jnp.tanh(s2d_instance_norm(out1, B2, 4 * base))
            s1 = (_d2s_cfirst(out1, B2, 4 * base),
                  _d2s_map((nc20**2 + nc21**2 + nc22**2) / 3, B2),
                  _d2s_map(jnp.abs(nc22), B2))
            if upto == "stage1":
                return sum(jnp.sum(t.astype(jnp.float32)) for t in s1)
            up = s2d_upsample2x_nearest(c21, B2, 4 * base)
            intra = _cat_s2d(up, c11, B1 * B1)
            intra = leaky_relu(s2d_instance_norm(
                s2d_conv(intra, p["inner1"]["conv"]["weight"], b_in=B1, padding=0), B1, 2 * base))
            out2, nc12 = _dyn_s2d(p["out2"], intra, quad1, 0.01, _DYN_KERNELS["out2"], B1)
            out2 = jnp.tanh(s2d_instance_norm(out2, B1, 2 * base))
            s2 = (_d2s_cfirst(out2, B1, 2 * base),
                  _d2s_map((nc10**2 + nc11**2 + nc12**2) / 3, B1),
                  _d2s_map(jnp.abs(nc12), B1))
            if upto == "stage2":
                return sum(jnp.sum(t.astype(jnp.float32)) for t in s1 + s2)
            up = s2d_upsample2x_nearest(out2, B1, 2 * base)
            intra = _cat_s2d(up, c01, B0 * B0)
            intra = leaky_relu(s2d_instance_norm(
                s2d_conv(intra, p["inner2"]["conv"]["weight"], b_in=B0, padding=0), B0, base))
            out3, nc02 = _dyn_s2d(p["out3"], intra, quad0, 0.01, _DYN_KERNELS["out3"], B0)
            out3 = jnp.tanh(s2d_instance_norm(out3, B0, base))
            s3 = (_d2s_cfirst(out3, B0, base),
                  _d2s_map((nc00**2 + nc01**2 + nc02**2) / 3, B0),
                  _d2s_map(jnp.abs(nc02), B0))
            return sum(jnp.sum(t.astype(jnp.float32)) for t in s1 + s2 + s3)

        return jax.jit(fn)

    stops = ["s2d-in", "conv00", "conv01", "half", "quarter", "stage1", "stage2", "full"]
    res = {}
    for stop in stops:
        jf = prefix(stop)
        out = jf(x, epi)
        np.asarray(jax.device_get(out))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jf(x, epi)
            np.asarray(jax.device_get(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        res[stop] = round(dt, 1)
        print(f"{stop:12s} {dt:9.1f} ms", flush=True)
    keys = list(res)
    deltas = {f"d_{keys[i]}": round(res[keys[i]] - res[keys[i - 1]], 1) for i in range(1, len(keys))}
    print(json.dumps({**res, **deltas}))


if __name__ == "__main__":
    main()
