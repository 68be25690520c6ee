"""Per-stage CostRegNet cost + s2d block-size variants on the real TPU.

The s2d 3D conv inflates contraction FLOPs by ~(taps·b²·I)/(27·I); b=4 gives
7.1x at every stage, b=2 gives 4x when b²·C >= 128 (stage1's C=32). Measures
cost_reg_net_s2d at each cascade stage's eval shape (cfirst layout, bf16)
for b in {2, 4}. Run: python tools/bench_costreg.py
"""

from __future__ import annotations

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

H, W = 864, 1152
SHAPES = {
    "stage1": (32, 48, H // 4, W // 4),
    "stage2": (16, 32, H // 2, W // 2),
    "stage3": (8, 8, H, W),
}


LEVELS = ["s2d", "conv0", "conv2", "conv4", "conv6", "conv7", "conv9", "conv11", None]


def levels_main():
    """Per-level prefix attribution (same-process deltas): each entry is the
    prefix ending at that level; successive differences = that level's cost."""
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    res = {}
    for sname, (C, D, h, w) in SHAPES.items():
        p = jax.device_put(params["cost_regularization"][str(int(sname[-1]) - 1)])
        vol = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0), (C, D, h, w), jnp.bfloat16)
        )
        prev = 0.0
        for lv in LEVELS:
            def fn(p, v, lv=lv):
                return jnp.sum(
                    cost_reg_net_s2d(p, v, b=4, cfirst=True, stop_after=lv).astype(jnp.float32)
                )

            jf = jax.jit(fn)
            out = jf(p, vol)
            np.asarray(jax.device_get(out))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jf(p, vol)
                np.asarray(jax.device_get(out))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) * 1e3
            name = lv or "full"
            res[f"{sname}_{name}"] = round(dt, 1)
            print(f"{sname} {name}: {dt:.1f} ms (delta {dt - prev:+.1f})", flush=True)
            prev = dt
    print(json.dumps(res))


def main():
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    res = {}
    for sname, (C, D, h, w) in SHAPES.items():
        p = jax.device_put(params["cost_regularization"][str(int(sname[-1]) - 1)])
        vol = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(0), (C, D, h, w), jnp.bfloat16)
        )
        for b in (2, 4):
            if (h % (8 * b)) or (w % (8 * b)):
                continue

            def fn(p, v, b=b):
                return jnp.sum(cost_reg_net_s2d(p, v, b=b, cfirst=True).astype(jnp.float32))

            jf = jax.jit(fn)
            try:
                out = jf(p, vol)
                np.asarray(jax.device_get(out))
            except Exception as e:  # noqa: BLE001
                print(f"{sname} b{b} FAILED: {str(e)[:100]}", flush=True)
                continue
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jf(p, vol)
                np.asarray(jax.device_get(out))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) * 1e3
            res[f"{sname}_b{b}"] = round(dt, 1)
            print(f"{sname} b{b}: {dt:.1f} ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    if "--levels" in sys.argv:
        levels_main()
    else:
        main()
