"""A/B the full-res dynamic-conv layers at s2d block 8 (current) vs 4.

The s2d weight rescatter inflates FLOPs by the zero-block factor
(taps·b²·I / k²·I); the FLOP model says b=4 halves conv00+conv01 cost at
864x1152 despite conv00's 48-channel contraction padding to 128. This
measures it with the real checkpoint weights (conversion relayouts included
in the b=4 leg). Run: python tools/bench_feature2.py
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

H, W, N = 864, 1152, 8


def main():
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.dynamic_conv import epipolar_direction_quadratic
    from cds_mvsnet_tpu.models.feature_net import BASE_CHANNELS, _DYN_KERNELS
    from cds_mvsnet_tpu.models.feature_net_s2d import _dyn_s2d
    from cds_mvsnet_tpu.models.layers import leaky_relu
    from cds_mvsnet_tpu.ops.s2d import s2d_instance_norm, space_to_depth

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    p = jax.device_put(params["feature"])
    x = jax.device_put(jax.random.uniform(jax.random.PRNGKey(0), (N, H, W, 3), jnp.bfloat16))
    epi = jax.device_put(jnp.full((N, 2), 5000.0, jnp.float32))
    base = BASE_CHANNELS

    def run_b(b):
        def fn(x, epi):
            quad = space_to_depth(epipolar_direction_quadratic(epi, H, W, x.dtype), b)
            xs = space_to_depth(x, b)
            y, nc0 = _dyn_s2d(p["conv00"]["conv"], xs, quad, 0.01, _DYN_KERNELS["conv00"], b)
            y = leaky_relu(s2d_instance_norm(y, b, base))
            y, nc1 = _dyn_s2d(p["conv01"]["conv"], y, quad, 0.01, _DYN_KERNELS["conv01"], b)
            y = leaky_relu(s2d_instance_norm(y, b, base))
            return jnp.sum(y.astype(jnp.float32)) + jnp.sum(nc0) + jnp.sum(nc1)

        return jax.jit(fn)

    res = {}
    for name, b in [("b8", 8), ("b4", 4)]:
        jf = run_b(b)
        out = jf(x, epi)
        np.asarray(jax.device_get(out))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jf(x, epi)
            np.asarray(jax.device_get(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        res[name] = round(dt, 1)
        print(f"conv00+01 {name}: {dt:.1f} ms", flush=True)
    # numerical agreement (same math, different block): compare sums
    a = float(np.asarray(jax.device_get(run_b(8)(x, epi))))
    c = float(np.asarray(jax.device_get(run_b(4)(x, epi))))
    res["sum_b8"] = a
    res["sum_b4"] = c
    print(json.dumps(res))


if __name__ == "__main__":
    main()
