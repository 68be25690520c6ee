"""A/B the per-view visibility chain (sim -> entropy -> vis head) variants
at stage-3 shape (C=8, D=8, 864x1152): s2d b=4 head (current) vs plain NHWC
head vs entropy-only (head ablated). Same-process deltas.
Run: python tools/bench_vis.py
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

H, W, C, D = 864, 1152, 8, 8


def main():
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.models.stage_net import _vis_head, _vis_head_s2d
    from cds_mvsnet_tpu.ops.sampling import softmax_entropy

    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    vis_p = jax.device_put(params["stage_net"]["vis"]["2"])
    rng = jax.random.PRNGKey(0)
    warped = jax.device_put(jax.random.normal(rng, (C, D, H, W), jnp.bfloat16))
    ref = jax.device_put(jax.random.normal(jax.random.fold_in(rng, 1), (C, H, W), jnp.bfloat16))
    nc = jax.device_put(jax.random.uniform(jax.random.fold_in(rng, 2), (1, H, W), jnp.bfloat16))

    def sim_entropy(warped, ref):
        sim = jnp.sum(warped.astype(jnp.float32) * ref[:, None].astype(jnp.float32), axis=0)[None]
        return softmax_entropy(sim, axis=1)[:, 0]

    variants = {
        "sim_entropy_only": lambda w, r, n: jnp.sum(sim_entropy(w, r)),
        "head_s2d": lambda w, r, n: jnp.sum(
            _vis_head_s2d(vis_p, sim_entropy(w, r).astype(n.dtype), n).astype(jnp.float32)
        ),
        "head_plain": lambda w, r, n: jnp.sum(
            _vis_head(
                vis_p,
                jnp.stack([sim_entropy(w, r).astype(n.dtype), n], axis=-1),
                False, None, "p", None,
            ).astype(jnp.float32)
        ),
    }
    res = {}
    for name, fn in variants.items():
        jf = jax.jit(fn)
        out = jf(warped, ref, nc)
        np.asarray(jax.device_get(out))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jf(warped, ref, nc)
            np.asarray(jax.device_get(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        res[name] = round(dt, 1)
        print(f"{name:18s} {dt:9.1f} ms", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
