"""Ref-view batching A/B: amortize the per-dispatch relay cost over B maps.

The bench point's blocking and pipelined rates are nearly equal (BENCH_r03:
2.785 vs 2.741), i.e. dispatch-ahead does NOT hide the ~33 ms fixed relay
round trip — it rides the dispatch path, not host-side work. Batching B ref
views into ONE jitted call (stage_net's B>1 unroll keeps the B=1 Pallas
kernel route per slice, bit-exact — tests/test_stage_batch.py) pays that
cost once per B maps instead of once per map.

Same-process deltas (tools/ablate.py pattern): absolute rates drift with the
relay; only the in-run B=1 vs B>1 comparison is the signal.

Run: python tools/bench_batch.py [--bs 1,2,4]
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

H, W, V, D = 864, 1152, 5, 192
ITERS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", default="1,2,4")
    ap.add_argument("--h", type=int, default=H)
    ap.add_argument("--w", type=int, default=W)
    ap.add_argument("--refine", action="store_true", help="protocol point")
    args = ap.parse_args()
    h, w = args.h, args.w

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    layers.set_default_precision(jax.lax.Precision.DEFAULT)
    params = convert_checkpoint(
        "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
    )
    if not args.refine:
        params.pop("refine_network", None)
    params = jax.device_put(params)
    cfg = ModelConfig(refine=args.refine)

    batch = jax.tree.map(
        jnp.asarray, textured_plane_batch(V=V, H=h, W=w, D=D, refine=args.refine)
    )
    batch.pop("gt_plane_depth", None)

    res = {}
    for B in [int(x) for x in args.bs.split(",")]:
        fargs = tuple(
            jax.tree.map(lambda x: jnp.concatenate([x] * B, axis=0), batch[k])
            if B > 1 else batch[k]
            for k in ("imgs", "proj_matrices", "depth_values")
        )

        @jax.jit
        def fwd(imgs, proj, dv):
            out, _ = apply_cds_mvsnet(
                params, cfg, imgs, proj, dv, temperature=0.01, train=False,
                compute_dtype=jnp.bfloat16, feature_impl="s2d",
            )
            # one scalar out per call; consume confidence like the product
            return out["refined_depth"].ravel()[0] + jnp.mean(
                out[f"stage{cfg.num_stages}"]["photometric_confidence"]
            )

        try:
            out = fwd(*fargs)
            np.asarray(jax.device_get(out.ravel()[0]))
        except Exception as e:  # OOM at large B is an answer, not a crash
            res[f"B{B}"] = {"error": type(e).__name__, "detail": str(e)[:200]}
            print(f"B={B}: {type(e).__name__}", flush=True)
            continue
        times = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = fwd(*fargs)
            np.asarray(jax.device_get(out.ravel()[0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        res[f"B{B}"] = {
            "ms_per_call": round(dt * 1e3, 1),
            "ms_per_map": round(dt * 1e3 / B, 1),
            "maps_per_sec": round(B / dt, 3),
        }
        print(f"B={B}: {dt * 1e3:8.1f} ms/call  {dt * 1e3 / B:8.1f} ms/map", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
