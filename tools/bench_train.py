"""Train-step time on the real TPU at the DTU training shape (VERDICT r1 #8:
record a measured train-step time and the bf16-vs-fp32 compute delta).

DTU training: 512x640 crops, V=5 views, D=48 stage-1 hypotheses
(datasets/dtu_yao.py), reference batch size 2 (train.py val default; 1-4 on
11GB GPUs). Run: python tools/bench_train.py [--bs 2]
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

H, W, V, D = 512, 640, 5, 192


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--modes", default="fp32,bf16")
    args = ap.parse_args()

    from cds_mvsnet_tpu.config import ModelConfig, TrainConfig
    from cds_mvsnet_tpu.models.cds_mvsnet import init_cds_mvsnet
    from cds_mvsnet_tpu.training.train_step import init_train_state, make_train_step
    from cds_mvsnet_tpu.utils.synthetic import synthetic_batch

    model_cfg = ModelConfig(refine=True)
    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(B=args.bs, V=V, H=H, W=W, D=D, refine=True, with_gt=True, seed=0),
    )

    res = {}
    for mode in args.modes.split(","):
        train_cfg = TrainConfig(compute_dtype=mode)
        params = init_cds_mvsnet(jax.random.PRNGKey(0), model_cfg)
        state, (tx, sched) = init_train_state(params, train_cfg)
        step = make_train_step(model_cfg, train_cfg, tx, sched, donate=False)

        t0 = time.perf_counter()
        state2, metrics = step(state, batch, 0.01)
        np.asarray(jax.device_get(metrics["loss"]))
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state2, metrics = step(state, batch, 0.01)
            np.asarray(jax.device_get(metrics["loss"]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        res[mode] = {
            "compile_s": round(compile_s, 1),
            "step_s": round(dt, 3),
            "samples_per_sec": round(args.bs / dt, 3),
            "loss_finite": bool(np.isfinite(np.asarray(metrics["loss"]))),
        }
        print(f"{mode}: {res[mode]}", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
