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
    ap.add_argument(
        "--ablate", default=None,
        help="semicolon-separated configs to A/B in one process — each entry "
             "is a CDS_ABLATE string, or KEY=VALUE to set any env knob (e.g. "
             "';nowarp1nowarp2nowarp3;CDS_TRAIN_WARP=3'); deltas attribute "
             "the train step the way tools/ablate.py does for eval",
    )
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
    ablates = args.ablate.split(";") if args.ablate is not None else [None]
    for mode in args.modes.split(","):
      for abl in ablates:
        if abl is not None:
            # read at trace time in stage_net; clear both knobs per config
            os.environ["CDS_ABLATE"] = ""
            os.environ.pop("CDS_TRAIN_WARP", None)
            if "=" in abl:
                k, _, v = abl.partition("=")
                os.environ[k] = v
            else:
                os.environ["CDS_ABLATE"] = abl
        _remat_env = os.environ.get("CDS_TRAIN_REMAT")  # "0"/"1" override
        train_cfg = (
            TrainConfig(compute_dtype=mode)
            if _remat_env is None
            else TrainConfig(compute_dtype=mode, remat_features=_remat_env == "1")
        )
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
        key = mode if abl is None else f"{mode}[{abl or 'baseline'}]"
        res[key] = {
            "compile_s": round(compile_s, 1),
            "step_s": round(dt, 3),
            "samples_per_sec": round(args.bs / dt, 3),
            "loss_finite": bool(np.isfinite(np.asarray(metrics["loss"]))),
        }
        print(f"{key}: {res[key]}", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
