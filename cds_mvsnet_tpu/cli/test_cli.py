"""Inference + fusion CLI (the reference test.py, live flags only — the dead
flags listed in SURVEY §2.5 are intentionally not reproduced)."""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Predict depth, filter, and fuse")
    p.add_argument("--dataset", default="dtu", choices=["dtu", "tt", "general"])
    p.add_argument("--testpath", required=True, help="data dir containing scans")
    p.add_argument("--testlist", default="all", help="scan list file or 'all'")
    p.add_argument("--resume", required=True, help="checkpoint (.npz ours or .pth/.ckpt torch)")
    p.add_argument("--outdir", default="./outputs")
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument(
        "--stage_ndepths", default=None,
        help="comma list of per-stage hypothesis counts, e.g. 32,16,8 "
             "(default 48,32,8 — the reference operating point; smaller "
             "counts trade accuracy for throughput, see README presets)",
    )
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--num_view", type=int, default=5)
    p.add_argument("--max_h", type=int, default=864)
    p.add_argument("--max_w", type=int, default=1152)
    p.add_argument("--fix_res", action="store_true")
    p.add_argument("--temperature", type=float, default=0.01)
    p.add_argument("--no_refinement", action="store_true")
    p.add_argument(
        "--batch_size", type=int, default=1,
        help="ref views per jitted dispatch (per-slice unroll keeps the B=1 "
        "kernel route, bit-exact; B=4 measured ~7%% faster per map on v5e "
        "by amortizing fixed dispatch costs — see STATUS.md r4)",
    )
    p.add_argument("--filter_method", default="normal", choices=["normal", "gipuma", "none"])
    p.add_argument("--conf", default="0.0,0.0,0.0", help="per-stage confidence thresholds")
    p.add_argument("--thres_view", type=int, default=3)
    p.add_argument("--thres_disp", type=float, default=1.0)
    p.add_argument("--num_src_fusion", type=int, default=10)
    # gipuma-path (native C++ fusion) knobs, reference defaults
    p.add_argument("--prob_threshold", default="0.0,0.0,0.0")
    p.add_argument("--disp_threshold", type=float, default=0.2)
    p.add_argument("--num_consistent", type=int, default=3)
    p.add_argument("--skip_inference", action="store_true", help="fuse existing depth maps only")
    # compute-path knobs ("auto" = bench fast path on TPU, plain fp32 on CPU)
    p.add_argument("--compute_dtype", default="auto", choices=["auto", "bf16", "fp32"])
    p.add_argument("--feature_impl", default="auto", choices=["auto", "plain", "s2d", "folded"])
    p.add_argument("--precision", default="auto", choices=["auto", "default", "highest"])
    return p


def load_any_checkpoint(path: str):
    from ..models.convert import convert_checkpoint, load_params

    if path.endswith(".npz"):
        return load_params(path)
    return convert_checkpoint(path)


def _honor_jax_platforms_env():
    """Make ``JAX_PLATFORMS=cpu python -m ...`` actually mean cpu: this
    environment's sitecustomize pins jax_platforms at import, which silently
    overrides the env var; re-applying it before any backend query restores
    the documented semantics (and avoids hanging on a down TPU relay)."""
    val = os.environ.get("JAX_PLATFORMS")
    if val:
        import jax

        jax.config.update("jax_platforms", val)


def main(argv=None):
    args = build_parser().parse_args(argv)
    _honor_jax_platforms_env()

    from ..config import ModelConfig
    from ..eval.depth_inference import save_depths
    from ..fusion.pipeline import FusionConfig, fuse_scan

    if args.testlist != "all":
        scans = [s for s in Path(args.testlist).read_text().split() if s]
    else:
        scans = sorted(
            e for e in os.listdir(args.testpath) if os.path.isdir(os.path.join(args.testpath, e))
        )

    model_cfg = ModelConfig(refine=not args.no_refinement)
    if args.stage_ndepths:
        nd = tuple(int(x) for x in args.stage_ndepths.split(","))
        # the 3-level cost-reg UNet strides the depth axis 2x three times
        # (reference module.py CostRegNet), so each stage count must be
        # divisible by 8 — same constraint the reference's (48, 32, 8) obeys
        if len(nd) != 3 or any(d % 8 for d in nd):
            raise SystemExit(
                f"--stage_ndepths must be three multiples of 8, got {nd}"
            )
        model_cfg = ModelConfig(refine=model_cfg.refine, ndepths=nd)
    params = load_any_checkpoint(args.resume)
    if not model_cfg.refine:
        params.pop("refine_network", None)

    if not args.skip_inference:
        stats = save_depths(
            params, model_cfg,
            datapath=args.testpath, scans=scans, outdir=args.outdir,
            nviews=args.num_view, ndepths=args.numdepth,
            interval_scale=args.interval_scale, max_h=args.max_h, max_w=args.max_w,
            fix_res=args.fix_res, dataset=args.dataset,
            temperature=args.temperature, batch_size=args.batch_size,
            compute_dtype=args.compute_dtype, feature_impl=args.feature_impl,
            precision=args.precision,
        )
        print(json.dumps({"inference": stats}))

    if args.filter_method == "gipuma":
        from ..fusion.pipeline import fuse_scan_native

        thresholds = tuple(float(x) for x in args.prob_threshold.split(","))
        for scan in scans:
            n = fuse_scan_native(
                os.path.join(args.outdir, scan),
                os.path.join(args.outdir, f"{scan}.ply"),
                conf_thresholds=thresholds,
                disp_thresh=args.disp_threshold,
                num_consistent=args.num_consistent,
            )
            print(f"{scan}: {n} fused points (native)")
    elif args.filter_method == "normal":
        fcfg = FusionConfig(
            n_src_views=args.num_src_fusion,
            conf_thresholds=tuple(float(x) for x in args.conf.split(",")),
            img_dist_thresh=args.thres_disp,
            depth_thresh=0.01,
            vthresh=args.thres_view,
        )
        for scan in scans:
            n = fuse_scan(
                os.path.join(args.testpath, scan),
                os.path.join(args.outdir, scan),
                os.path.join(args.outdir, f"{scan}.ply"),
                fcfg,
                verbose=True,
            )
            print(f"{scan}: {n} fused points")


if __name__ == "__main__":
    main()
