"""Full-eval-size golden parity artifact (VERDICT r4 #5).

Small-size parity (tests/test_model_parity.py, 256x320 fp32) plus synthetic
quality gates leave a hole: layout/padding bugs in the production kernel
route are SIZE-DEPENDENT, and no artifact compared a production-route
full-size depth map against the torch reference. This tool closes it:

  leg 1 (torch, CPU):  the reference CDSMVSNet (models/model.py, released
                       dtu_only checkpoint) forward at the bench point
                       (1152x864, 5 views, 192 depths, no refine) on the
                       deterministic textured-plane fixture -> golden .npz
  leg 2 (jax, TPU):    our production route (bf16 + Pallas kernels, exactly
                       bench.py's configuration; --precision highest for the
                       fp32 cross-check) on the same fixture -> per-stage
                       median/p99/max |depth delta| vs the golden, printed
                       as one JSON line

Run the legs in SEPARATE processes (1-CPU box: the torch leg would starve
the relay client):

  python tools/golden_fullsize.py --leg torch
  python tools/golden_fullsize.py --leg jax                    # bf16 kernels
  python tools/golden_fullsize.py --leg jax --precision highest

Reference behavior anchored: test.py:153-248 (the eval forward being
golden-checked), model.py:40-151 (cascade semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CKPT = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
H, W, V, D, REFINE = 864, 1152, 5, 192, False
GOLDEN = os.path.join(REPO, "tools", "golden_fullsize_torch.npz")


def _set_point(point: str) -> None:
    """--point default: the bench metric point (no refine). --point
    protocol: the published-table configuration (1152x1536 WITH refinement,
    scripts/dtu_eval.sh:6) — the cascade runs at half input resolution and
    the refine net upsamples (reference model.py:146-151)."""
    global H, W, V, D, REFINE, GOLDEN
    if point == "protocol":
        H, W, V, D, REFINE = 1152, 1536, 5, 192, True
        GOLDEN = os.path.join(REPO, "tools", "golden_protocol_torch.npz")


def _fixture():
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    # tz_step: the bench fixture's pure-x/y rig puts every epipole at
    # infinity, which crashes the torch reference's compute_epipole 2x2
    # solve (dynamic_conv.py:46) — a small per-view z-offset keeps the
    # exact-GT rendering and makes the rig reference-safe. Both legs share
    # this fixture, so the comparison stays apples-to-apples.
    batch = textured_plane_batch(V=V, H=H, W=W, D=D, refine=REFINE, tz_step=6.0)
    batch.pop("gt_plane_depth")
    return batch


def leg_torch() -> None:
    import torch

    sys.path.insert(0, "/root/reference")
    from models.model import CDSMVSNet

    from cds_mvsnet_tpu.models.convert import _PickleShim

    model = CDSMVSNet(
        refine=REFINE, ndepths=(48, 32, 8), depth_interals_ratio=(4, 2, 1),
        share_cr=False, cr_base_chs=(8, 8, 8), grad_method="detach",
    )
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False,
                      pickle_module=_PickleShim)
    state = {k.replace("module.", "", 1): v for k, v in ckpt["state_dict"].items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not missing and all(k.startswith("refine_network") for k in unexpected)
    model.eval()

    batch = _fixture()
    imgs = torch.from_numpy(batch["imgs"].transpose(0, 1, 4, 2, 3).copy())
    proj = {k: torch.from_numpy(v) for k, v in batch["proj_matrices"].items()}
    dv = torch.from_numpy(batch["depth_values"])
    with torch.no_grad():
        want = model(imgs, proj, dv, temperature=0.01)

    out = {}
    for s in ("stage1", "stage2", "stage3"):
        out[f"{s}_depth"] = want[s]["depth"].numpy()
        out[f"{s}_conf"] = want[s]["photometric_confidence"].numpy()
    out["refined_depth"] = want["refined_depth"].numpy()
    np.savez_compressed(GOLDEN, **out)
    print(json.dumps({"leg": "torch", "saved": GOLDEN,
                      "refined_median": float(np.median(out["refined_depth"]))}),
          flush=True)


def leg_jax(precision: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/cds_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet
    from cds_mvsnet_tpu.models.convert import convert_checkpoint

    if not os.path.exists(GOLDEN):
        print(json.dumps({"leg": "jax", "error": "golden npz missing — run --leg torch first"}))
        sys.exit(1)
    golden = np.load(GOLDEN)

    layers.set_default_precision(
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    compute_dtype = jnp.float32 if precision == "highest" else jnp.bfloat16

    cfg = ModelConfig(refine=REFINE)
    params = convert_checkpoint(CKPT)
    if not REFINE:
        params.pop("refine_network", None)
    params = jax.device_put(params)
    batch = jax.tree.map(jnp.asarray, _fixture())

    @jax.jit
    def forward(params, imgs, proj, dv):
        outputs, _ = apply_cds_mvsnet(
            params, cfg, imgs, proj, dv, temperature=0.01, train=False,
            compute_dtype=compute_dtype, feature_impl="s2d",
        )
        return {
            **{f"{s}_depth": outputs[s]["depth"] for s in ("stage1", "stage2", "stage3")},
            "refined_depth": outputs["refined_depth"],
        }

    got = jax.device_get(forward(
        params, batch["imgs"], batch["proj_matrices"], batch["depth_values"]
    ))

    interval = float((905.0 - 425.0) / (D - 1))  # stage-1 hypothesis spacing
    report = {"leg": "jax", "precision": precision, "point": f"{W}x{H} V={V} D={D}",
              "interval_mm": round(interval, 3)}
    for s in ("stage1", "stage2", "stage3", "refined"):
        key = f"{s}_depth" if s != "refined" else "refined_depth"
        err = np.abs(np.asarray(got[key], np.float64) - golden[key].astype(np.float64))
        report[s] = {
            "median_mm": round(float(np.median(err)), 4),
            "p99_mm": round(float(np.quantile(err, 0.99)), 3),
            "max_mm": round(float(err.max()), 2),
        }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=("torch", "jax"), required=True)
    ap.add_argument("--precision", default="default", choices=("default", "highest"))
    ap.add_argument("--point", default="default", choices=("default", "protocol"))
    args = ap.parse_args()
    _set_point(args.point)
    if args.leg == "torch":
        os.environ.setdefault("OMP_NUM_THREADS", "1")
        leg_torch()
    else:
        leg_jax(args.precision)
