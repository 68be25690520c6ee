"""Per-stage / per-component timing of the eval cascade on the real TPU.

Attribution strategy (remote-relay-safe, CLAUDE.md):
  * cascade prefixes (num_stages = 1, 2, 3) give true per-stage marginal cost
    with all XLA fusions intact;
  * individual jitted components (feature net, warp kernel, cost reg) give
    the intra-stage split;
  * a no-op jitted call measures the fixed relay dispatch overhead, reported
    separately so component times can be compared net of it.

Usage: python tools/profile_stages.py [--reps 5]
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


def timed(fn, args, reps, name):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])  # warm + barrier
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"{name:30s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-prefix", action="store_true", help="components only")
    ap.add_argument("--prefix-only", action="store_true", help="cascade prefixes only")
    ap.add_argument("--marginals", action="store_true", help="prefix x views matrix")
    args = ap.parse_args()

    if args.marginals:
        marginals()
        return

    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    layers.set_default_precision(jax.lax.Precision.DEFAULT)
    cdtype = jnp.bfloat16

    cfg3 = ModelConfig(refine=False)
    ckpt = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
    if os.path.exists(ckpt):
        from cds_mvsnet_tpu.models.convert import convert_checkpoint

        params = convert_checkpoint(ckpt)
        params.pop("refine_network", None)
    else:
        params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg3)
    params = jax.device_put(params)

    batch = jax.tree.map(jnp.asarray, textured_plane_batch(V=V, H=H, W=W, D=D, refine=False))
    batch.pop("gt_plane_depth", None)
    fwd_args = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])

    results = {}

    def fwd_for(cfg):
        @jax.jit
        def f(imgs, proj, dv):
            out, _ = apply_cds_mvsnet(
                params, cfg, imgs, proj, dv, temperature=0.01, train=False,
                compute_dtype=cdtype, feature_impl="s2d",
            )
            return out["refined_depth"]

        return f

    # relay dispatch overhead
    noop = jax.jit(lambda x: x + 1.0)
    results["dispatch"] = timed(noop, (jnp.ones((8, 128)),), args.reps, "noop dispatch")

    if not args.skip_prefix:
        prefixes = {
            1: ModelConfig(refine=False, ndepths=(48,), depth_intervals_ratio=(4.0,),
                           cr_base_chs=(8,), stage_scales=(4.0,)),
            2: ModelConfig(refine=False, ndepths=(48, 32), depth_intervals_ratio=(4.0, 2.0),
                           cr_base_chs=(8, 8), stage_scales=(4.0, 2.0)),
            3: cfg3,
        }
        for n, cfg in prefixes.items():
            results[f"prefix{n}"] = timed(fwd_for(cfg), fwd_args, args.reps, f"prefix {n} stages")
        results["stage2_marginal"] = results["prefix2"] - results["prefix1"]
        results["stage3_marginal"] = results["prefix3"] - results["prefix2"]

    if args.prefix_only:
        print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))
        return

    # ---- components ----
    from cds_mvsnet_tpu.models.cds_mvsnet import pairwise_epipoles
    from cds_mvsnet_tpu.models.feature_net_s2d import feature_net_s2d
    from cds_mvsnet_tpu.ops.geometry import plane_sweep_coords
    from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas_padded
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d

    # feature extraction (the batched 2(V-1) stack, channels_first)
    imgs = batch["imgs"]
    cams3 = batch["proj_matrices"]["stage3"]
    ref_epi, src_epi = pairwise_epipoles(cams3[:, 0], cams3[:, 1:])
    ref_rep = jnp.broadcast_to(imgs[:, 0][None], (V - 1, 1, H, W, 3))
    srcs = jnp.moveaxis(imgs[:, 1:], 0, 1)
    stacked = jnp.concatenate([ref_rep, srcs], 0).reshape(2 * (V - 1), H, W, 3).astype(cdtype)
    epis = jnp.concatenate(
        [jnp.moveaxis(ref_epi, 0, 1), jnp.moveaxis(src_epi, 0, 1)], 0
    ).reshape(2 * (V - 1), 2)

    @jax.jit
    def feat_fn(xs, es):
        return feature_net_s2d(params["feature"], xs, es, 0.01, channels_first=True)

    results["features"] = timed(feat_fn, (stacked, epis), args.reps, "feature net (8 imgs)")

    feats = feat_fn(stacked, epis)

    # per-stage warp kernel + cost-reg timings (per single view)
    rng = jax.random.PRNGKey(0)
    stage_shapes = {
        "stage1": (48, H // 4, W // 4, 32),
        "stage2": (32, H // 2, W // 2, 16),
        "stage3": (8, H, W, 8),
    }
    ref_cam = batch["proj_matrices"]["stage2"][:, 0]
    src_cam = batch["proj_matrices"]["stage2"][:, 1]
    for sname, (d, h, w, c) in stage_shapes.items():
        # coherent plane-sweep coords from the real cameras at this scale
        scams = batch["proj_matrices"][sname]
        base = jnp.full((1, h, w), 600.0, jnp.float32)
        hyp = base[:, None] + jnp.linspace(-50, 50, d)[None, :, None, None]
        px, py = plane_sweep_coords(scams[:, 0], scams[:, 1], hyp, h, w)
        px = px.reshape(1, d, h, w)[0]
        py = py.reshape(1, d, h, w)[0]
        src_feat = jax.random.normal(rng, (c, h, w), cdtype)

        warp_fn = jax.jit(lambda s, x, y: warp_pallas_padded(s, x, y, channels_first=True))
        results[f"warp_{sname}_1view"] = timed(
            warp_fn, (src_feat, px, py), args.reps, f"warp kernel {sname} (1 view)"
        )

        vol = jax.random.normal(rng, (1, d, h, w, c), cdtype)
        crp = params["cost_regularization"][str(int(sname[-1]) - 1)]
        cr_fn = jax.jit(lambda v: cost_reg_net_s2d(crp, v, b=4))
        results[f"costreg_{sname}"] = timed(cr_fn, (vol,), args.reps, f"cost reg {sname}")

        # sim + entropy + vis + weighted accumulate at stage shapes
        from cds_mvsnet_tpu.models.stage_net import _vis_head_s2d
        from cds_mvsnet_tpu.ops.sampling import softmax_entropy

        warped = jax.random.normal(rng, (c, d, h, w), cdtype)
        reff = jax.random.normal(rng, (c, h, w), cdtype)
        nc = jax.random.normal(rng, (1, h, w), cdtype)
        vp = params["stage_net"]["vis"][str(int(sname[-1]) - 1)]

        @jax.jit
        def simvis(warped, reff, nc):
            sim = jnp.sum(warped.astype(jnp.float32) * reff[:, None].astype(jnp.float32), axis=0)[None]
            entropy = softmax_entropy(sim, axis=1)[:, 0]
            vis = _vis_head_s2d(vp, entropy.astype(nc.dtype), nc)
            return reff[:, None] * warped * vis[0][None, None], vis

        results[f"simvis_{sname}"] = timed(
            simvis, (warped, reff, nc), args.reps, f"sim+vis {sname} (1 view)"
        )

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))




def marginals():
    """Prefix x views matrix: separates each stage's per-source-view cost
    (warp + sim/vis) from its fixed cost (cost reg + regression).

    stage_k per-view = [(pk - pk-1)(V5) - (pk - pk-1)(V2)] / 3
    stage_k fixed    = (pk - pk-1)(V2) - per-view
    Run: python tools/profile_stages.py --marginals
    """
    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    layers.set_default_precision(jax.lax.Precision.DEFAULT)
    cdtype = jnp.bfloat16
    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    params.pop("refine_network", None)
    params = jax.device_put(params)

    prefixes = {
        1: ModelConfig(refine=False, ndepths=(48,), depth_intervals_ratio=(4.0,),
                       cr_base_chs=(8,), stage_scales=(4.0,)),
        2: ModelConfig(refine=False, ndepths=(48, 32), depth_intervals_ratio=(4.0, 2.0),
                       cr_base_chs=(8, 8), stage_scales=(4.0, 2.0)),
        3: ModelConfig(refine=False),
    }
    res = {}
    for nv in (2, 5):
        batch = jax.tree.map(
            jnp.asarray, textured_plane_batch(V=nv, H=H, W=W, D=D, refine=False)
        )
        batch.pop("gt_plane_depth", None)
        fargs = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])
        for n, cfg in prefixes.items():
            @jax.jit
            def f(imgs, proj, dv, cfg=cfg):
                out, _ = apply_cds_mvsnet(
                    params, cfg, imgs, proj, dv, temperature=0.01, train=False,
                    compute_dtype=cdtype, feature_impl="s2d",
                )
                return out["refined_depth"]

            res[f"p{n}V{nv}"] = timed(f, fargs, 5, f"prefix{n} V={nv}")

    out = {k: round(v * 1e3, 1) for k, v in res.items()}
    for k in (2, 3):
        m5 = res[f"p{k}V5"] - res[f"p{k-1}V5"]
        m2 = res[f"p{k}V2"] - res[f"p{k-1}V2"]
        per_view = (m5 - m2) / 3
        out[f"stage{k}_per_src_view_ms"] = round(per_view * 1e3, 1)
        out[f"stage{k}_fixed_ms"] = round((m2 - per_view) * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
