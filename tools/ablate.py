"""In-model component attribution by ablation, all in ONE process so the
relay's drifting throughput cancels out (absolute ms vary run to run; the
DELTAS between configs are the signal).

CDS_ABLATE knobs (stage_net eval path): nowarp<k> zeroes stage-k's warp;
novis<k> short-circuits its sim/entropy/vis chain.
Run: python tools/ablate.py
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

H, W, V, D = 864, 1152, 5, 192

# entries: an CDS_ABLATE string, ("ablate", "route") with route setting
# CDS_WARP_ROUTE (in-model warp-variant A/B), or ("ablate", "route", {env})
# for arbitrary extra env knobs (cleared between configs). Override the list
# with CDS_ABLATE_SET=<name> (groups below).
CONFIG_SETS = {
    # r3 opening run: conv3d front A/B + per-stage cost attribution
    "costreg": [
        "",  # baseline = v7m kd=4, ky=(16,16,8) (current default)
        # NEGATIVE results kept for the record (see CLAUDE.md): v6sdcg
        # (per-row cond gather skip) +277 ms/map; v6sdco (per-depth window
        # loops) +80 ms/map — the union sweep is converged.
        "nocost1",
        "nocost2",
        "nocost3",
        # Pallas MXU conv3d for the cost-reg entry conv (true 27-tap FLOPs
        # vs the s2d form's ~7.1x inflation):
        ("", "", {"CDS_COSTREG_FRONT": "pallas"}),
    ],
    # r3 warp-kernel A/B: v8 (vectorized y-mix + in-kernel online entropy)
    # vs the v7m default, with knobs isolated, plus the C>=16 XLA-crossover
    # re-check VERDICT r2 #3 asked for.
    "v8": [
        "",  # v7m everywhere (default)
        ("", "1:v8,2:v8,3:v8"),     # entropy + vectorized y-mix
        # v8r (per-row y-mix + entropy) dropped: its dynamic_update_slice
        # inside lax.cond doesn't lower on this Mosaic version, and the
        # attribution is complete without it (baseline<->v8s isolates the
        # y-mix; v8s<->v8 isolates the entropy fold).
        ("", "1:v8s,2:v8s,3:v8s"),  # sim out + vectorized y-mix
        ("", "1:xla"),              # stage1 (C=32) XLA packed-gather route
        ("", "2:xla"),              # stage2 (C=16) XLA packed-gather route
        # conv3d front, re-fixed (x-shift copies instead of the bf16 roll
        # Mosaic rejected):
        ("", "", {"CDS_COSTREG_FRONT": "pallas"}),
    ],
    # r3 conv3d-front A/B after the 8-aligned-window rewrite (the original
    # haloed DMA failed remote compile: sublane slice sizes must be
    # 8-aligned). Baseline = v8 default route.
    "r3conv": [
        "",
        ("", "", {"CDS_COSTREG_FRONT": "pallas"}),
    ],
    # fresh per-component attribution under the r3 defaults (v8 warp +
    # pallas conv3d front): what's the next biggest block?
    # RESULT (r3, baseline 340.3 ms/map): warp s1/s2/s3 43.9/67.3/35.5,
    # cost-reg s1/s2/s3 14.8/29.3/23.9; novis rows are confounded (the knob
    # drops the fused kernel entirely: −57/−109/−38 = fused-vs-unfused, not
    # vis cost).
    "r3attr": [
        "",
        "nowarp1", "nowarp2", "nowarp3",
        "novis1", "novis2", "novis3",
        "nocost1", "nocost2", "nocost3",
    ],
    # r3 stride-2 conv1 kernel A/B: pallas2 = conv0 AND conv1 through the
    # MXU conv3d kernels (conv1 at true 27 taps vs the s2d form's ~7x
    # inflation; feeds straight off conv0's W-minor output).
    "r3conv2": [
        "",  # default = v8 warp + pallas conv0 front
        ("", "", {"CDS_COSTREG_FRONT": "pallas2"}),
    ],
    "r3conv3": [
        "",
        ("", "", {"CDS_COSTREG_FRONT": "pallas3"}),
    ],
    # ky re-sweep under v8: the selection-matmul M dim and the (now
    # vectorized) y-mix both scale with ky+1; v7m-era y12 was only +6.7.
    # RESULT (r3, baseline 342.7): y12/12/6 +12.9, 2:y12 +5.4, y20/20/12
    # +0.4, kd8 +1.0 — ky=(16,16,8)/kd=4 remains CONVERGED under v8.
    "r3ky": [
        "",
        ("", "1:v8y12,2:v8y12,3:v8y6"),
        ("", "2:v8y12"),
        ("", "1:v8y20,2:v8y20,3:v8y12"),
        ("", "1:v88,2:v88,3:v88"),  # kd=8 under v8 (v7m era: +11)
    ],
    # tr (tile rows) sweep under v8 — the v6-era "bigger tiles don't help"
    # predates the matmul formulation where tr scales the MXU N dim and
    # halves per-tile fixed costs; interpret-tested bit-exact across tr.
    # (stage1 h=216 only admits tr=24; stage3 h=864 admits 16/24/32.)
    # RESULT (r3, baseline 339.6): ALL LOSE — 2:t16 +19.6, 2:t24 +30.0,
    # t24 everywhere +76.6, 3:t32 +40.8. Every window visit's matmul spans
    # all tr rows (non-intersecting rows masked), so bigger tiles multiply
    # wasted (row, window) coverage faster than they amortize fixed costs.
    # tr=8 is CONVERGED; knob kept for the record.
    "r3tr": [
        "",
        ("", "2:v8t16"),
        ("", "2:v8t24"),
        ("", "1:v8t24,2:v8t24,3:v8t24"),
        ("", "3:v8t32"),
    ],
    # r4 exit-fusion A/B: the v9 kernel (prob head + softmax + depth/conf
    # regression fused off the s2d UNet exit, ops/pallas/regress.py; default
    # since r4) vs the XLA tail it replaces.
    "r4exit": [
        "",  # default = v9 on
        ("", "", {"CDS_EXIT_FUSION": "off"}),
    ],
    # r4 block-sparse feature convs (ops/pallas/s2d_sparse.py): skip the
    # zero 128x128 weight tiles of the s2d rescatter (27-46% nonzero). The
    # r4 bench_feature3 sweep showed every lower-block reformulation LOSES
    # (XLA's fat b=8 conv is efficient per padded FLOP) — this keeps b=8
    # and drops the padding FLOPs instead.
    # RESULT (r4, tools/bench_feature3.py standalone same-process deltas,
    # all legs numerically checked exact): conv01_sp −5.1 ms WINS; conv00
    # +3.1, half (conv10+conv11) +3.2, tail (inner2+out3) +10.3, downsample
    # −0.2 — on every layer but conv01 the kernel's 3x x-shift stream
    # materialization + fixed costs exceed the skipped-tile MXU savings.
    # In-model A/B (r4, on-device, same process; baseline 344.7 ms/map):
    # conv01 −1.3 ms/map (smaller than standalone — XLA overlaps part of the
    # dense conv01 with neighbors), all +36.2 — conv01-only is the default.
    "r4sparse": [
        "",  # dense XLA s2d convs
        ("", "", {"CDS_FEAT_SPARSE": "conv01"}),
        ("", "", {"CDS_FEAT_SPARSE": "all"}),
    ],
    # r4 fused conv0+conv1 front (conv3d_front_fused): conv1 computed from
    # conv0's VMEM patch — kills conv1's full-res read of conv0's s2d form
    # AND its ~7x padded-tap contraction. The standalone conv1 kernel
    # (pallas2, r3) lost +18.4 ms/map because its de-interleave streams
    # re-read conv0's output ~4.5x from HBM; fusion removes that re-read
    # entirely. pallasf3 additionally routes conv2 off conv1's W-minor
    # output (kills conv1's re-entry relayout; r3 measured this recovers
    # ~4.9 on top of the conv1 route).
    # RESULT (r4, on-device, baseline 339.3 ms/map): BOTH LOSE — pallasf
    # +10.3, pallasf3 +5.9 (conv2-off-W-minor recovers 4.4, consistent with
    # r3). The fused conv1's in-kernel cost (halo recompute kd+1/kd, ~90
    # patch stores/step, fp32 lane rolls + selects, a decimation matmul
    # whose N dim is half wasted) exceeds what conv1's s2d conv + full-res
    # read cost XLA (~5-9 ms) — the conv0 kernel has NO DMA slack to hide
    # added compute. Kernel kept route-gated, interpret-parity-tested.
    "r4fused": [
        "",  # default = pallas conv0 front + s2d conv1
        ("", "", {"CDS_COSTREG_FRONT": "pallasf"}),
        ("", "", {"CDS_COSTREG_FRONT": "pallasf3"}),
    ],
}
CONFIG_SETS["r5lru"] = [
    # r5 S-slot LRU band cache (warp.py v8 cache_slots): the 1-slot tag
    # cache thrashes on the dt-innermost grid (roofline.py: 31k DMAs for
    # 38k visits; 4-slot LRU predicted to leave ~8k → ~23 ms/map at the
    # measured ~1 us/DMA issue floor). Bit-exact (tests/test_pallas_warp.py).
    "",  # default = v8 (1-slot)
    ("", "1:v8q2,2:v8q2,3:v8q2"),
    ("", "1:v8q4,2:v8q4,3:v8q4"),
    ("", "1:v8q8,2:v8q8,3:v8q8"),
]
CONFIG_SETS["r5rows"] = [
    # r5 src-rows feature emission (VERDICT r4 #4): warp-source features
    # leave the feature net already in the v8 kernel's (h, C, w) band layout
    # — the (C, h, w) intermediate + prep_src_rows relayout pass per view
    # never materialize. Bit-exact (tests/test_src_rows.py).
    "",  # default = lead layout + prep_src_rows
    ("", "", {"CDS_SRC_ROWS": "1"}),
]
CONFIG_SETS["r5combo"] = [
    # best-of-r5 candidate stack vs default, isolating each knob
    "",
    ("", "", {"CDS_SRC_ROWS": "1"}),
    ("", "1:v8q4,2:v8q4,3:v8q4"),
    ("", "1:v8q4,2:v8q4,3:v8q4", {"CDS_SRC_ROWS": "1"}),
]

CONFIGS = CONFIG_SETS[os.environ.get("CDS_ABLATE_SET", "costreg")]


def main():
    from cds_mvsnet_tpu.config import ModelConfig
    from cds_mvsnet_tpu.models import layers
    from cds_mvsnet_tpu.models.convert import convert_checkpoint
    from cds_mvsnet_tpu.utils.synthetic import textured_plane_batch

    layers.set_default_precision(jax.lax.Precision.DEFAULT)
    params = convert_checkpoint("/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth")
    params.pop("refine_network", None)
    params = jax.device_put(params)
    cfg = ModelConfig(refine=False)

    batch = jax.tree.map(jnp.asarray, textured_plane_batch(V=V, H=H, W=W, D=D, refine=False))
    batch.pop("gt_plane_depth", None)
    fargs = (batch["imgs"], batch["proj_matrices"], batch["depth_values"])

    res = {}
    extra_keys: set[str] = set()
    for entry in CONFIGS:
        if isinstance(entry, tuple):
            ab, route, extra = (entry + ({},))[:3]
        else:
            ab, route, extra = entry, "", {}
        for k in extra_keys:
            os.environ.pop(k, None)
        extra_keys = set(extra)
        os.environ["CDS_ABLATE"] = ab
        os.environ["CDS_WARP_ROUTE"] = route
        os.environ.update(extra)

        # fresh import-time capture happens at trace: define a new jit per config
        def fwd(imgs, proj, dv):
            from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet

            out, _ = apply_cds_mvsnet(
                params, cfg, imgs, proj, dv, temperature=0.01, train=False,
                compute_dtype=jnp.bfloat16, feature_impl="s2d",
            )
            # Consume final-stage confidence too (one scalar out: relay
            # round-trips are ~33 ms each). bench.py and the product both
            # need it — leaving it unconsumed lets XLA DCE the prob-stream
            # tail in exactly the configs the exit-fusion A/B measures
            # (discovered r4: the r4exit set read neutral while the bench
            # moved −16 ms/map). Absolute ms are ~1 pass higher than r2/r3
            # logs; in-set deltas remain the signal.
            return out["refined_depth"].ravel()[0] + jnp.mean(
                out[f"stage{cfg.num_stages}"]["photometric_confidence"]
            )

        jf = jax.jit(fwd)
        out = jf(*fargs)
        np.asarray(jax.device_get(out.ravel()[0]))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jf(*fargs)
            np.asarray(jax.device_get(out.ravel()[0]))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        name = (
            ab + ("|" + route if route else "")
            + ("|" + ",".join(f"{k}={v}" for k, v in extra.items()) if extra else "")
        ) or "baseline"
        res[name] = round(dt, 1)
        print(f"{name:32s} {dt:9.1f} ms", flush=True)

    base_key = "baseline" if "baseline" in res else next(iter(res))
    base = res[base_key]
    deltas = {f"delta_{k}": round(base - v, 1) for k, v in res.items() if k != base_key}
    print(json.dumps({**res, **deltas}))


if __name__ == "__main__":
    main()
