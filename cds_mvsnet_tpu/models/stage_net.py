"""Per-stage cost-volume construction with learned visibility weighting.

Behavioral reference: models/model.py:11-94 (StageNet) in
TruongKhang/cds-mvsnet. For each source view: plane-sweep warp, inner-product
cost, entropy of the per-depth similarity softmax, and a small CNN that maps
(entropy, reference curvature) to a per-pixel visibility weight in (0, 1);
volumes are visibility-weighted-averaged, regularized by CostRegNet, and
regressed to depth + confidence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cost_reg import cost_reg_net
from .layers import Params, StatsCollector, conv2d, default_precision, init_conv2d
from .refinement import conv_bn_relu_2d, init_conv_bn_relu_2d
from ..ops.geometry import homography_warp
from ..ops.sampling import confidence_regression, depth_regression, softmax_entropy

__all__ = ["stage_net", "init_vis_heads"]


def _vis_head(p, x, train, collector, path, axis_name):
    y = conv_bn_relu_2d(p["0"], x, train, collector, f"{path}.0", axis_name)
    y = conv_bn_relu_2d(p["1"], y, train, collector, f"{path}.1", axis_name)
    y = conv_bn_relu_2d(p["2"], y, train, collector, f"{path}.2", axis_name)
    y = conv2d(y, p["3"])
    return jax.nn.sigmoid(y)


def _bn_eval_s2d(x, p, bb):
    """Eval BatchNorm on an s2d tensor (..., bb·C): running stats broadcast
    per true channel across phases."""
    shape = x.shape
    xr = x.reshape(*shape[:-1], bb, shape[-1] // bb)
    from .layers import batch_norm

    return batch_norm(xr, p, train=False).reshape(shape)


def _vis_head_s2d(p, entropy, ref_nc, b=4):
    """s2d formulation of the visibility head (eval): identical math with
    b²-folded channels, returns ``(B, h, w)`` channel-less."""
    from ..ops.s2d import s2d_conv, space_to_depth
    from .feature_net_s2d import _d2s_map

    x = jnp.stack([entropy, ref_nc], axis=-1)  # (B, h, w, 2)
    y = space_to_depth(x, b)
    bb = b * b
    for i in range(3):
        blk = p[str(i)]
        y = s2d_conv(y, blk["conv"]["weight"], b_in=b)
        y = jax.nn.relu(_bn_eval_s2d(y, blk["bn"], bb))
    y = s2d_conv(y, p["3"]["weight"], b_in=b) + p["3"]["bias"].astype(y.dtype)
    return _d2s_map(jax.nn.sigmoid(y), b)


def stage_net(
    vis_params: Params,
    cost_reg_params: Params,
    features: list[dict],
    cams: jnp.ndarray,
    depth_values: jnp.ndarray,
    stage_idx: int,
    train: bool = False,
    s2d_eval: bool = False,
    channels_first: bool = False,
    cost_dtype=None,
    collector: StatsCollector | None = None,
    path: str = "stage_net",
    cost_reg_path: str = "cost_regularization",
    axis_name: str | None = None,
    gt_depth: jnp.ndarray | None = None,
) -> dict:
    """One cascade stage.

    Args:
      features: per source view, ``{"ref": (feat, nc_sum, nc), "src": (...)}``
        with feats ``(B, h, w, C)`` (the reference recomputes ref features per
        source pair because the epipole differs — model.py:154-161).
      cams: ``(B, V, 2, 4, 4)`` packed stage cameras (view 0 = reference).
      depth_values: ``(B, D, h, w)`` per-pixel hypotheses.
      gt_depth: optional ``(B, h, w)`` for the feature-metric loss branch.

    Returns:
      dict with depth ``(B,h,w)``, photometric_confidence, norm_curv, and in
      training feat_distance ``(B, D(+1), h, w)``.
    """
    B, V = cams.shape[0], cams.shape[1]
    num_depth = depth_values.shape[1]
    ref_cam = cams[:, 0]

    feat0 = features[0]["ref"][0]
    n_ch = feat0.shape[1] if channels_first else feat0.shape[-1]
    use_pallas = (
        s2d_eval and not train and B == 1 and gt_depth is None
        and jax.default_backend() in ("tpu", "axon")  # Mosaic needs real TPU
        # every stage runs the W-minor path; inside it the warp routes to the
        # Pallas kernel (C<=8) or the XLA packed gather + W-minor transpose
        # (C>=16) per the measured crossover (tools/bench_warp.py)
    )
    if use_pallas:
        return _stage_net_pallas(
            vis_params, cost_reg_params, features, cams, depth_values, stage_idx,
            cost_dtype=cost_dtype, channels_first=channels_first,
        )
    if channels_first:  # XLA fallback consumes channel-last features
        features = [
            {k: (jnp.moveaxis(f[0], 1, -1), f[1], f[2]) for k, f in pair.items()}
            for pair in features
        ]

    volume_sum = 0.0
    vis_sum = 0.0
    nc_sum = 0.0
    feat_distance_vol = 0.0
    gt_feat_distance = 0.0

    # Chunk the warp gather so its 4 bilinear-corner temporaries stay within
    # a ~64 MB budget (the full-volume gather OOMs HBM at DTU eval size).
    h, w = features[0]["ref"][0].shape[1:3]
    C = features[0]["ref"][0].shape[-1]
    chunk_elems = 16 * 1024 * 1024
    depth_chunk = max(1, min(num_depth, chunk_elems // max(1, h * w * C)))

    for v in range(1, V):
        ref_feat, ref_nc_sum, ref_nc = features[v - 1]["ref"]
        src_feat, src_nc_sum, _ = features[v - 1]["src"]
        src_cam = cams[:, v]

        warped = homography_warp(
            src_feat, ref_cam, src_cam, depth_values, depth_chunk=depth_chunk
        )  # (B,D,h,w,C)
        # similarity via a contraction — never materializes ref⊙warped;
        # accumulate in fp32 (entropy/softmax need it even in bf16 mode)
        sim = jnp.einsum(
            "bhwc,bdhwc->bdhw", ref_feat, warped,
            precision=default_precision(), preferred_element_type=jnp.float32,
        )
        entropy = softmax_entropy(sim, axis=1)[:, 0]  # (B, h, w)
        if s2d_eval and not train:
            vis = _vis_head_s2d(
                vis_params[str(stage_idx)], entropy.astype(ref_nc.dtype), ref_nc
            )  # (B, h, w)
        else:
            vis = _vis_head(
                vis_params[str(stage_idx)],
                jnp.stack([entropy.astype(ref_nc.dtype), ref_nc], axis=-1),
                train, collector, f"{path}.vis.{stage_idx}", axis_name,
            )[..., 0]  # (B, h, w)

        # ref⊙warped⊙vis fuses elementwise into the accumulator
        volume_sum = volume_sum + ref_feat[:, None] * warped * vis[:, None, :, :, None]
        vis_sum = vis_sum + vis
        nc_sum = nc_sum + (ref_nc_sum + src_nc_sum) / 2
        if train:
            feat_distance_vol = feat_distance_vol + sim * vis[:, None]
        if gt_depth is not None:
            gt_warped = homography_warp(src_feat, ref_cam, src_cam, gt_depth[:, None])
            gt_sim = jnp.sum(ref_feat[:, None] * gt_warped, axis=-1)  # (B, 1, h, w)
            gt_feat_distance = gt_feat_distance + gt_sim * vis[:, None]

    volume_mean = volume_sum / (vis_sum[:, None, :, :, None] + 1e-6)  # (B,D,h,w,C)
    nc_mean = nc_sum / (V - 1)

    if s2d_eval and not train:
        from .cost_reg import cost_reg_net_s2d

        cost = cost_reg_net_s2d(cost_reg_params, volume_mean, b=4)[..., 0]
    else:
        cost = cost_reg_net(
            cost_reg_params, volume_mean, train, collector, cost_reg_path, axis_name
        )[..., 0]  # (B, D, h, w)
    prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
    depth = depth_regression(prob, depth_values.astype(jnp.float32))
    conf = confidence_regression(prob)

    out = {"depth": depth, "photometric_confidence": conf, "norm_curv": nc_mean}
    if train:
        feat_distance_vol = feat_distance_vol / (vis_sum[:, None] + 1e-6)
        if gt_depth is not None:
            gt_feat_distance = gt_feat_distance / (vis_sum[:, None] + 1e-6)
            feat_distance_vol = jnp.concatenate([feat_distance_vol, gt_feat_distance], axis=1)
        out["feat_distance"] = feat_distance_vol
    return out


def _stage_net_pallas(vis_params, cost_reg_params, features, cams, depth_values, stage_idx,
                      cost_dtype=None, channels_first=False):
    """Eval stage with the Pallas banded-DMA warp kernel (B=1).

    The warp outputs W-minor ``(C, D, h, w)`` volumes, so similarity,
    visibility weighting, and accumulation all run padding-free; one
    transpose feeds the s2d cost regularization.
    """
    from ..ops.geometry import plane_sweep_coords
    from ..ops.grid_sample import pack_2x2, sample_packed_2x2
    from ..ops.pallas.warp import warp_pallas_padded
    from .cost_reg import cost_reg_net_s2d

    V = cams.shape[1]
    D = depth_values.shape[1]
    ref_cam = cams[:, 0]
    if channels_first:
        n_ch, h, w = features[0]["ref"][0].shape[1:4]
    else:
        h, w = features[0]["ref"][0].shape[1:3]
        n_ch = features[0]["ref"][0].shape[-1]

    # CDS_ABLATE (profiling only): "nowarp<k>" zeroes stage-k's warp,
    # "novis<k>" short-circuits its sim/entropy/vis head — used to attribute
    # in-model stage cost under identical relay conditions (tools/ablate.py).
    import os as _os

    _ablate = _os.environ.get("CDS_ABLATE", "")
    _route = dict(
        item.split(":") for item in _os.environ.get("CDS_WARP_ROUTE", "").split(",")
        if ":" in item
    ).get(str(stage_idx + 1))
    _bf16_all = all(
        features[v - 1]["src"][0].dtype == jnp.bfloat16 for v in range(1, V)
    )
    # Route "v6sb"/"v6sball": ONE kernel launch for all V-1 views (the view
    # axis joins the grid). MEASURED SLOWER in-model than per-view launches
    # (tools/ablate.py: batched 607-613 ms/map vs per-view 568) — kept as an
    # explicitly-routed variant only; the per-view loop below is the default.
    use_batched = (
        _bf16_all and _route in ("v6sb", "v6sball") and V > 2
        and not any(
            f"{k}{stage_idx + 1}" in _ablate for k in ("nowarp", "novis", "nocoords")
        )
        and not _os.environ.get("CDS_NO_BATCH_WARP")
    )
    if use_batched:
        from ..ops.pallas.warp import warp_pallas_v6s_batched

        ky = 8 if n_ch <= 8 else 16
        refs, srcs, pxs, pys = [], [], [], []
        for v in range(1, V):
            ref_feat = features[v - 1]["ref"][0]
            src_feat = features[v - 1]["src"][0]
            refs.append(ref_feat[0] if channels_first else jnp.moveaxis(ref_feat[0], -1, 0))
            srcs.append(src_feat[0] if channels_first else jnp.moveaxis(src_feat[0], -1, 0))
            px, py = plane_sweep_coords(ref_cam, cams[:, v], depth_values, h, w)
            pxs.append(px[0].reshape(D, h, w))
            pys.append(py[0].reshape(D, h, w))
        refs, srcs = jnp.stack(refs), jnp.stack(srcs)
        pxs, pys = jnp.stack(pxs), jnp.stack(pys)
        Wp = ((w + 127) // 128) * 128
        if Wp != w:
            pad = ((0, 0), (0, 0), (0, 0), (0, Wp - w))
            pxs = jnp.pad(pxs, pad, constant_values=-1e6)
            pys = jnp.pad(pys, pad, constant_values=-1e6)
            refs = jnp.pad(refs, ((0, 0), (0, 0), (0, 0), (0, Wp - w)))
        # route "v6sb" = batched WITHOUT the DMA window cache (A/B knob);
        # default = depth-innermost grid + cross-step window-cache DMA skip
        in_prod, sim = warp_pallas_v6s_batched(
            srcs, refs, pxs, pys, ky=ky, dma_cache=_route != "v6sb"
        )
        if Wp != w:
            in_prod = in_prod[..., :w]
            sim = sim[..., :w]
        entropy = softmax_entropy(sim, axis=1)[:, 0]  # (V-1, h, w)
        ref_nc_all = jnp.concatenate(
            [features[v - 1]["ref"][2] for v in range(1, V)], axis=0
        )
        vis = _vis_head_s2d(
            vis_params[str(stage_idx)], entropy.astype(ref_nc_all.dtype), ref_nc_all
        )  # (V-1, h, w)
        volume_sum = jnp.sum(in_prod * vis[:, None, None], axis=0)  # (C, D, h, w)
        vis_sum = jnp.sum(vis, axis=0, keepdims=True)  # (1, h, w)
        nc_sum = sum(
            (features[v - 1]["ref"][1] + features[v - 1]["src"][1]) / 2
            for v in range(1, V)
        )
        return _stage_net_pallas_tail(
            cost_reg_params, volume_sum, vis_sum, nc_sum, depth_values, V,
            stage_idx, cost_dtype, _ablate,
        )
    volume_sum = 0.0
    vis_sum = 0.0
    nc_sum = 0.0
    for v in range(1, V):
        ref_feat, ref_nc_sum, ref_nc = features[v - 1]["ref"]
        src_feat, src_nc_sum, _ = features[v - 1]["src"]
        px, py = plane_sweep_coords(ref_cam, cams[:, v], depth_values, h, w)
        if f"nocoords{stage_idx + 1}" in _ablate:
            # profiling knob: replace projective coords with a cheap ramp of
            # the same coherence, isolating coordinate-math cost
            lin = jax.lax.broadcasted_iota(jnp.float32, (1, D * h * w), 1)
            px = (lin % w) + depth_values.mean() * 1e-12
            py = (lin // w) % h
        # Measured routing (tools/bench_warp.py microbench + tools/ablate.py
        # IN-MODEL route A/B, v5e): with bf16 features every stage runs the
        # v6 bit-packed kernel — in-model it beats the XLA packed gather even
        # at C=16/32 where the standalone microbench says otherwise, because
        # v6 emits the W-minor layout directly while the XLA route pays a
        # real (C, D, h, w) transpose that the microbench's sum-consumer
        # elided (stage2: -42.6 ms/map, stage1: -5.5, stage3 v6ky8 vs v3:
        # -12). fp32 features (parity evals) fall back to v3 at C<=8 / XLA
        # otherwise. CDS_WARP_ROUTE overrides per stage for in-model A/B,
        # e.g. "2:v6ky16,3:xla" (profiling only).
        bf16 = src_feat.dtype == jnp.bfloat16
        route = dict(
            item.split(":") for item in _os.environ.get("CDS_WARP_ROUTE", "").split(",")
            if ":" in item
        ).get(str(stage_idx + 1))
        use_kernel = (bf16 or n_ch <= 8) if route is None else route != "xla"
        ref_t = ref_feat[0] if channels_first else jnp.moveaxis(ref_feat[0], -1, 0)
        # v6s fuses in_prod = ref⊙warped and sim into the warp kernel — the
        # separate full-volume fp32 sim pass (~8 ms/view, tools/bench_vis.py)
        # and the outside ref multiply disappear. Ablation knobs and route
        # overrides keep the unfused path so their DCE semantics stay valid.
        fused = (
            use_kernel and bf16
            and (route is None or route.startswith(("v6s", "v7m", "v8")))
            and not any(
                f"{k}{stage_idx + 1}" in _ablate for k in ("nowarp", "novis", "nocoords")
            )
        )
        if fused:
            from ..ops.pallas.warp import warp_pallas_v6s

            ky = 8 if n_ch <= 8 else 16
            if route is not None and route.startswith("v6sky"):
                ky = int(route[len("v6sky"):])
            Wp = ((w + 127) // 128) * 128
            px_k = px[0].reshape(D, h, w)
            py_k = py[0].reshape(D, h, w)
            ref_k = ref_t
            if Wp != w:
                pad = ((0, 0), (0, 0), (0, Wp - w))
                px_k = jnp.pad(px_k, pad, constant_values=-1e6)
                py_k = jnp.pad(py_k, pad, constant_values=-1e6)
                ref_k = jnp.pad(ref_t, ((0, 0), (0, 0), (0, Wp - w)))
            # Route chain (first match wins): v8 (default), v7m, v6sdc, v6sd,
            # v6s/v6sc/v6sky<N> — all depth-blocked per-view launches; the
            # older variants stay route-gated for A/B.
            ent_k = None
            if route is None or route.startswith("v8"):
                # DEFAULT route (v8, on-device A/B r3: 369.5 vs v7m 371.8
                # ms/map): v7m + vectorized y-mix/epilogue + in-kernel online
                # softmax entropy — the (D, h, w) fp32 sim stream and XLA's
                # separate entropy pass disappear (the depth-innermost grid
                # lets a flash-attention-style running (max, Σe, Σl·e) finish
                # the softmax within one tile's visit sequence). Route grammar
                # "v8[s][r][<kd>][y<ky>][t<tr>]": s = emit sim instead of
                # entropy, r = v7m's per-row y-mix, t = output rows per tile
                # (matmul N = tr·128; must divide the stage height, else
                # falls back to the default 8).
                from ..ops.geometry import relative_warp_transform
                from ..ops.pallas.warp import warp_pallas_v8

                suffix = "" if route is None else route[len("v8"):]
                emit_entropy = True
                row_ymix = False
                if suffix.startswith("s"):
                    emit_entropy = False
                    suffix = suffix[1:]
                if suffix.startswith("r"):
                    row_ymix = True
                    suffix = suffix[1:]
                kd_s, _, rest = suffix.partition("y")
                ky_s, _, tr_s = rest.partition("t")
                if not rest:
                    kd_s, _, tr_s = suffix.partition("t")
                kd = int(kd_s or 4)
                if ky_s:
                    ky = int(ky_s)
                tr_v = int(tr_s) if tr_s else 8
                if tr_v % 8 or h % tr_v:
                    tr_v = 8
                while D % kd:
                    kd //= 2
                rot, trans = relative_warp_transform(ref_cam, cams[:, v])
                rt = jnp.concatenate(
                    [rot[0].reshape(9), trans[0].reshape(3)]
                ).astype(jnp.float32)
                if depth_values.ndim == 2:
                    dep = jnp.broadcast_to(depth_values[0][:, None, None], (D, h, w))
                else:
                    dep = depth_values[0]
                if Wp != w:
                    dep = jnp.pad(dep, ((0, 0), (0, 0), (0, Wp - w)))
                in_prod, aux = warp_pallas_v8(
                    src_feat[0], ref_k, dep, rt, w_valid=w, ky=ky,
                    kd=max(kd, 1), tr=tr_v, emit_entropy=emit_entropy,
                    row_ymix=row_ymix,
                )
                if emit_entropy:
                    ent_k, sim_k = aux, None
                else:
                    sim_k = aux
            elif route.startswith("v7m"):
                # v7m (default until r3): MXU-contraction warp — x-select and
                # x-lerp fold into a bf16 selection-matrix matmul with fp32
                # accumulation; only the y-mix stays on the VPU. In-model
                # −80.3 ms/map vs v6sdc (ablate, same-process: stage2 −54.8,
                # stage1 −23.7). Route grammar "v7m[<kd>][y<ky>]".
                from ..ops.geometry import relative_warp_transform
                from ..ops.pallas.warp import warp_pallas_v7m

                suffix = "" if route is None else route[len("v7m"):]
                kd_s, _, ky_s = suffix.partition("y")
                kd = int(kd_s or 4)
                if ky_s:
                    ky = int(ky_s)
                while D % kd:
                    kd //= 2
                rot, trans = relative_warp_transform(ref_cam, cams[:, v])
                rt = jnp.concatenate(
                    [rot[0].reshape(9), trans[0].reshape(3)]
                ).astype(jnp.float32)
                if depth_values.ndim == 2:
                    dep = jnp.broadcast_to(depth_values[0][:, None, None], (D, h, w))
                else:
                    dep = depth_values[0]
                if Wp != w:
                    dep = jnp.pad(dep, ((0, 0), (0, 0), (0, Wp - w)))
                in_prod, sim_k = warp_pallas_v7m(
                    src_feat[0], ref_k, dep, rt, w_valid=w, ky=ky, kd=max(kd, 1)
                )
            elif route.startswith("v6sdc"):
                # v6sdc (prior default): in-kernel projective coords — the
                # tile evaluates px/py from 12 SMEM homography scalars + its
                # depth block, so the XLA coords pass and both (D, h, w)
                # px/py HBM streams vanish (px/py above are dead here and
                # DCE'd by jit). In-model −9.8 ms/map vs v6sd (ablate,
                # same-process A/B); kd=8 measured level with kd=4.
                from ..ops.geometry import relative_warp_transform
                from ..ops.pallas.warp import warp_pallas_v6sdc

                # route grammar: "v6sdc[g|o][<kd>][y<ky>]", e.g. "v6sdco4y12"
                # (g = per-row window gating, o = per-depth window loops —
                # A/B knobs)
                suffix = "" if route is None else route[len("v6sdc"):]
                gate = "none"
                if suffix.startswith("g"):
                    gate = "row"
                    suffix = suffix[1:]
                elif suffix.startswith("o"):
                    gate = "odloop"
                    suffix = suffix[1:]
                kd_s, _, ky_s = suffix.partition("y")
                kd = int(kd_s or 4)
                if ky_s:
                    ky = int(ky_s)
                while D % kd:
                    kd //= 2
                rot, trans = relative_warp_transform(ref_cam, cams[:, v])
                rt = jnp.concatenate(
                    [rot[0].reshape(9), trans[0].reshape(3)]
                ).astype(jnp.float32)
                if depth_values.ndim == 2:
                    dep = jnp.broadcast_to(depth_values[0][:, None, None], (D, h, w))
                else:
                    dep = depth_values[0]
                if Wp != w:
                    dep = jnp.pad(dep, ((0, 0), (0, 0), (0, Wp - w)))
                in_prod, sim_k = warp_pallas_v6sdc(
                    src_feat[0], ref_k, dep, rt, w_valid=w, ky=ky, kd=max(kd, 1),
                    gate=gate,
                )
            elif route.startswith("v6sd"):
                from ..ops.pallas.warp import warp_pallas_v6sd

                kd = int(route[len("v6sd"):] or 4)
                while D % kd:  # stages with odd plane counts fall back safely
                    kd //= 2
                in_prod, sim_k = warp_pallas_v6sd(
                    src_feat[0], ref_k, px_k, py_k, ky=ky, kd=max(kd, 1)
                )
            else:
                in_prod, sim_k = warp_pallas_v6s(
                    src_feat[0], ref_k, px_k, py_k, ky=ky,
                    dma_cache=route == "v6sc",
                )
            if Wp != w:
                in_prod = in_prod[..., :w]
                if sim_k is not None:
                    sim_k = sim_k[..., :w]
                if ent_k is not None:
                    ent_k = ent_k[..., :w]
            if ent_k is not None:  # v8 emitted the entropy map directly
                entropy = ent_k[None]  # (1, h, w)
            else:
                entropy = softmax_entropy(sim_k[None], axis=1)[:, 0]  # (1, h, w)
            vis = _vis_head_s2d(
                vis_params[str(stage_idx)], entropy.astype(ref_nc.dtype), ref_nc
            )  # (1, h, w)
            volume_sum = volume_sum + in_prod * vis[0][None, None]
            vis_sum = vis_sum + vis
            nc_sum = nc_sum + (ref_nc_sum + src_nc_sum) / 2
            continue
        if use_kernel:
            if route not in (None, "xla"):
                variant, ky = route.split("ky") if "ky" in route else (route, "8")
                ky = int(ky)
            elif bf16:
                variant, ky = "v6", (8 if n_ch <= 8 else 16)
            else:
                variant, ky = "v3", 8
            warped = warp_pallas_padded(
                src_feat[0], px[0].reshape(D, h, w), py[0].reshape(D, h, w),
                channels_first=channels_first, variant=variant, ky=ky,
            )  # (C, D, h, w)
        else:
            src_nhwc = (
                jnp.moveaxis(src_feat, 1, -1) if channels_first else src_feat
            )  # (1, h, w, C)
            flat = sample_packed_2x2(
                pack_2x2(src_nhwc), src_nhwc.shape, px.reshape(1, -1), py.reshape(1, -1)
            )  # (1, D·h·w, C)
            warped = jnp.moveaxis(flat.reshape(D, h, w, n_ch), -1, 0)  # (C, D, h, w)
        if f"nowarp{stage_idx + 1}" in _ablate:
            warped = jnp.zeros_like(warped) + src_feat[0].mean() * 0.01
        if f"novis{stage_idx + 1}" in _ablate:
            vis = jnp.ones((1, h, w), ref_nc.dtype) * 0.9
        else:
            # multiply-reduce instead of dot_general: the C contraction is
            # tiny and W-minor elementwise+reduce fuses without relayout
            sim = jnp.sum(
                warped.astype(jnp.float32) * ref_t[:, None].astype(jnp.float32), axis=0
            )[None]
            entropy = softmax_entropy(sim, axis=1)[:, 0]  # (1, h, w)
            vis = _vis_head_s2d(
                vis_params[str(stage_idx)], entropy.astype(ref_nc.dtype), ref_nc
            )  # (1, h, w)
        volume_sum = volume_sum + ref_t[:, None] * warped * vis[0][None, None]
        vis_sum = vis_sum + vis
        nc_sum = nc_sum + (ref_nc_sum + src_nc_sum) / 2

    return _stage_net_pallas_tail(
        cost_reg_params, volume_sum, vis_sum, nc_sum, depth_values, V, stage_idx,
        cost_dtype, _ablate,
    )


def _stage_net_pallas_tail(cost_reg_params, volume_sum, vis_sum, nc_sum,
                           depth_values, V, stage_idx, cost_dtype, _ablate):
    """Shared Pallas-path tail: visibility-normalize, regularize, regress."""
    from .cost_reg import cost_reg_net_s2d

    D = depth_values.shape[1]
    volume_mean = volume_sum / (vis_sum[0][None, None] + 1e-6)  # (C, D, h, w)
    nc_mean = nc_sum / (V - 1)
    if cost_dtype is not None:
        # cost-volume regularization is the most quantization-sensitive part
        # of the cascade (its logits drive the soft-argmin); s2d removed the
        # lane-padding tax, so running it above bf16 costs only bandwidth
        volume_mean = volume_mean.astype(cost_dtype)
    if f"nocost{stage_idx + 1}" in _ablate:
        h_s, w_s = volume_mean.shape[2], volume_mean.shape[3]
        cost = jnp.broadcast_to(
            jnp.mean(volume_mean).astype(jnp.float32), (1, D, h_s, w_s)
        )
    else:
        cost = cost_reg_net_s2d(cost_reg_params, volume_mean, b=4, cfirst=True)[..., 0]
    prob = jax.nn.softmax(cost.astype(jnp.float32), axis=1)
    depth = depth_regression(prob, depth_values.astype(jnp.float32))
    conf = confidence_regression(prob)
    return {"depth": depth, "photometric_confidence": conf, "norm_curv": nc_mean}


def init_vis_heads(key, num_stages: int = 3) -> Params:
    p: Params = {}
    for s in range(num_stages):
        keys = jax.random.split(jax.random.fold_in(key, s), 4)
        p[str(s)] = {
            "0": init_conv_bn_relu_2d(keys[0], 2, 16),
            "1": init_conv_bn_relu_2d(keys[1], 16, 16),
            "2": init_conv_bn_relu_2d(keys[2], 16, 16),
            "3": init_conv2d(keys[3], 1, 1, 16, 1, True),
        }
    return p
