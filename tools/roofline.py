"""Measured roofline for the v8 fused-warp formulation at the bench point.

VERDICT r4 #2: quantify the physical floor of the gather/DMA-bound warp
formulation — per stage: window visits x (DMA issue + band bytes), MXU
contraction MACs, VPU y-mix flops, HBM in/out streams — and compare the
summed floor against the measured in-model ms/map and the 8x-baseline
target (31.25 ms/map), to establish whether the target is reachable on v5e
with THIS formulation or what restructuring the residual gap requires.

Method: the bench fixture (utils/synthetic.textured_plane_batch) has a
constant-z GT plane, so every stage's depth hypotheses are constant per
plane (resize/clamp of a constant is a constant) and the kernel's per-tile
window sweep can be replayed exactly in numpy — same floor/clip/window
arithmetic as ops/pallas/warp.py::_warp_kernel_v7m/v8 — giving EXACT visit,
DMA (with the cross-step (ys, xs) tag-cache dedup), matmul, and byte counts
for the real bench geometry.

Hardware constants (v5e, measured/spec):
  HBM        ~819 GB/s
  MXU bf16   197 TFLOP/s  (98.5e12 MAC/s)
  VPU fp32   ~3.9e12 FMA/s
  DMA issue  ~1 us each, not overlapped within a grid step (measured,
             tools/bench_warp.py cost model — CLAUDE.md)
  dispatch   ~33 ms relay round trip per jitted call (amortized /B)

Usage: python tools/roofline.py            (pure host numpy, no TPU needed)
"""

from __future__ import annotations

import numpy as np

HBM_BPS = 819e9
MXU_MACS = 98.5e12
VPU_FMAS = 3.9e12
DMA_ISSUE_S = 1e-6
KX = 128
TR = 8

# bench point
H_IMG, W_IMG, V, D_FULL = 864, 1152, 5, 192
DMIN, DMAX, PLANE = 425.0, 905.0, 600.0
NDEPTHS = (48, 32, 8)
RATIOS = (4.0, 2.0, 1.0)
CHANNELS = (32, 16, 8)
KYS = (16, 16, 8)  # parse_fused_route defaults: C>8 -> 16 else 8
KD = 4

# Measured in-model attribution (tools/ablate.py, r4 era, ~340 ms/map total;
# B=4 bench total 322.9 ms/map). Used only for the "measured" column.
MEASURED_MS = {
    "warp1": 88.0, "warp2": 203.0 * 88 / 88, "warp3": 102.0,
}
# r4 in-model shares at ~340 ms/map (STATUS r3 backlog numbers):
MEASURED = {"warps": 147.0, "cost_regs": 68.0, "features": 65.0,
            "tails": 35.0, "relay_floor": 25.0}


def fixture_cams():
    """Replicate textured_plane_batch's camera ring (utils/synthetic.py)."""
    f = 1.1 * W_IMG
    K = np.array([[f, 0, W_IMG / 2], [0, f, H_IMG / 2], [0, 0, 1]], np.float64)
    cams = np.zeros((V, 2, 4, 4), np.float32)
    for v in range(V):
        t = np.array([18.0 * (v - (V - 1) / 2), 6.0 * ((v % 2) - 0.5), 0.0])
        E = np.eye(4)
        E[:3, 3] = -t
        cams[v, 0] = E
        cams[v, 1, :3, :3] = K
        cams[v, 1, 3, 3] = 1.0
    return cams


def stage_cams(cams, scale):
    m = cams.copy()
    m[:, 1, 0, :] *= 1.0 / scale
    m[:, 1, 1, :] *= 1.0 / scale
    return m


def rel_rt(ref_cam, src_cam):
    """relative_warp_transform (ops/geometry.py:130) in numpy."""
    K1, E1 = ref_cam[1, :3, :3].astype(np.float64), ref_cam[0].astype(np.float64)
    K2, E2 = src_cam[1, :3, :3].astype(np.float64), src_cam[0].astype(np.float64)
    R1, t1 = E1[:3, :3], E1[:3, 3:]
    R2, t2 = E2[:3, :3], E2[:3, 3:]
    R_rel = R2 @ R1.T
    t_rel = t2 - R_rel @ t1
    rot = K2 @ R_rel @ np.linalg.inv(K1)
    trans = K2 @ t_rel
    return np.concatenate([rot.reshape(9), trans.reshape(3)]).astype(np.float32)


def stage_depths(stage_idx):
    """Per-plane constant hypotheses for the constant-z fixture."""
    D = NDEPTHS[stage_idx]
    if stage_idx == 0:
        return np.linspace(DMIN, DMAX, D, dtype=np.float32)  # spans full range
    ivl = (DMAX - DMIN) / (D_FULL - 1) * RATIOS[stage_idx]
    nl = (D - 1) // 2
    lo = PLANE - nl * ivl
    s = lo + np.arange(D, dtype=np.float32) * ivl
    s = DMIN + np.maximum(s - DMIN, 0)
    s = DMAX + np.minimum(s - DMAX, 0)
    return s.astype(np.float32)


def sweep_stage(stage_idx, verbose=False):
    """Replay the v8 tile sweep for all V-1 src views; return count dict."""
    scale = (4, 2, 1)[stage_idx]
    h, w = H_IMG // scale, W_IMG // scale
    Wp = ((w + 127) // 128) * 128
    C, ky = CHANNELS[stage_idx], KYS[stage_idx]
    D = NDEPTHS[stage_idx]
    deps = stage_depths(stage_idx)
    Hp_src = ((h + ky - 1) // ky) * ky + 1

    cams = stage_cams(fixture_cams(), scale)
    jj = np.arange(Wp, dtype=np.float32)
    ii = np.arange(h, dtype=np.float32)
    X = np.broadcast_to(jj[None, :], (h, Wp))
    Y = np.broadcast_to(ii[:, None], (h, Wp))

    n_yt, n_xt, n_dt = h // TR, Wp // KX, D // KD
    tot = dict(visits=0, dmas=0, tiles=n_yt * n_xt * n_dt * (V - 1))
    for v in range(1, V):
        rt = rel_rt(cams[0], cams[v])
        L0 = rt[0] * X + rt[1] * Y + rt[2]
        L1 = rt[3] * X + rt[4] * Y + rt[5]
        L2 = rt[6] * X + rt[7] * Y + rt[8]
        # (D, h, Wp) in fp32, same arithmetic as the kernel
        px = np.empty((D, h, Wp), np.float32)
        py = np.empty((D, h, Wp), np.float32)
        for d in range(D):
            z = L2 * deps[d] + rt[11] + 1e-6
            px[d] = (L0 * deps[d] + rt[9]) / z
            py[d] = (L1 * deps[d] + rt[10]) / z
        pad = X >= float(w)
        px[:, pad] = -1e6
        py[:, pad] = -1e6
        x0 = np.floor(px).astype(np.int64)
        y0 = np.floor(py).astype(np.int64)
        bx = np.clip(x0, 0, w - 2)
        by = np.clip(y0, 0, h - 2)

        # grid order (yt, xt, dt), dt innermost — replay the tag cache.
        # Also simulate S-slot LRU window caches: with dt innermost the
        # visit sequence alternates between the same few windows (A,B,A,B…),
        # which a 1-slot tag cache thrashes on; "dma_lru<S>" predicts the
        # DMA count a multi-slot cache would leave.
        last = None
        lru = {s: [] for s in (2, 4, 8)}  # slot count -> [(ys,xs) MRU-first]
        for yt in range(n_yt):
            for xt in range(n_xt):
                for dt in range(n_dt):
                    sl = (
                        slice(dt * KD, (dt + 1) * KD),
                        slice(yt * TR, (yt + 1) * TR),
                        slice(xt * KX, (xt + 1) * KX),
                    )
                    tby, tbx = by[sl], bx[sl]
                    tx0 = x0[sl]
                    ymin = tby.min()
                    n_y = (tby.max() - ymin) // ky + 1
                    xwin_lo = tbx.min() // KX
                    n_x = (tbx + 1).max() // KX - xwin_lo + 1
                    wy = (tby - ymin) // ky
                    for jy in range(n_y):
                        for jx in range(xwin_lo, xwin_lo + n_x):
                            xs = jx * KX
                            a0 = tx0 - xs
                            a1 = a0 + 1
                            xin = ((a0 >= 0) & (a0 < KX)) | ((a1 >= 0) & (a1 < KX))
                            if not np.any((wy == jy) & xin):
                                continue
                            tot["visits"] += 1
                            ys = min(ymin + jy * ky, Hp_src - (ky + 1))
                            if last != (ys, xs):
                                tot["dmas"] += 1
                                last = (ys, xs)
                            for S, q in lru.items():
                                key = (ys, xs)
                                if key in q:
                                    q.remove(key)
                                else:
                                    tot[f"dma_lru{S}"] = tot.get(f"dma_lru{S}", 0) + 1
                                    if len(q) >= S:
                                        q.pop()
                                q.insert(0, key)

    band_bytes = (ky + 1) * C * KX * 2
    macs = tot["visits"] * KD * ((ky + 1) * C) * KX * (TR * KX)
    # v8 vectorized y-mix: (ky+1) FMAs of (C, tr*128) per depth plane/visit
    vpu = tot["visits"] * KD * (ky + 1) * C * TR * KX
    streams = (V - 1) * (
        D * h * Wp * 4            # dep read (fp32)
        + C * h * Wp * 2          # ref read (bf16, cached across d steps)
        + C * D * h * Wp * 2      # in_prod write (bf16)
        + h * Wp * 4              # entropy write (fp32)
    ) + (V - 1) * C * D * h * w * 2 * 2  # volume_sum accumulate (read+write)

    res = dict(
        stage=stage_idx + 1, h=h, w=w, Wp=Wp, C=C, ky=ky, D=D,
        visits=tot["visits"], dmas=tot["dmas"], tiles=tot["tiles"],
        dma_lru2=tot.get("dma_lru2", 0), dma_lru4=tot.get("dma_lru4", 0),
        dma_lru8=tot.get("dma_lru8", 0),
        dma_issue_ms=tot["dmas"] * DMA_ISSUE_S * 1e3,
        dma_bytes_ms=tot["dmas"] * band_bytes / HBM_BPS * 1e3,
        mxu_ms=macs / MXU_MACS * 1e3,
        vpu_ms=vpu / VPU_FMAS * 1e3,
        streams_ms=streams / HBM_BPS * 1e3,
    )
    # serial model (measured: DMA issue does NOT overlap compute in-step);
    # bytes-bound work and MXU work can overlap, take the max
    res["floor_ms"] = res["dma_issue_ms"] + max(
        res["dma_bytes_ms"] + res["streams_ms"], res["mxu_ms"], res["vpu_ms"]
    )
    return res


def main():
    rows = [sweep_stage(s) for s in range(3)]
    hdr = ("stage h    w     C  ky D  tiles  visits  v/tile dmas   "
           "issue  bytes  mxu    vpu    streams floor")
    print(hdr)
    for r in rows:
        print(
            f"{r['stage']:5d} {r['h']:<4d} {r['w']:<5d} {r['C']:<2d} "
            f"{r['ky']:<2d} {r['D']:<2d} {r['tiles']:<6d} {r['visits']:<7d} "
            f"{r['visits']/r['tiles']:<6.2f} {r['dmas']:<6d} "
            f"{r['dma_issue_ms']:<6.2f} {r['dma_bytes_ms']:<6.2f} "
            f"{r['mxu_ms']:<6.2f} {r['vpu_ms']:<6.2f} "
            f"{r['streams_ms']:<7.2f} {r['floor_ms']:.2f}"
        )
    warp_floor = sum(r["floor_ms"] for r in rows)
    print(f"\nwarp floor (all stages, {V - 1} src views): {warp_floor:.1f} ms/map")
    print("measured warp share (r4 ablate attribution): ~147 ms/map")
    print(f"kernel overhead factor: {147.0 / warp_floor:.1f}x" if warp_floor else "")
    print("\nS-slot LRU window-cache DMA prediction (dt-innermost thrash):")
    for r in rows:
        print(
            f"  stage{r['stage']}: dmas 1-slot {r['dmas']}  "
            f"2-slot {r['dma_lru2']}  4-slot {r['dma_lru4']}  "
            f"8-slot {r['dma_lru8']}  "
            f"(saving at 4: {(r['dmas'] - r['dma_lru4']) * DMA_ISSUE_S * 1e3:.1f} ms)"
        )


if __name__ == "__main__":
    main()
