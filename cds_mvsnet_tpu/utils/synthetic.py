"""Synthetic, geometrically consistent multi-view batches for tests/benches.

Produces the exact pytree schema the datasets emit (SURVEY §2.2 dataset rows):
imgs (B,V,H,W,3), per-stage packed cameras (B,V,2,4,4), depth_values (B,D),
and optionally per-stage GT depth/mask pyramids.
"""

from __future__ import annotations

import numpy as np

__all__ = ["synthetic_batch", "stage_resolutions", "textured_plane_batch"]


def textured_plane_batch(
    V: int = 5,
    H: int = 256,
    W: int = 320,
    D: int = 192,
    plane_depth: float = 600.0,
    depth_min: float = 425.0,
    depth_max: float = 905.0,
    seed: int = 0,
    refine: bool = False,
):
    """Geometrically consistent views of a textured fronto-parallel plane.

    All views render the SAME world texture (bandlimited random field) on the
    plane z = plane_depth, so a correct MVS pipeline should recover
    ``plane_depth`` everywhere the views overlap — a ground-truth-bearing
    end-to-end fixture.
    """
    rng = np.random.default_rng(seed)
    f = 1.1 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float64)

    # bandlimited texture over the plane's world extent
    tex_n = 96
    tex = rng.uniform(0, 1, (tex_n, tex_n, 3))
    for _ in range(2):  # cheap smoothing for bilinear-friendly texture
        tex = 0.25 * (np.roll(tex, 1, 0) + np.roll(tex, -1, 0) + np.roll(tex, 1, 1) + np.roll(tex, -1, 1))
    extent = plane_depth * W / f * 1.6  # world size covered by the texture

    cams = np.zeros((V, 2, 4, 4), dtype=np.float32)
    imgs = np.zeros((V, H, W, 3), dtype=np.float32)
    ys, xs = np.meshgrid(np.arange(H) + 0.0, np.arange(W) + 0.0, indexing="ij")
    for v in range(V):
        t = np.array([18.0 * (v - (V - 1) / 2), 6.0 * ((v % 2) - 0.5), 0.0])
        R = np.eye(3)
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = -R @ t  # camera center at t
        cams[v, 0] = E
        cams[v, 1, :3, :3] = K
        cams[v, 1, 3, 3] = 1.0
        # ray through each pixel hits plane z = plane_depth (world frame)
        Xw = (xs - K[0, 2]) / f * plane_depth + t[0]
        Yw = (ys - K[1, 2]) / f * plane_depth + t[1]
        u = (Xw / extent + 0.5) * (tex_n - 1)
        vgrid = (Yw / extent + 0.5) * (tex_n - 1)
        u0 = np.clip(np.floor(u).astype(int), 0, tex_n - 2)
        v0 = np.clip(np.floor(vgrid).astype(int), 0, tex_n - 2)
        fu = np.clip(u - u0, 0, 1)[..., None]
        fv = np.clip(vgrid - v0, 0, 1)[..., None]
        imgs[v] = (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u0 + 1] * fu * (1 - fv)
            + tex[v0 + 1, u0] * (1 - fu) * fv
            + tex[v0 + 1, u0 + 1] * fu * fv
        ).astype(np.float32)

    res = stage_resolutions(H, W, refine)
    proj = {}
    for stage, (h_s, w_s) in res.items():
        m = cams.copy()
        m[:, 1, 0, :] *= w_s / W
        m[:, 1, 1, :] *= h_s / H
        proj[stage] = m
    depth_values = np.linspace(depth_min, depth_max, D, dtype=np.float32)
    return {
        "imgs": imgs[None],
        "proj_matrices": {k: v[None] for k, v in proj.items()},
        "depth_values": depth_values[None],
        "gt_plane_depth": plane_depth,
    }


def stage_resolutions(H: int, W: int, refine: bool, num_stages: int = 3):
    """Feature-map resolution per cascade stage (+ stage4 = full res when
    refine)."""
    wh, ww = (H // 2, W // 2) if refine else (H, W)
    res = {f"stage{i+1}": (wh // s, ww // s) for i, s in enumerate((4, 2, 1)[:num_stages])}
    if refine:
        res["stage4"] = (H, W)
    return res


def synthetic_batch(
    B: int = 1,
    V: int = 3,
    H: int = 256,
    W: int = 320,
    D: int = 192,
    refine: bool = False,
    with_gt: bool = False,
    seed: int = 0,
    depth_min: float = 425.0,
    depth_max: float = 905.0,
):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 1, (B, V, H, W, 3)).astype(np.float32)

    # One camera ring around the scene; translations small vs. scene depth.
    cams = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
    f = 1.1 * W
    K_full = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    for v in range(V):
        angle = 0.08 * (v - (V - 1) / 2)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        t = np.array([30.0 * v, 5.0 * v, 8.0 * v], dtype=np.float32)
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, :3, :3] = R
        cams[:, v, 0, :3, 3] = t
        cams[:, v, 1, :3, :3] = K_full
        cams[:, v, 1, 3, 3] = 1.0

    res = stage_resolutions(H, W, refine)
    proj = {}
    for stage, (h_s, w_s) in res.items():
        m = cams.copy()
        m[:, :, 1, 0, :] *= w_s / W
        m[:, :, 1, 1, :] *= h_s / H
        proj[stage] = m

    depth_values = np.linspace(depth_min, depth_max, D, dtype=np.float32)[None].repeat(B, 0)
    batch = {"imgs": imgs, "proj_matrices": proj, "depth_values": depth_values}

    if with_gt:
        depth_ms, mask_ms = {}, {}
        wh, ww = (H // 2, W // 2) if refine else (H, W)
        gt_res = {
            "stage1": (wh // 4, ww // 4),
            "stage2": (wh // 2, ww // 2),
            "stage3": (wh, ww),
            "stage4": (H, W) if refine else (wh, ww),
        }
        base = rng.uniform(depth_min + 50, depth_max - 50, (B, 8, 8)).astype(np.float32)
        for stage, (h_s, w_s) in gt_res.items():
            # smooth-ish GT: bilinear blow-up of a low-res random field
            ys = np.linspace(0, 7, h_s)
            xs = np.linspace(0, 7, w_s)
            y0 = np.floor(ys).astype(int)
            x0 = np.floor(xs).astype(int)
            ty = (ys - y0)[None, :, None]
            tx = (xs - x0)[None, None, :]
            y1 = np.minimum(y0 + 1, 7)
            x1 = np.minimum(x0 + 1, 7)
            d = (
                base[:, y0][:, :, x0] * (1 - ty) * (1 - tx)
                + base[:, y0][:, :, x1] * (1 - ty) * tx
                + base[:, y1][:, :, x0] * ty * (1 - tx)
                + base[:, y1][:, :, x1] * ty * tx
            ).astype(np.float32)
            depth_ms[stage] = d
            mask_ms[stage] = (rng.uniform(0, 1, (B, h_s, w_s)) > 0.2).astype(np.float32)
        batch["depth"] = depth_ms
        batch["mask"] = mask_ms
    return batch
