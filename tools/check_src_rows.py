"""Parity check for the CDS_SRC_ROWS route (VERDICT r4 #4): source features
emitted straight into the v7m/v8 kernels' (h, C, w) band layout off the s2d
exit must be bit-exact with the default (d2s -> prep_src_rows) route.

Runs the FULL model twice on CPU with interpreted kernels. Usage:
    python tools/check_src_rows.py
"""

import os

os.environ["CDS_PALLAS_INTERPRET"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet


def make_scene(rng, B=1, V=3, H=64, W=64, D=48):
    imgs = rng.uniform(0, 1, (B, V, 3, H, W)).astype(np.float32)
    cams = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
    f = 60.0
    for v in range(V):
        angle = 0.12 * (v - 1)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        t = np.array([0.25 * v, 0.05 * v, 0.1 * v], dtype=np.float32)
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, :3, :3] = R
        cams[:, v, 0, :3, 3] = t
        cams[:, v, 1, :3, :3] = np.array(
            [[f, 0, W / 8], [0, f, H / 8], [0, 0, 1]], dtype=np.float32
        )
        cams[:, v, 1, 3, 3] = 1.0
    proj = {}
    for i, scale in enumerate([1.0, 2.0, 4.0]):
        m = cams.copy()
        m[:, :, 1, :2, :] *= scale
        proj[f"stage{i+1}"] = m
    depth_values = np.linspace(425.0, 905.0, D, dtype=np.float32)[None].repeat(B, 0)
    return imgs, proj, depth_values


def run(params, cfg, imgs, proj, depth_values):
    out, _ = apply_cds_mvsnet(
        params, cfg,
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
        {k: jnp.asarray(v) for k, v in proj.items()},
        jnp.asarray(depth_values),
        temperature=0.01, train=False,
        compute_dtype=jnp.bfloat16, feature_impl="s2d",
    )
    return jax.tree.map(np.asarray, {
        s: {k: out[s][k] for k in ("depth", "photometric_confidence")}
        for s in ("stage1", "stage2", "stage3")
    })


def main():
    rng = np.random.default_rng(0)
    imgs, proj, depth_values = make_scene(rng)
    cfg = ModelConfig(refine=False)
    params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)

    os.environ["CDS_SRC_ROWS"] = "0"
    base = run(params, cfg, imgs, proj, depth_values)
    os.environ["CDS_SRC_ROWS"] = "1"
    rows = run(params, cfg, imgs, proj, depth_values)

    ok = True
    for s in base:
        for k in base[s]:
            a, b = base[s][k], rows[s][k]
            exact = np.array_equal(a, b)
            md = float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
            print(f"{s}.{k}: exact={exact} max|d|={md:.3e}")
            ok &= exact
    print("PARITY:", "BIT-EXACT" if ok else "MISMATCH")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
