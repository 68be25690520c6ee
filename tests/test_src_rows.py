"""CDS_SRC_ROWS route parity (VERDICT r4 #4): warp-source features emitted
straight into the v7m/v8 kernels' (h, C, w) band layout off the feature
net's s2d exit must be bit-exact with the default route (d2s to the lead
layout + prep_src_rows relayout inside the warp wrapper).

Runs the full production eval path with interpreted kernels on CPU
(CDS_PALLAS_INTERPRET), same discipline as test_stage_batch.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet


def _make_scene(rng, B=1, V=3, H=64, W=64, D=48):
    imgs = rng.uniform(0, 1, (B, V, 3, H, W)).astype(np.float32)
    cams = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
    f = 60.0
    for v in range(V):
        angle = 0.12 * (v - 1)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, :3, :3] = R
        cams[:, v, 0, :3, 3] = [0.25 * v, 0.05 * v, 0.1 * v]
        cams[:, v, 1, :3, :3] = np.array(
            [[f, 0, W / 8], [0, f, H / 8], [0, 0, 1]], dtype=np.float32
        )
        cams[:, v, 1, 3, 3] = 1.0
    proj = {}
    for i, scale in enumerate([1.0, 2.0, 4.0]):
        m = cams.copy()
        m[:, :, 1, :2, :] *= scale
        proj[f"stage{i+1}"] = m
    dv = np.linspace(425.0, 905.0, D, dtype=np.float32)[None].repeat(B, 0)
    return imgs, proj, dv


def _run(params, cfg, imgs, proj, dv):
    out, _ = apply_cds_mvsnet(
        params, cfg,
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
        {k: jnp.asarray(v) for k, v in proj.items()},
        jnp.asarray(dv),
        temperature=0.01, train=False,
        compute_dtype=jnp.bfloat16, feature_impl="s2d",
    )
    return {
        s: {k: np.asarray(out[s][k]) for k in ("depth", "photometric_confidence")}
        for s in ("stage1", "stage2", "stage3")
    }


def test_src_rows_route_bit_exact(monkeypatch):
    monkeypatch.setenv("CDS_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    imgs, proj, dv = _make_scene(rng)
    cfg = ModelConfig(refine=False)
    params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg)

    monkeypatch.setenv("CDS_SRC_ROWS", "0")
    base = _run(params, cfg, imgs, proj, dv)
    monkeypatch.setenv("CDS_SRC_ROWS", "1")
    rows = _run(params, cfg, imgs, proj, dv)

    for s in base:
        for k in base[s]:
            np.testing.assert_array_equal(base[s][k], rows[s][k], err_msg=f"{s}.{k}")
