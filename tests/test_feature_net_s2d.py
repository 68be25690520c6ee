"""s2d FeatureNet must equal the plain one at eval."""

import jax
import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.models.feature_net import feature_net, init_feature_net
from cds_mvsnet_tpu.models.feature_net_s2d import feature_net_s2d


def test_vis_head_s2d_matches_plain():
    from cds_mvsnet_tpu.models.stage_net import _vis_head, _vis_head_s2d, init_vis_heads

    rng = np.random.default_rng(3)
    vis = init_vis_heads(jax.random.PRNGKey(1))
    ent = jnp.asarray(rng.standard_normal((2, 32, 48)).astype(np.float32))
    nc = jnp.asarray(rng.standard_normal((2, 32, 48)).astype(np.float32))
    want = _vis_head(vis["1"], jnp.stack([ent, nc], -1), False, None, "p", None)[..., 0]
    got = _vis_head_s2d(vis["1"], ent, nc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_s2d_sparse_route_matches_plain(monkeypatch):
    """CDS_FEAT_SPARSE=all routes every conv through the block-sparse Pallas
    kernel (interpret mode on CPU); the full net must match the dense route."""
    rng = np.random.default_rng(1)
    params = init_feature_net(jax.random.PRNGKey(0))
    N, H, W = 2, 64, 128  # W' = W/8 = 16 is 8-aligned at every stage
    # bf16 on BOTH legs (the production eval dtype; the kernel always
    # computes bf16 x fp32-acc) so only accumulation order differs
    x = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32))
    x = x.astype(jnp.bfloat16)
    epi = jnp.asarray(rng.uniform(-2000, 4000, (N, 2)).astype(np.float32))

    monkeypatch.setenv("CDS_FEAT_SPARSE", "off")
    truth = feature_net_s2d(params, x.astype(jnp.float32), epi, temperature=0.5)
    dense = feature_net_s2d(params, x, epi, temperature=0.5)
    monkeypatch.setenv("CDS_FEAT_SPARSE", "all")
    monkeypatch.setenv("CDS_PALLAS_INTERPRET", "1")
    sparse = feature_net_s2d(params, x, epi, temperature=0.5)

    for stage in ["stage1", "stage2", "stage3"]:
        for k in range(3):
            t = np.asarray(truth[stage][k], np.float32)
            ed = np.abs(np.asarray(dense[stage][k], np.float32) - t)
            es = np.abs(np.asarray(sparse[stage][k], np.float32) - t)
            # single-layer parity is bf16-ulp-exact (test_s2d_sparse); the
            # full net chains 6 layers of instance norms + attention
            # softmaxes, which amplify bf16 rounding on EITHER route — so
            # gate the sparse route's fp32-truth error against the dense
            # bf16 route's own error, not against zero
            qd, qs = np.percentile(ed, 99.5), np.percentile(es, 99.5)
            assert qs <= max(2 * qd, 2e-2), (stage, k, qs, qd)
            assert es.max() <= max(2 * ed.max(), 5e-2), (stage, k, es.max(), ed.max())


def test_s2d_matches_plain():
    rng = np.random.default_rng(0)
    params = init_feature_net(jax.random.PRNGKey(0))
    N, H, W = 3, 64, 96
    x = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32))
    epi = jnp.asarray(rng.uniform(-2000, 4000, (N, 2)).astype(np.float32))

    want = feature_net(params, x, epi, temperature=0.5)
    got = feature_net_s2d(params, x, epi, temperature=0.5)

    for stage in ["stage1", "stage2", "stage3"]:
        for k in range(3):
            w = np.asarray(want[stage][k])
            g = np.asarray(got[stage][k])
            assert g.shape == w.shape, (stage, k, g.shape, w.shape)
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4, err_msg=f"{stage}[{k}]")
