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
