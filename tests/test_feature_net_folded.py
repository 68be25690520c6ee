"""Folded FeatureNet must equal the plain one at eval, bit-near."""

import jax
import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.models.feature_net import feature_net, init_feature_net
from cds_mvsnet_tpu.models.feature_net_folded import feature_net_folded


def test_folded_matches_unfolded():
    rng = np.random.default_rng(0)
    params = init_feature_net(jax.random.PRNGKey(0))
    N, H, W = 4, 64, 96
    x = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32))
    epi = jnp.asarray(rng.uniform(-2000, 4000, (N, 2)).astype(np.float32))

    want = feature_net(params, x, epi, temperature=0.5)
    got = feature_net_folded(params, x, epi, temperature=0.5)

    for stage in ["stage1", "stage2", "stage3"]:
        for k in range(3):
            w = np.asarray(want[stage][k])
            g = np.asarray(got[stage][k])
            assert g.shape == w.shape, (stage, k, g.shape, w.shape)
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-4, err_msg=f"{stage}[{k}]")
