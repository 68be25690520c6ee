"""remat_features (jax.checkpoint over the FeatureNet) parity: the train
step's loss, gradients, and BN running-stat updates must be identical with
and without rematerialization — remat changes memory, never math.

The BN updates ride the remat boundary as function outputs (a side-effecting
collector inside jax.checkpoint would leak tracers), which is the part this
test pins.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.config import ModelConfig, TrainConfig
from cds_mvsnet_tpu.training.train_step import init_train_state, make_train_step
from cds_mvsnet_tpu.models.cds_mvsnet import init_cds_mvsnet
from cds_mvsnet_tpu.utils.synthetic import synthetic_batch

MODEL_CFG = ModelConfig(refine=True)
SMALL = dict(B=2, V=3, H=64, W=64, D=48, refine=True, with_gt=True)


def _one_step(remat: bool):
    batch = jax.tree.map(jnp.asarray, synthetic_batch(**SMALL, seed=7))
    train_cfg = TrainConfig(remat_features=remat)
    params = init_cds_mvsnet(jax.random.PRNGKey(0), MODEL_CFG)
    state, (tx, sched) = init_train_state(params, train_cfg)
    step = make_train_step(MODEL_CFG, train_cfg, tx, sched, donate=False)
    state2, metrics = step(state, batch, 0.01)
    return state2, metrics


def test_remat_features_is_exact():
    s_base, m_base = _one_step(remat=False)
    s_remat, m_remat = _one_step(remat=True)

    np.testing.assert_array_equal(
        np.asarray(m_base["loss"]), np.asarray(m_remat["loss"])
    )
    flat_b, _ = jax.tree_util.tree_flatten_with_path(s_base.params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(s_remat.params)
    assert len(flat_b) == len(flat_r)
    for (pb, vb), (pr, vr) in zip(flat_b, flat_r):
        assert pb == pr
        np.testing.assert_array_equal(
            np.asarray(vb), np.asarray(vr), err_msg=str(pb)
        )
