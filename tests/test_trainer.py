"""End-to-end Trainer smoke test with in-memory synthetic loaders."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cds_mvsnet_tpu.config import Config, ModelConfig, TrainConfig
from cds_mvsnet_tpu.models.cds_mvsnet import init_cds_mvsnet
from cds_mvsnet_tpu.models.convert import flatten_params, load_params, save_params
from cds_mvsnet_tpu.training.trainer import Trainer
from cds_mvsnet_tpu.utils.synthetic import synthetic_batch


class FakeLoader:
    """Yields the same tiny synthetic batch a few times."""

    def __init__(self, n=2, seed=0):
        self.batches = [
            jax.tree.map(jnp.asarray, synthetic_batch(
                B=1, V=3, H=64, W=64, D=48, refine=True, with_gt=True, seed=seed + i
            ))
            for i in range(n)
        ]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter([dict(b) for b in self.batches])


def test_trainer_epoch_and_checkpoint(tmp_path):
    cfg = Config(
        model=ModelConfig(refine=True),
        train=TrainConfig(epochs=1, eval_freq=1, logging_every=10, save_period=1),
    )
    params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg.model)
    trainer = Trainer(cfg, params, [FakeLoader(2)], [FakeLoader(1, seed=9)],
                      save_dir=tmp_path / "run", log=lambda *a: None)
    trainer.train()

    assert (tmp_path / "run" / "checkpoint-epoch1.npz").exists()
    assert (tmp_path / "run" / "model_best.npz").exists()
    assert (tmp_path / "run" / "config.json").exists()

    # resume restores weights and advances the start epoch
    trainer2 = Trainer(cfg, params, [FakeLoader(1)], save_dir=tmp_path / "run2",
                       log=lambda *a: None)
    trainer2.resume(tmp_path / "run" / "checkpoint-epoch1.npz")
    assert trainer2.start_epoch == 2
    a = flatten_params(trainer.state.params)
    b = flatten_params(trainer2.state.params)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), atol=1e-6)


def test_params_npz_roundtrip(tmp_path):
    params = init_cds_mvsnet(jax.random.PRNGKey(1), ModelConfig(refine=False))
    save_params(tmp_path / "p.npz", params)
    back = load_params(tmp_path / "p.npz")
    a, b = flatten_params(params), flatten_params(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
