"""Multi-step training: loss decreases on a real multi-view-consistent scene.

VERDICT r2 weak #7: single-step tests can't catch BN-stat-merge, LR-schedule,
or temperature-anneal bugs that only show up across steps/epochs. This runs
the full Trainer (epoch loop, validation, monitor) for a handful of epochs on
the closed-form sphere scene and asserts the train loss actually decreases.
The 50-step curve lives in tools/train_convergence.py (recorded in STATUS.md);
this is its fast regression guard.
"""

import jax
import jax.numpy as jnp

from cds_mvsnet_tpu.config import Config, ModelConfig, TrainConfig
from cds_mvsnet_tpu.models.cds_mvsnet import init_cds_mvsnet
from cds_mvsnet_tpu.training.trainer import Trainer
from cds_mvsnet_tpu.utils.synthetic import sphere_scene, sphere_train_batch


class SphereLoader:
    # With refine the cascade halves the working res and CostRegNet needs
    # stage-1 dims divisible by 8 -> input H, W must be multiples of 64
    # (reference constraint, SURVEY §2.5; 64x80 crashes the UNet skip-adds).
    def __init__(self, n=3, H=64, W=64, D=48):
        scene = sphere_scene(V=5, H=H, W=W)
        self.batches = []
        for r in range(n):
            ref = r % 5
            srcs = [(ref + 1) % 5, (ref + 2) % 5]
            self.batches.append(
                jax.tree.map(
                    jnp.asarray, sphere_train_batch(scene, ref, srcs, D=D, refine=True)
                )
            )

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter([dict(b) for b in self.batches])


def test_loss_decreases_over_epochs(tmp_path):
    epoch_losses = []
    orig = Trainer._train_epoch

    def recording(self, epoch):
        log = orig(self, epoch)
        epoch_losses.append(log["loss"])
        return log

    Trainer._train_epoch = recording
    try:
        cfg = Config(
            model=ModelConfig(refine=True),
            train=TrainConfig(
                epochs=4, lr=0.01, eval_freq=4, save_period=10,
                logging_every=1000, monitor="min val_loss",
            ),
        )
        params = init_cds_mvsnet(jax.random.PRNGKey(0), cfg.model)
        trainer = Trainer(cfg, params, [SphereLoader(3)], [SphereLoader(1)],
                          save_dir=tmp_path, log=lambda *a: None)
        trainer.train()
    finally:
        Trainer._train_epoch = orig

    assert len(epoch_losses) == 4
    # training on the same 3 batches must overfit: final epoch clearly below
    # the first, and the minimum is at the end
    assert epoch_losses[-1] < 0.8 * epoch_losses[0], epoch_losses
    assert min(epoch_losses) == min(epoch_losses[-2:]), epoch_losses
