"""Jitted training step: forward + loss + SGD update + BN-stat merge.

Replaces the reference's Trainer hot loop body (trainer/trainer.py:61-93)
with one compiled XLA program. Data parallelism comes from jit + sharding
annotations on the batch (see parallel/mesh.py); the gradient all-reduce is
inserted by XLA over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..models.cds_mvsnet import apply_cds_mvsnet
from ..models.convert import flatten_params, unflatten_params
from .loss import final_loss

__all__ = ["TrainState", "make_optimizer", "make_train_step", "init_train_state",
           "trainable_mask", "temperature_schedule", "merge_stat_updates"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32


def trainable_mask(params) -> Any:
    """True for trainable leaves; False for BatchNorm running stats."""
    flat = flatten_params(params)
    return unflatten_params(
        {k: not (k.endswith("running_mean") or k.endswith("running_var")) for k in flat}
    )


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    """SGD + weight decay + StepLR(step, gamma) (reference: configs/
    config_dtu.json optimizer/lr_scheduler blocks), masked off BN stats."""

    def lr_schedule(epoch):
        return cfg.lr * cfg.lr_gamma ** (epoch // cfg.lr_step)

    mask = trainable_mask(params)
    # Produces raw (grad + wd·p [, momentum-traced]) updates; the train step
    # applies the -lr scaling so the epoch-indexed schedule stays outside the
    # optimizer state (matches torch SGD + StepLR exactly).
    chain = [optax.add_decayed_weights(cfg.weight_decay)]
    if cfg.momentum > 0:
        chain.append(optax.trace(decay=cfg.momentum))
    return optax.masked(optax.chain(*chain), mask), lr_schedule


def temperature_schedule(epoch: int) -> float:
    """Reference trainer/trainer.py:45-49: 10^(-(epoch-1)/2) for epochs 1-4,
    then 0.01 (epoch is 1-based)."""
    if epoch <= 4:
        return float(10.0 ** (-(epoch - 1) / 2.0))
    return 0.01


def merge_stat_updates(params, updates: dict[str, jnp.ndarray]):
    if not updates:
        return params
    flat = flatten_params(params)
    flat.update(updates)
    return unflatten_params(flat)


def init_train_state(params, cfg: TrainConfig) -> tuple[TrainState, Any]:
    (tx, lr_schedule) = make_optimizer(cfg, params)
    return TrainState(params, tx.init(params), jnp.int32(1)), (tx, lr_schedule)


def make_train_step(model_cfg: ModelConfig, train_cfg: TrainConfig, tx, lr_schedule, donate=True):
    """Returns jitted ``step(state, batch, temperature) -> (state, metrics)``.

    ``batch`` pytree (all device arrays):
      imgs (B,V,H,W,3), proj_matrices {stage: (B,V,2,4,4)},
      depth_values (B,D), depth {stage: (B,h,w)}, mask {stage: (B,h,w)}.
    """
    dlossw = train_cfg.dlossw
    compute_dtype = (
        jnp.bfloat16 if getattr(train_cfg, "compute_dtype", "fp32") == "bf16"
        else jnp.float32
    )

    def step(state: TrainState, batch, temperature):
        depth_values = batch["depth_values"]
        depth_interval = depth_values[:, 1] - depth_values[:, 0]

        def loss_fn(params):
            outputs, stat_updates = apply_cds_mvsnet(
                params, model_cfg,
                batch["imgs"], batch["proj_matrices"], depth_values,
                temperature=temperature, train=True, gt_depths=batch["depth"],
                compute_dtype=compute_dtype,
                remat_features=getattr(train_cfg, "remat_features", False),
            )
            loss, depth_loss = final_loss(
                outputs, batch["depth"], batch["mask"], dlossw, depth_interval
            )
            return loss, (depth_loss, stat_updates)

        (loss, (depth_loss, stat_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        lr = lr_schedule(state.epoch - 1)  # 0-based epochs completed
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        params = merge_stat_updates(params, stat_updates)
        new_state = TrainState(params, opt_state, state.epoch)
        metrics = {"loss": loss, "depth_loss": depth_loss}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
