"""Training-step tests: loss parity, gradient flow, and multi-device
data-parallel execution on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cds_mvsnet_tpu.config import ModelConfig, TrainConfig
from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet
from cds_mvsnet_tpu.models.convert import flatten_params
from cds_mvsnet_tpu.parallel.mesh import data_mesh, replicate, shard_batch
from cds_mvsnet_tpu.training.loss import final_loss, smooth_l1
from cds_mvsnet_tpu.training.train_step import (
    init_train_state,
    make_train_step,
    temperature_schedule,
)
from cds_mvsnet_tpu.utils.synthetic import synthetic_batch

MODEL_CFG = ModelConfig(refine=True)
SMALL = dict(B=2, V=3, H=64, W=64, D=48, refine=True, with_gt=True)


def to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


def test_smooth_l1_matches_torch():
    x = np.linspace(-3, 3, 41, dtype=np.float32)
    want = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(x), torch.zeros(41), reduction="none"
    ).numpy()
    np.testing.assert_allclose(np.asarray(smooth_l1(jnp.asarray(x))), want, atol=1e-6)


def test_loss_matches_reference_formula():
    """Cross-check final_loss against a direct torch transcription on real
    model outputs."""
    batch = to_device(synthetic_batch(**SMALL, seed=3))
    params = init_cds_mvsnet(jax.random.PRNGKey(0), MODEL_CFG)
    dv = batch["depth_values"]
    outputs, _ = apply_cds_mvsnet(
        params, MODEL_CFG, batch["imgs"], batch["proj_matrices"], dv,
        temperature=1.0, train=True, gt_depths=batch["depth"],
    )
    di = dv[:, 1] - dv[:, 0]
    loss, depth_loss = final_loss(outputs, batch["depth"], batch["mask"], (0.5, 1.0, 2.0), di)

    # torch transcription of reference models/losses.py
    t = lambda x: torch.from_numpy(np.asarray(x))
    total = torch.tensor(0.0)
    di_t = t(di)[:, None, None]
    for i, sk in enumerate(["stage1", "stage2", "stage3"]):
        mask = t(batch["mask"][sk]) > 0.5
        d_est = t(outputs[sk]["depth"]) / di_t
        d_gt = t(batch["depth"][sk]) / di_t
        dl = torch.nn.functional.smooth_l1_loss(d_est[mask], d_gt[mask])
        ncr = t(outputs[sk]["norm_curv"])[mask].mean()
        fd = t(outputs[sk]["feat_distance"])
        tg = t(outputs[sk]["feat_target"])
        m = mask.unsqueeze(1).expand_as(tg)
        pos = tg[m].sum()
        neg = tg[m].numel() - pos
        fl = torch.nn.functional.binary_cross_entropy_with_logits(
            fd[m], tg[m], pos_weight=neg / pos
        )
        total = total + [0.5, 1.0, 2.0][i] * (dl + 5 * fl + 0.1 * ncr)
    mask4 = t(batch["mask"]["stage4"]) > 0.5
    d_est = t(outputs["refined_depth"]) / di_t
    d_gt = t(batch["depth"]["stage4"]) / di_t
    dl4 = torch.nn.functional.smooth_l1_loss(d_est[mask4], d_gt[mask4])
    total = total + 2 * dl4

    np.testing.assert_allclose(float(loss), float(total), rtol=1e-4)
    np.testing.assert_allclose(float(depth_loss), float(dl4), rtol=1e-4)


def test_train_step_updates_params_and_stats():
    cfg = TrainConfig()
    params = init_cds_mvsnet(jax.random.PRNGKey(0), MODEL_CFG)
    state, (tx, sched) = init_train_state(params, cfg)
    step = make_train_step(MODEL_CFG, cfg, tx, sched, donate=False)
    batch = to_device(synthetic_batch(**SMALL, seed=1))

    new_state, metrics = step(state, batch, jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))

    before = flatten_params(params)
    after = flatten_params(new_state.params)
    changed_w = sum(
        not np.allclose(before[k], after[k])
        for k in before
        if k.endswith("weight") and "running" not in k
    )
    assert changed_w > 100  # nearly all weights moved
    # BN running stats must have been updated, not gradient-descended
    rm = [k for k in before if k.endswith("running_mean")]
    assert rm and any(not np.allclose(before[k], after[k]) for k in rm)


def test_train_step_multichip_dataparallel():
    n = len(jax.devices())
    assert n == 8
    mesh = data_mesh(n)
    cfg = TrainConfig()
    params = init_cds_mvsnet(jax.random.PRNGKey(0), MODEL_CFG)
    state, (tx, sched) = init_train_state(params, cfg)
    step = make_train_step(MODEL_CFG, cfg, tx, sched, donate=False)

    batch = to_device(synthetic_batch(B=8, V=3, H=64, W=64, D=48, refine=True, with_gt=True))
    sharded = shard_batch(mesh, batch)
    state_rep = replicate(mesh, state)

    new_state, metrics = step(state_rep, sharded, jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))

    # Single-device run on the same batch must agree (global batch stats under
    # jit make the math identical regardless of sharding).
    new_state1, metrics1 = step(state, batch, jnp.float32(1.0))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-4)


def test_temperature_schedule():
    assert temperature_schedule(1) == 1.0
    assert abs(temperature_schedule(2) - 10 ** -0.5) < 1e-9
    assert temperature_schedule(5) == 0.01
    assert temperature_schedule(30) == 0.01


def test_train_step_bf16_loss_parity():
    """TrainConfig(compute_dtype="bf16") runs the conv/volume path in bf16
    with fp32 master params; the loss stays within bf16 tolerance of the
    fp32 step and params still update (VERDICT r1 #8 guard)."""
    params = init_cds_mvsnet(jax.random.PRNGKey(0), MODEL_CFG)
    batch = to_device(synthetic_batch(**SMALL, seed=2))

    losses = {}
    states = {}
    for mode in ("fp32", "bf16"):
        cfg = TrainConfig(compute_dtype=mode)
        state, (tx, sched) = init_train_state(params, cfg)
        step = make_train_step(MODEL_CFG, cfg, tx, sched, donate=False)
        new_state, metrics = step(state, batch, jnp.float32(1.0))
        losses[mode] = float(metrics["loss"])
        states[mode] = new_state

    assert np.isfinite(losses["bf16"])
    np.testing.assert_allclose(losses["bf16"], losses["fp32"], rtol=0.05)
    # params remain fp32 master copies and actually moved
    after = flatten_params(states["bf16"].params)
    assert all(v.dtype == np.float32 for v in after.values())
    before = flatten_params(params)
    moved = [k for k in before if not np.allclose(before[k], after[k])]
    assert len(moved) > 100
