"""Gradient parity vs the PyTorch reference (VERDICT r2 weak #6).

Loss VALUES are cross-checked in test_train_step.py; this file checks that
d(final_loss)/d(params) matches torch autograd on the released checkpoint —
the stop_gradient placements (grad_method="detach" between stages,
model.py:176-180; the GT-warp feat_target branch; warp grids, warping.py:79;
entropy/vis chain) are exactly the kind of thing loss-value tests cannot see.

Both sides run fp32 on CPU with the SAME converted weights and the SAME
synthetic batch; torch grads are mapped into the JAX layout by reusing
convert_state_dict (the transpose rules are linear, so they commute with
differentiation).
"""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet
from cds_mvsnet_tpu.models.convert import (
    convert_checkpoint,
    convert_state_dict,
    flatten_params,
)
from cds_mvsnet_tpu.training.loss import final_loss
from cds_mvsnet_tpu.utils.synthetic import synthetic_batch

CKPT = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"
DLOSSW = (0.5, 1.0, 2.0)
# H, W multiples of 64: with refine the cascade halves the working res and
# the (reference) CostRegNet needs stage-1 dims divisible by 8 — 64x80
# crashes the torch UNet's skip-add (module.py:310) just like ours.
SMALL = dict(B=1, V=3, H=64, W=64, D=48, refine=True, with_gt=True, seed=7)

# One representative leaf per subsystem the VERDICT called out: feature conv,
# dynamic-conv attention, vis head, cost-reg conv + deconv, refinement.
SAMPLED_KEYS = [
    "feature.conv00.conv.convs.0.weight",
    "feature.conv00.conv.att_weights.0.weight",
    "feature.out3.convs.0.weight",
    "stage_net.vis.0.0.conv.weight",
    "cost_regularization.0.conv0.conv.weight",
    "cost_regularization.2.conv7.conv.weight",
    "refine_network.conv0.conv.weight",
]


@pytest.fixture(scope="module")
def torch_train_model(reference_modules):
    model_mod = reference_modules["models.model"]
    model = model_mod.CDSMVSNet(
        refine=True, ndepths=(48, 32, 8), depth_interals_ratio=(4, 2, 1),
        share_cr=False, cr_base_chs=(8, 8, 8), grad_method="detach",
    )
    ckpt = torch.load(
        CKPT, map_location="cpu", weights_only=False,
        pickle_module=__import__(
            "cds_mvsnet_tpu.models.convert", fromlist=["_PickleShim"]
        )._PickleShim,
    )
    state = {k.replace("module.", "", 1): v for k, v in ckpt["state_dict"].items()}
    missing, unexpected = model.load_state_dict(state, strict=True)
    assert not missing and not unexpected
    model.train()
    return model


def _rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def test_gradient_parity_vs_torch(torch_train_model, reference_modules):
    losses_mod = importlib.import_module("models.losses")
    batch = synthetic_batch(**SMALL)
    imgs = batch["imgs"]  # (B, V, H, W, 3) fp32
    proj = batch["proj_matrices"]
    dv = batch["depth_values"]
    gt = batch["depth"]
    mask = batch["mask"]
    di = dv[:, 1] - dv[:, 0]

    # ---- torch side -------------------------------------------------------
    model = torch_train_model
    model.zero_grad(set_to_none=True)
    t_imgs = torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 1, 4, 2, 3)))
    # np.ascontiguousarray throughout: the synthetic pyramids are strided
    # views and torch.from_numpy preserves strides — the reference's
    # homo_warping_3D .view() on gt_depth requires contiguity (warping.py:91)
    t_proj = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in proj.items()}
    t_gt = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in gt.items()}
    t_mask = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in mask.items()}
    outputs = model(
        t_imgs, t_proj, torch.from_numpy(np.ascontiguousarray(dv)),
        gt_depths=t_gt, temperature=1.0,
    )
    t_loss, _ = losses_mod.final_loss(
        outputs, t_gt, t_mask, dlossw=list(DLOSSW), depth_interval=torch.from_numpy(di)
    )
    t_loss.backward()
    torch_grads = convert_state_dict(
        {
            name: p.grad.detach().numpy()
            for name, p in model.named_parameters()
            if p.grad is not None
        }
    )
    t_flat = flatten_params(torch_grads)

    # ---- jax side ---------------------------------------------------------
    params = convert_checkpoint(CKPT)
    cfg = ModelConfig(refine=True)
    j_inputs = jax.tree.map(jnp.asarray, {"imgs": imgs, "proj": proj, "dv": dv, "gt": gt})
    j_mask = jax.tree.map(jnp.asarray, mask)

    def loss_fn(p):
        out, _ = apply_cds_mvsnet(
            p, cfg, j_inputs["imgs"], j_inputs["proj"], j_inputs["dv"],
            temperature=1.0, train=True, gt_depths=j_inputs["gt"],
        )
        loss, _ = final_loss(out, j_inputs["gt"], j_mask, DLOSSW, jnp.asarray(di))
        return loss

    j_loss, j_grads = jax.value_and_grad(loss_fn)(params)
    j_flat = flatten_params(j_grads)

    # the losses themselves must agree first (train-mode BN batch stats)
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-3)

    report = {}
    for key in SAMPLED_KEYS:
        want = np.asarray(t_flat[key])
        got = np.asarray(j_flat[key])
        assert got.shape == want.shape, key
        scale = float(np.abs(want).max())
        assert scale > 0, f"{key}: torch grad is all-zero (fixture too easy?)"
        report[key] = _rel_l2(got, want)
    worst = max(report, key=report.get)
    assert report[worst] < 2e-2, report

    # stop_gradient placement checks: BN running buffers must have ZERO grad
    # in train mode (batch stats are used), and feat_target must not leak
    # gradient (it is built from detached depth samples in the reference).
    for key, g in j_flat.items():
        if key.endswith(("running_mean", "running_var")):
            assert float(np.abs(np.asarray(g)).max()) == 0.0, key
