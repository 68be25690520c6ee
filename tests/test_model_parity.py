"""Golden-value tests: full-model forward parity against the PyTorch
reference using the released dtu_only checkpoint (SURVEY §4 test strategy)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cds_mvsnet_tpu.config import ModelConfig
from cds_mvsnet_tpu.models.cds_mvsnet import apply_cds_mvsnet, init_cds_mvsnet
from cds_mvsnet_tpu.models.convert import convert_checkpoint, flatten_params

CKPT = "/root/reference/pretrained/dtu_only/checkpoint-epoch24.pth"


def make_scene(rng, B=1, V=3, H=256, W=320, D=192):
    """Synthetic but geometrically valid multi-view inputs (DTU-like scale)."""
    imgs = rng.uniform(0, 1, (B, V, 3, H, W)).astype(np.float32)
    cams = np.zeros((B, V, 2, 4, 4), dtype=np.float32)
    f = 180.0
    for v in range(V):
        angle = 0.12 * (v - 1)
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)
        t = np.array([0.25 * v, 0.05 * v, 0.1 * v], dtype=np.float32)
        cams[:, v, 0] = np.eye(4)
        cams[:, v, 0, :3, :3] = R
        cams[:, v, 0, :3, 3] = t
        cams[:, v, 1, :3, :3] = np.array(
            [[f, 0, W / 8], [0, f, H / 8], [0, 0, 1]], dtype=np.float32
        )
        cams[:, v, 1, 3, 3] = 1.0
    # stage pyramid: stage1 cams are 1/4-res relative to stage3 (train-style
    # layout without refine: stage1 = base, x2, x4)
    proj = {}
    for i, scale in enumerate([1.0, 2.0, 4.0]):
        m = cams.copy()
        m[:, :, 1, :2, :] *= scale
        proj[f"stage{i+1}"] = m
    depth_values = np.linspace(425.0, 905.0, D, dtype=np.float32)[None].repeat(B, 0)
    return imgs, proj, depth_values


@pytest.fixture(scope="module")
def torch_model(reference_modules):
    model_mod = reference_modules["models.model"]
    model = model_mod.CDSMVSNet(
        refine=False, ndepths=(48, 32, 8), depth_interals_ratio=(4, 2, 1), share_cr=False,
        cr_base_chs=(8, 8, 8), grad_method="detach",
    )
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False,
                      pickle_module=__import__("cds_mvsnet_tpu.models.convert", fromlist=["_PickleShim"])._PickleShim)
    state = {k.replace("module.", "", 1): v for k, v in ckpt["state_dict"].items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    # refine_network keys are unexpected when refine=False — that's the only
    # tolerated mismatch.
    assert not missing
    assert all(k.startswith("refine_network") for k in unexpected)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params():
    return convert_checkpoint(CKPT)


def test_converted_tree_matches_init_tree(jax_params):
    cfg = ModelConfig(refine=True)
    init = flatten_params(init_cds_mvsnet(jax.random.PRNGKey(0), cfg))
    conv = flatten_params(jax_params)
    assert set(init) == set(conv), (
        sorted(set(init) - set(conv))[:5], sorted(set(conv) - set(init))[:5])
    for k in init:
        assert init[k].shape == conv[k].shape, (k, init[k].shape, conv[k].shape)
    # SURVEY: 983,843 stored elements including BN buffers, minus the dropped
    # num_batches_tracked scalars (53 BN layers)
    total = sum(v.size for v in conv.values())
    assert total == 983_843 - 53


def test_full_forward_parity_eval(torch_model, jax_params):
    rng = np.random.default_rng(0)
    imgs, proj, depth_values = make_scene(rng)

    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(imgs),
            {k: torch.from_numpy(v) for k, v in proj.items()},
            torch.from_numpy(depth_values),
            temperature=0.01,
        )

    cfg = ModelConfig(refine=False)
    got, updates = apply_cds_mvsnet(
        jax_params, cfg,
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
        {k: jnp.asarray(v) for k, v in proj.items()},
        jnp.asarray(depth_values),
        temperature=0.01,
        train=False,
    )
    assert updates == {}

    interval = float(depth_values[0, 1] - depth_values[0, 0])
    for stage in ["stage1", "stage2", "stage3"]:
        wd = want[stage]["depth"].numpy()
        gd = np.asarray(got[stage]["depth"])
        # depth in units of the depth interval: demand sub-0.1-interval match
        err = np.abs(wd - gd) / interval
        assert np.median(err) < 0.02, (stage, np.median(err))
        assert np.quantile(err, 0.99) < 0.5, (stage, np.quantile(err, 0.99))

        wc = want[stage]["photometric_confidence"].numpy()
        gc = np.asarray(got[stage]["photometric_confidence"])
        assert np.median(np.abs(wc - gc)) < 5e-3

    wr = want["refined_depth"].numpy()
    gr = np.asarray(got["refined_depth"])
    assert np.median(np.abs(wr - gr) / interval) < 0.02


@pytest.fixture(scope="module")
def torch_model_refine(reference_modules):
    model_mod = reference_modules["models.model"]
    model = model_mod.CDSMVSNet(
        refine=True, ndepths=(48, 32, 8), depth_interals_ratio=(4, 2, 1), share_cr=False,
        cr_base_chs=(8, 8, 8), grad_method="detach",
    )
    ckpt = torch.load(CKPT, map_location="cpu", weights_only=False,
                      pickle_module=__import__("cds_mvsnet_tpu.models.convert", fromlist=["_PickleShim"])._PickleShim)
    state = {k.replace("module.", "", 1): v for k, v in ckpt["state_dict"].items()}
    missing, unexpected = model.load_state_dict(state, strict=True)
    assert not missing and not unexpected
    model.eval()
    return model


def test_full_forward_parity_refine(torch_model_refine, jax_params):
    """Golden parity WITH the refinement head (the published DTU protocol runs
    refine=True — reference scripts/dtu_eval.sh:6), covering the Refinement
    forward (module.py:318-370) and the transposed-conv weight conversion."""
    rng = np.random.default_rng(1)
    imgs, proj, depth_values = make_scene(rng)
    # refine=True halves the working res internally; stage cams in eval data
    # are laid out for the half-res pyramid, which make_scene already mimics.

    with torch.no_grad():
        want = torch_model_refine(
            torch.from_numpy(imgs),
            {k: torch.from_numpy(v) for k, v in proj.items()},
            torch.from_numpy(depth_values),
            temperature=0.01,
        )

    cfg = ModelConfig(refine=True)
    got, updates = apply_cds_mvsnet(
        jax_params, cfg,
        jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)),
        {k: jnp.asarray(v) for k, v in proj.items()},
        jnp.asarray(depth_values),
        temperature=0.01,
        train=False,
    )
    assert updates == {}

    interval = float(depth_values[0, 1] - depth_values[0, 0])
    for stage in ["stage1", "stage2", "stage3"]:
        wd = want[stage]["depth"].numpy()
        gd = np.asarray(got[stage]["depth"])
        err = np.abs(wd - gd) / interval
        assert np.median(err) < 0.02, (stage, np.median(err))

    wr = want["refined_depth"].numpy()
    gr = np.asarray(got["refined_depth"])
    assert gr.shape == wr.shape  # full input resolution
    err = np.abs(wr - gr) / interval
    assert np.median(err) < 0.02, np.median(err)
    assert np.quantile(err, 0.99) < 0.5, np.quantile(err, 0.99)
