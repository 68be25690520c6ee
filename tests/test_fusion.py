"""Fusion-op parity vs the reference's torch implementation (fusion.py)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cds_mvsnet_tpu.fusion.ops import (
    average_fusion,
    prob_filter,
    reproject,
    unproject_to_world,
    visibility_filter,
)
from tests.test_geometry import make_cams


@pytest.fixture(scope="module")
def ref_fusion(reference_modules):
    # reference get_pixel_grids hardcodes .cuda() (SURVEY §2.5) — neutralize
    # so it runs on CPU.
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import importlib

    fusion = importlib.import_module("fusion")
    yield fusion
    torch.Tensor.cuda = orig
    sys.path.remove("/root/reference")


def make_depth_scene(rng, B=1, V=3, H=24, W=32):
    ref_cam = make_cams(rng, B)
    src_cams = np.stack([make_cams(rng, B) for _ in range(V)], axis=1)
    # pad intrinsic [3,3] = 1 like the eval pipeline does
    ref_cam[:, 1, 3, 3] = 1.0
    src_cams[:, :, 1, 3, 3] = 1.0
    ref_depth = rng.uniform(8, 14, (B, H, W)).astype(np.float32)
    src_depths = rng.uniform(8, 14, (B, V, H, W)).astype(np.float32)
    return ref_depth, src_depths, ref_cam, src_cams


def test_unproject_matches_reference(ref_fusion):
    rng = np.random.default_rng(0)
    ref_depth, _, ref_cam, _ = make_depth_scene(rng)
    idx_img = ref_fusion.get_pixel_grids(*ref_depth.shape[-2:]).unsqueeze(0)
    idx_cam = ref_fusion.idx_img2cam(idx_img, torch.from_numpy(ref_depth).unsqueeze(1),
                                     torch.from_numpy(ref_cam))
    want = ref_fusion.idx_cam2world(idx_cam, torch.from_numpy(ref_cam))[..., :3, 0].numpy()
    got = np.asarray(unproject_to_world(jnp.asarray(ref_depth), jnp.asarray(ref_cam)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_reproject_and_filters_match_reference(ref_fusion):
    rng = np.random.default_rng(1)
    ref_depth, src_depths, ref_cam, src_cams = make_depth_scene(rng)

    t_rd = torch.from_numpy(ref_depth).unsqueeze(1)  # n1hw
    t_sd = torch.from_numpy(src_depths).unsqueeze(2)  # nv1hw
    t_rc = torch.from_numpy(ref_cam)
    t_sc = torch.from_numpy(src_cams)

    want_xyd, want_inr = ref_fusion.get_reproj(t_rd, t_sd, t_rc, t_sc)
    got_xyd, got_inr = reproject(
        jnp.asarray(ref_depth), jnp.asarray(src_depths), jnp.asarray(ref_cam),
        jnp.asarray(src_cams),
    )
    np.testing.assert_allclose(
        np.asarray(got_inr), want_inr[:, :, 0].numpy(), atol=1e-5
    )
    got_t = np.asarray(got_xyd).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(got_t, want_xyd.numpy(), rtol=1e-3, atol=5e-2)

    want_masks, want_mask = ref_fusion.vis_filter(t_rd, want_xyd, want_inr, 1.0, 0.01, 2)
    got_masks, got_mask = visibility_filter(
        jnp.asarray(ref_depth), got_xyd, got_inr, 1.0, 0.01, 2
    )
    agree = (np.asarray(got_mask) == want_mask[:, 0].numpy()).mean()
    assert agree > 0.99, agree

    want_ave = ref_fusion.ave_fusion(t_rd, want_xyd, want_masks).numpy()
    got_ave = np.asarray(average_fusion(jnp.asarray(ref_depth), got_xyd, got_masks))
    match = np.isclose(got_ave, want_ave[:, 0], rtol=1e-3, atol=1e-2).mean()
    assert match > 0.99, match


def test_prob_filter_matches_reference(ref_fusion):
    rng = np.random.default_rng(2)
    conf = rng.uniform(0, 1, (1, 8, 9, 3)).astype(np.float32)
    want = ref_fusion.prob_filter(
        torch.from_numpy(conf.transpose(0, 3, 1, 2)), [0.3, 0.5, 0.2]
    ).numpy()
    got = np.asarray(prob_filter(jnp.asarray(conf), (0.3, 0.5, 0.2)))
    np.testing.assert_array_equal(got, want[:, 0])
