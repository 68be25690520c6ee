import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cds_mvsnet_tpu.ops.resize import resize_linear, resize_nearest, upsample2x_nearest


@pytest.mark.parametrize("out_hw", [(8, 10), (32, 40), (7, 13), (64, 80)])
@pytest.mark.parametrize("in_hw", [(16, 20), (5, 9)])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), out_hw, mode="nearest").numpy()
    got = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), out_hw)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=0, atol=0)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("out_hw", [(8, 10), (32, 40), (7, 13), (64, 80)])
def test_bilinear_matches_torch(out_hw, align):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 16, 20)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear", align_corners=align).numpy()
    got = resize_linear(jnp.asarray(x), out_hw, axes=(2, 3), align_corners=align)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_trilinear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 12, 16, 20)).astype(np.float32)
    out = (8, 8, 10)
    want = F.interpolate(torch.from_numpy(x), out, mode="trilinear", align_corners=False).numpy()
    got = resize_linear(jnp.asarray(x), out, axes=(2, 3, 4), align_corners=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_upsample2x_nearest_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 6, 5)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    got = upsample2x_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=0)
