"""s2d 3D conv / transposed-conv exactness + full CostRegNet equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.models.layers import conv3d, deconv3d
from cds_mvsnet_tpu.ops.s2d import (
    depth_to_space,
    s2d_conv3d,
    s2d_deconv3d_2x,
    space_to_depth,
)


def _s2d_vol(v, b):  # (B,D,H,W,C) -> (B,D,H/b,W/b,b²C)
    B, D, H, W, C = v.shape
    return space_to_depth(v.reshape(B * D, H, W, C), b).reshape(B, D, H // b, W // b, -1)


def _d2s_vol(v, b):
    B, D, Hp, Wp, BBC = v.shape
    return depth_to_space(v.reshape(B * D, Hp, Wp, BBC), b).reshape(B, D, Hp * b, Wp * b, -1)


@pytest.mark.parametrize("stride,b", [(1, 2), (1, 4), (2, 2), (2, 4)])
def test_s2d_conv3d_matches_plain(stride, b):
    rng = np.random.default_rng(b * 10 + stride)
    B, D, H, W, I, O = 1, 8, 16, 24, 5, 6
    x = jnp.asarray(rng.standard_normal((B, D, H, W, I)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, I, O)).astype(np.float32))
    want = conv3d(x, {"weight": w}, stride=stride, padding=1)
    got = s2d_conv3d(_s2d_vol(x, b), w, b_in=b, stride=stride, padding=1)
    got = _d2s_vol(got, b // stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_cost_reg_net_s2d_matches_plain():
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net, cost_reg_net_s2d, init_cost_reg_net

    rng = np.random.default_rng(9)
    p = init_cost_reg_net(jax.random.PRNGKey(0), in_channels=32, base_channels=8)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 48, 32)).astype(np.float32))
    want = cost_reg_net(p, x, train=False)
    got = cost_reg_net_s2d(p, x, b=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    # channels-first entry (the warp path's W-minor layout): same numbers
    got_cf = cost_reg_net_s2d(p, jnp.moveaxis(x[0], -1, 0), b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got_cf), np.asarray(got), rtol=1e-6, atol=1e-6)


def test_cost_reg_net_s2d_pallas_front(monkeypatch):
    """CDS_COSTREG_FRONT=pallas routes conv0 through the MXU conv3d kernel
    (BN folded into weights); the full UNet output must match the s2d path
    within fp32-fold-vs-bf16-BN-chain tolerance."""
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d, init_cost_reg_net

    rng = np.random.default_rng(9)
    p = init_cost_reg_net(jax.random.PRNGKey(0), in_channels=32, base_channels=8)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 48, 32)).astype(np.float32))
    x_cf = jnp.moveaxis(x[0], -1, 0)
    want = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    monkeypatch.setenv("CDS_COSTREG_FRONT", "pallas_interp")
    got = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=4e-3, atol=4e-3)


@pytest.mark.parametrize("kd,tr,h", [(1, 8, 48), (2, 24, 48), (4, 16, 48), (2, 16, 44), (4, 8, 44)])
def test_conv3d_front_tile_configs(kd, tr, h):
    """The Pallas entry conv matches lax.conv at every tile configuration
    the model's per-stage chooser can pick (kd in {1,2,4}, tr in
    {8,16,24,32}), including non-128-multiple widths and non-tile-multiple
    heights (h=44: the padded-row grid path, ADVICE r3)."""
    from cds_mvsnet_tpu.ops.pallas.conv3d import conv3d_front

    rng = np.random.default_rng(kd * 10 + tr)
    C, O, D, w = 6, 8, 4, 150
    vol = jnp.asarray(rng.standard_normal((C, D, h, w)), jnp.float32).astype(jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 3, C, O)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(O), jnp.float32)
    x = jnp.transpose(vol, (1, 2, 3, 0))[None].astype(jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    want = jax.nn.relu(want + bias)[0]
    want = np.asarray(jnp.transpose(want, (3, 0, 1, 2)))
    got = np.asarray(
        conv3d_front(vol, wgt, bias, kd=kd, tr=tr, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)


def test_cost_reg_net_s2d_pallas2_front(monkeypatch):
    """CDS_COSTREG_FRONT=pallas2 additionally routes conv1 (the stride-2
    downsampler) through the MXU kernel; full-UNet output must still match
    the s2d path."""
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d, init_cost_reg_net

    rng = np.random.default_rng(9)
    p = init_cost_reg_net(jax.random.PRNGKey(0), in_channels=32, base_channels=8)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 48, 32)).astype(np.float32))
    x_cf = jnp.moveaxis(x[0], -1, 0)
    want = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    monkeypatch.setenv("CDS_COSTREG_FRONT", "pallas2_interp")
    got = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=4e-3, atol=4e-3)
    # pallas3 additionally routes conv2 (stride-1, half res, off conv1's
    # W-minor output, incl. the padded-row grid for non-tile heights)
    monkeypatch.setenv("CDS_COSTREG_FRONT", "pallas3_interp")
    got3 = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=6e-3, atol=6e-3)


@pytest.mark.parametrize("kd,tr", [(1, 8), (2, 8), (4, 16)])
def test_conv3d_down_tile_configs(kd, tr):
    """The Pallas stride-2 conv matches lax.conv at every tile configuration
    the chooser can pick, including non-tile-multiple output heights and
    non-128-multiple widths."""
    from cds_mvsnet_tpu.ops.pallas.conv3d import conv3d_down

    rng = np.random.default_rng(kd * 10 + tr)
    C, O, D, h, w = 8, 16, 8, 44, 300
    vol = jnp.asarray(rng.standard_normal((C, D, h, w)), jnp.float32).astype(jnp.bfloat16)
    wgt = jnp.asarray(rng.standard_normal((3, 3, 3, C, O)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(O), jnp.float32)
    x = jnp.transpose(vol, (1, 2, 3, 0))[None].astype(jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, wgt, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    want = jax.nn.relu(want + bias)[0]
    want = np.asarray(jnp.transpose(want, (3, 0, 1, 2)))
    got = np.asarray(
        conv3d_down(vol, wgt, bias, kd=kd, tr=tr, interpret=True), np.float32
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)


@pytest.mark.parametrize("b", [1, 2, 4])
def test_s2d_deconv3d_matches_plain(b):
    rng = np.random.default_rng(b)
    B, D, H, W, I, O = 1, 4, 8, 12, 6, 5
    x = jnp.asarray(rng.standard_normal((B, D, H, W, I)).astype(np.float32))
    # converter layout: pre-flipped spatially, (k,k,k,I,O)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, I, O)).astype(np.float32))
    want = deconv3d(x, {"weight": w})  # (B, 2D, 2H, 2W, O)
    got = s2d_deconv3d_2x(_s2d_vol(x, b), w, b_in=b)
    got = _d2s_vol(got, 2 * b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kd,tr,h,w", [(2, 16, 32, 128), (4, 16, 44, 300), (2, 32, 64, 256)])
def test_conv3d_front_fused_tile_configs(kd, tr, h, w):
    """The fused conv0+conv1 kernel matches lax.conv for BOTH outputs at
    every tile configuration the chooser can pick, including the x-tile
    ring carry (w > 128), non-128-multiple widths, and padded row grids
    (h=44). conv1's reference consumes the bf16-rounded conv0 — exactly
    what the XLA route reads back from HBM."""
    from cds_mvsnet_tpu.ops.pallas.conv3d import conv3d_front_fused

    rng = np.random.default_rng(kd * 100 + tr + h)
    C, O0, O1, D = 6, 8, 16, 8
    vol = jnp.asarray(rng.standard_normal((C, D, h, w)), jnp.float32).astype(jnp.bfloat16)
    w0 = jnp.asarray(rng.standard_normal((3, 3, 3, C, O0)) * 0.2, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal(O0), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, O0, O1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(O1), jnp.float32)

    def ref(v, wgt, bias, stride):
        x = jnp.transpose(v, (1, 2, 3, 0))[None].astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, wgt, (stride,) * 3, [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.transpose(jax.nn.relu(y + bias)[0], (3, 0, 1, 2))

    want0 = ref(vol, w0, b0, 1)
    want1 = ref(want0.astype(jnp.bfloat16), w1, b1, 2)
    got0, got1 = conv3d_front_fused(vol, w0, b0, w1, b1, kd=kd, tr=tr, interpret=True)
    assert got0.shape == want0.shape and got1.shape == want1.shape
    np.testing.assert_allclose(np.asarray(got0, np.float32), np.asarray(want0),
                               atol=0.15, rtol=0.05)
    np.testing.assert_allclose(np.asarray(got1, np.float32), np.asarray(want1),
                               atol=0.3, rtol=0.05)


def test_cost_reg_net_s2d_pallasf_front(monkeypatch):
    """CDS_COSTREG_FRONT=pallasf routes conv0 AND conv1 through the fused
    kernel (conv1 off conv0's VMEM tile); full-UNet output must match the
    s2d path. pallasf3 additionally routes conv2 off conv1's W-minor
    output."""
    from cds_mvsnet_tpu.models.cost_reg import cost_reg_net_s2d, init_cost_reg_net

    rng = np.random.default_rng(9)
    p = init_cost_reg_net(jax.random.PRNGKey(0), in_channels=32, base_channels=8)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 48, 32)).astype(np.float32))
    x_cf = jnp.moveaxis(x[0], -1, 0)
    want = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    monkeypatch.setenv("CDS_COSTREG_FRONT", "pallasf_interp")
    got = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=6e-3, atol=6e-3)
    monkeypatch.setenv("CDS_COSTREG_FRONT", "pallasf3_interp")
    got3 = cost_reg_net_s2d(p, x_cf, b=4, cfirst=True)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want), rtol=8e-3, atol=8e-3)
