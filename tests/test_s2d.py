"""Space-to-depth conv exactness tests vs plain convs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.models.layers import conv2d, instance_norm
from cds_mvsnet_tpu.ops.resize import upsample2x_nearest
from cds_mvsnet_tpu.ops.s2d import (
    depth_to_space,
    s2d_conv,
    s2d_instance_norm,
    s2d_upsample2x_nearest,
    space_to_depth,
)


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x, 4), 4)), np.asarray(x))


@pytest.mark.parametrize("k,b,stride", [
    (3, 2, 1), (3, 4, 1), (3, 8, 1), (5, 4, 1), (7, 8, 1), (11, 8, 1), (1, 2, 1),
    (3, 8, 2), (3, 4, 2), (5, 8, 2),
])
def test_s2d_conv_matches_plain(k, b, stride):
    rng = np.random.default_rng(k * 100 + b + stride)
    N, H, W, I, O = 2, 32, 40, 3, 7
    x = jnp.asarray(rng.standard_normal((N, H, W, I)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, I, O)).astype(np.float32))

    want = conv2d(x, {"weight": w}, stride=stride, padding=(k - 1) // 2)
    got_s2d = s2d_conv(space_to_depth(x, b), w, b_in=b, stride=stride)
    got = depth_to_space(got_s2d, b // stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_s2d_upsample_matches_plain():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 6)).astype(np.float32))
    want = upsample2x_nearest(x)  # (2, 16, 24, 6)
    got = depth_to_space(s2d_upsample2x_nearest(space_to_depth(x, 2), 2, 6), 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_s2d_instance_norm_matches_plain():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 5)).astype(np.float32))
    want = instance_norm(x)
    got = depth_to_space(s2d_instance_norm(space_to_depth(x, 4), 4, 5), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
