"""Pallas warp kernel vs the XLA packed sampler (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cds_mvsnet_tpu.ops.grid_sample import grid_sample_pixel_packed
from cds_mvsnet_tpu.ops.pallas.warp import warp_pallas


def reference(src, px, py):
    D, H, W = px.shape
    out = grid_sample_pixel_packed(
        src[None], px.reshape(1, -1), py.reshape(1, -1)
    )  # (1, DHW, C)
    return np.transpose(np.asarray(out).reshape(D, H, W, -1), (3, 0, 1, 2))


@pytest.mark.parametrize("seed", [0, 1])
def test_warp_pallas_matches_packed_sampler(seed):
    rng = np.random.default_rng(seed)
    H, W, C, D = 16, 128, 8, 3
    src = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # smooth-ish in-range coords + some out-of-range / extreme values
    px = rng.uniform(-5, W + 5, (D, H, W)).astype(np.float32)
    py = rng.uniform(-5, H + 5, (D, H, W)).astype(np.float32)
    px[0] = np.clip(px[0], 0, W - 1.01)
    py[0] = np.clip(py[0], 0, H - 1.01)

    got = np.asarray(
        warp_pallas(src, jnp.asarray(px), jnp.asarray(py), interpret=True)
    )
    want = reference(src, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_pallas_wide_image():
    rng = np.random.default_rng(2)
    H, W, C, D = 8, 256, 4, 2
    src = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    # force cross-window gathers: coordinates jump across the 128-lane seam
    px = rng.uniform(0, W - 1.01, (D, H, W)).astype(np.float32)
    py = rng.uniform(0, H - 1.01, (D, H, W)).astype(np.float32)
    got = np.asarray(warp_pallas(src, jnp.asarray(px), jnp.asarray(py), interpret=True))
    want = reference(src, px, py)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
