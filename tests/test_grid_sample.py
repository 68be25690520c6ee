import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cds_mvsnet_tpu.ops.grid_sample import grid_sample_normalized, grid_sample_pixel


def _torch_sample(src_nchw, grid):
    return F.grid_sample(
        torch.from_numpy(src_nchw),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).numpy()


def test_matches_torch_in_range_and_out_of_range():
    rng = np.random.default_rng(0)
    B, C, H, W = 2, 5, 12, 17
    src = rng.standard_normal((B, C, H, W)).astype(np.float32)
    # Grid spanning in-range, boundary, and far out-of-range coordinates.
    grid = rng.uniform(-1.8, 1.8, size=(B, 9, 11, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    want = _torch_sample(src, grid)

    got = grid_sample_normalized(jnp.asarray(src.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-5, atol=1e-5)


def test_pixel_coords_identity():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    y, x = np.meshgrid(np.arange(6, dtype=np.float32), np.arange(7, dtype=np.float32), indexing="ij")
    out = grid_sample_pixel(jnp.asarray(src), jnp.asarray(x[None]), jnp.asarray(y[None]))
    np.testing.assert_allclose(np.asarray(out), src, atol=1e-6)


def test_packed_matches_plain():
    """The single-gather 2x2-packed sampler must agree with the 4-gather one
    everywhere, including boundary and far out-of-range coordinates."""
    from cds_mvsnet_tpu.ops.grid_sample import grid_sample_pixel_packed

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 9, 13, 5
    src = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-3, W + 3, (B, 400)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-3, H + 3, (B, 400)).astype(np.float32))
    # exact integer coordinates on every edge case
    edges = np.array([-1.0, -0.5, 0.0, 1.0, W - 2, W - 1.5, W - 1, float(W)], np.float32)
    x = x.at[:, : len(edges)].set(jnp.asarray(edges))
    y = y.at[:, : len(edges)].set(jnp.asarray([-1.0, 0.0, H - 1, float(H), 0.5, H - 1.5, -0.5, 2.0]))

    want = grid_sample_pixel(src, x, y)
    got = grid_sample_pixel_packed(src, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_gradients_flow():
    import jax

    src = jnp.ones((1, 4, 4, 2))
    x = jnp.full((1, 5), 1.3)
    y = jnp.full((1, 5), 2.2)
    g = jax.grad(lambda s: grid_sample_pixel(s, x, y).sum())(src)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0
