"""Native (C++) fusion library tests on synthetic geometry."""

import numpy as np
import pytest

from cds_mvsnet_tpu.fusion.native import build_native_fusion, fuse_depth_maps_native


@pytest.fixture(scope="module", autouse=True)
def built():
    build_native_fusion()


def make_plane_scene(V=4, H=32, W=40, depth=10.0, f=60.0, noise=0.0, seed=0):
    """V cameras translated along x, all seeing a fronto-parallel plane."""
    rng = np.random.default_rng(seed)
    cams = np.zeros((V, 2, 4, 4), dtype=np.float32)
    depths = np.zeros((V, H, W), dtype=np.float32)
    for v in range(V):
        cams[v, 0] = np.eye(4)
        cams[v, 0, 0, 3] = -0.3 * v  # camera center at x = +0.3v
        cams[v, 1, :3, :3] = [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]]
        cams[v, 1, 3, 3] = 1
        depths[v] = depth + noise * rng.standard_normal((H, W))
    colors = np.full((V, H, W, 3), 128, dtype=np.uint8)
    return depths, cams, colors


def test_consistent_plane_fuses():
    depths, cams, colors = make_plane_scene()
    pts, cols = fuse_depth_maps_native(depths, cams, colors, disp_thresh=1.0, num_consistent=2)
    assert len(pts) > 0
    # all fused points lie on the z=10 plane
    np.testing.assert_allclose(pts[:, 2], 10.0, atol=0.05)
    assert (cols == 128).all()
    # duplicate suppression: far fewer points than V x H x W
    assert len(pts) < 1.5 * 32 * 40


def test_inconsistent_views_rejected():
    depths, cams, colors = make_plane_scene()
    # make all but the reference view disagree wildly
    depths[1:] = 30.0
    pts, _ = fuse_depth_maps_native(depths, cams, colors, disp_thresh=0.1, num_consistent=2)
    # view 0 finds no consensus; views 1..3 agree among themselves at z=30
    assert (np.abs(pts[:, 2] - 10.0) > 1).all()


def test_zero_depth_ignored():
    depths, cams, colors = make_plane_scene()
    depths[:, :16] = 0.0  # top half filtered out
    pts, _ = fuse_depth_maps_native(depths, cams, colors, disp_thresh=1.0, num_consistent=2)
    assert len(pts) > 0
    # all fused points project into the bottom half of the reference view
    ys = pts[:, 1] / pts[:, 2] * 60.0 + 16  # fy * y/z + cy
    assert (ys > 15.0).all()


def test_num_consistent_threshold():
    depths, cams, colors = make_plane_scene(V=3)
    pts2, _ = fuse_depth_maps_native(depths, cams, colors, disp_thresh=1.0, num_consistent=2)
    pts3, _ = fuse_depth_maps_native(depths, cams, colors, disp_thresh=1.0, num_consistent=3)
    assert len(pts3) <= len(pts2)
