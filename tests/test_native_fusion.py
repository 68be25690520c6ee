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


# ---------------------------------------------------------------------------
# Constructed-truth tests (VERDICT r4 #6): scenes small enough that the
# fusibile-distinguishing semantics — used-pixel dedup, the exact averaged
# position, and the disparity-threshold boundary — are derivable by hand and
# asserted exactly, not just cross-checked against our own jit path.
# ---------------------------------------------------------------------------

_F, _BASE, _D = 60.0, 0.3, 10.0  # focal, per-view x-baseline, plane depth


def _unproject(v, px, py, d):
    """Replicates fusion.cc::unproject for the make_plane_scene cameras:
    camera v's center is at x = _BASE*v, axis-aligned."""
    x = (px + 0.5 - 20.0) / _F * d + _BASE * v
    y = (py + 0.5 - 16.0) / _F * d
    return np.array([x, y, d])


def test_used_pixel_dedup_exact_count_and_position():
    """One surface patch seen by 3 views -> exactly ONE output point (the
    dedup that distinguishes fusibile from the averaging path), at exactly
    the mean of the three views' own unprojections.

    Derivation: ref pixel (x=10, y=16) at depth 10 unprojects to P; in view v
    the projection shifts by f*B*v/d = 1.8v px, so u = 10.5 - 1.8v lands in
    pixel floor(u): view1 -> 8 (u=8.7), view2 -> 6 (u=6.9). Those two pixels
    carry depth 10 (dproj == ds == 10 -> disp_diff = 0, consistent at any
    threshold); every other pixel is 0. After ref=0 emits the fused point,
    views 1/2's pixels are marked used, so refs 1/2 emit nothing."""
    V, H, W = 3, 32, 40
    _, cams, colors = make_plane_scene(V=V, H=H, W=W)
    depths = np.zeros((V, H, W), dtype=np.float32)
    px, py = 10, 16
    depths[0, py, px] = _D
    depths[1, py, 8] = _D
    depths[2, py, 6] = _D

    pts, cols = fuse_depth_maps_native(
        depths, cams, colors, disp_thresh=1.0, num_consistent=2
    )
    assert len(pts) == 1, f"dedup must emit exactly one point, got {len(pts)}"
    expect = (
        _unproject(0, px, py, _D) + _unproject(1, 8, py, _D) + _unproject(2, 6, py, _D)
    ) / 3.0
    np.testing.assert_allclose(pts[0], expect, rtol=1e-5)

    # without enough consensus the same scene emits nothing
    pts3, _ = fuse_depth_maps_native(
        depths, cams, colors, disp_thresh=1.0, num_consistent=3
    )
    assert len(pts3) == 0


def test_disp_thresh_boundary_exact():
    """Two views, one correspondence whose disparity residual is constructed
    to be exactly 0.5 px: disp_diff = f*B*|1/dproj - 1/ds|, so ds solving
    1/ds = 1/d + 0.5/(f*B) gives residual 0.5. fusibile's test is strict
    (consistent iff disp_diff < thresh): 0.51 accepts, 0.49 rejects."""
    V, H, W = 2, 32, 40
    _, cams, colors = make_plane_scene(V=V, H=H, W=W)
    depths = np.zeros((V, H, W), dtype=np.float32)
    px, py = 10, 16
    ds = 1.0 / (1.0 / _D + 0.5 / (_F * _BASE))  # ~7.826
    depths[0, py, px] = _D
    # ref pixel projects into view1 at u = 10.5 - 1.8 -> pixel 8
    depths[1, py, 8] = ds

    accept, _ = fuse_depth_maps_native(
        depths, cams, colors, disp_thresh=0.51, num_consistent=1
    )
    reject, _ = fuse_depth_maps_native(
        depths, cams, colors, disp_thresh=0.49, num_consistent=1
    )
    assert len(accept) == 1 and len(reject) == 0, (len(accept), len(reject))


def test_threshold_direction_dominates_dedup_jitter():
    """Acceptance direction on a noisy plane: MORE points at looser
    disp_thresh, FEWER at higher num_consistent.

    The emitted count is NOT strictly monotone in either knob under
    fusibile's used-pixel dedup: a looser threshold marks more src pixels
    used, which can merge points a stricter run emits separately from later
    ref views (observed: 1217 pts at t=0.05 vs 1216 at t=0.2 on a
    noise=0.02 plane). So this test uses noise large enough that the
    acceptance effect (hundreds of points) dominates the ±few-point dedup
    coupling, and allows that slack per step. The exact dedup/threshold
    semantics are pinned by the constructed-truth tests above."""
    depths, cams, colors = make_plane_scene(V=4, noise=0.3, seed=3)
    # dedup coupling: more acceptance -> more merging, so allow ~2% per step
    slack = lambda c: max(8, int(0.02 * c))
    counts_t = [
        len(fuse_depth_maps_native(depths, cams, colors, disp_thresh=t, num_consistent=2)[0])
        for t in (0.05, 0.5, 2.0, 8.0)
    ]
    assert all(b >= a - slack(a) for a, b in zip(counts_t, counts_t[1:])), counts_t
    assert max(counts_t) > counts_t[0] + 100, counts_t
    counts_n = [
        len(fuse_depth_maps_native(depths, cams, colors, disp_thresh=0.5, num_consistent=n)[0])
        for n in (1, 2, 3)
    ]
    assert all(b <= a + slack(a) for a, b in zip(counts_n, counts_n[1:])), counts_n
    assert counts_n[-1] < counts_n[0] - 100, counts_n
    assert counts_n[0] > 0
