"""DTU scorer tests on synthetic geometry with known distances."""

import numpy as np
import pytest

from cds_mvsnet_tpu.eval.dtu_benchmark import nn_distances, reduce_points, evaluate_scan
from cds_mvsnet_tpu.io.ply import write_ply


def _greedy_reference(pts, dst, seed):
    """Brute-force reducePts_haa.m: survivor iff no earlier survivor within
    dst, visiting in the seeded random order."""
    order = np.random.default_rng(seed).permutation(len(pts))
    kept = []
    for i in order:
        p = pts[i]
        if all(np.linalg.norm(p - pts[j]) > dst for j in kept):
            kept.append(i)
    return pts[np.sort(kept)]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("chunk", [64, 10_000])  # force cross-chunk paths
def test_reduce_points_matches_greedy_reference(seed, chunk):
    rng = np.random.default_rng(7 + seed)
    pts = rng.uniform(0, 1.0, (900, 3))
    got = reduce_points(pts, dst=0.2, seed=seed, chunk=chunk)
    want = _greedy_reference(pts, dst=0.2, seed=seed)
    np.testing.assert_array_equal(got, want)


def test_reduce_points_enforces_density():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1.0, (5000, 3))
    red = reduce_points(pts, dst=0.2)
    assert len(red) < len(pts)
    # exact reducePts semantics: min pairwise distance > dst
    from scipy.spatial import cKDTree

    assert len(cKDTree(red).query_pairs(0.2)) == 0


def test_nn_distances_exact():
    a = np.array([[0.0, 0, 0], [1, 0, 0]])
    b = np.array([[0.0, 0, 0.5], [5, 0, 0]])
    d = nn_distances(a, b, max_dist=60)
    np.testing.assert_allclose(d, [0.5, np.sqrt(1 + 0.25)], atol=1e-9)
    # clipping
    d = nn_distances(np.array([[100.0, 0, 0]]), b, max_dist=60)
    assert d[0] == 60


def test_evaluate_scan_synthetic(tmp_path):
    """Plane of GT points; prediction = GT shifted by 0.1 mm + outliers."""
    scipy_io = pytest.importorskip("scipy.io")
    rng = np.random.default_rng(1)
    xs, ys = np.meshgrid(np.linspace(0, 20, 50), np.linspace(0, 20, 50))
    gt = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, 5.0)], -1)

    pred = gt + np.array([0, 0, 0.1])
    outliers = rng.uniform(0, 20, (100, 3)) + np.array([0, 0, 100.0])  # >20mm away
    pred_all = np.concatenate([pred, outliers])

    gt_dir = tmp_path / "gt"
    (gt_dir / "Points" / "stl").mkdir(parents=True)
    (gt_dir / "ObsMask").mkdir(parents=True)
    write_ply(gt_dir / "Points" / "stl" / "stl001_total.ply", gt.astype(np.float32))
    (tmp_path / "pred").mkdir()
    write_ply(tmp_path / "pred" / "scan1.ply", pred_all.astype(np.float32))

    # observability mask covering the full plane region; resolution 1mm
    bb = np.array([[-1.0, -1.0, -1.0], [22.0, 22.0, 110.0]])
    shape = np.ceil((bb[1] - bb[0]) / 1.0).astype(int) + 2
    obs = np.ones(shape, dtype=np.uint8)
    scipy_io.savemat(
        gt_dir / "ObsMask" / "ObsMask1_10.mat",
        {"ObsMask": obs, "BB": bb, "Res": 1.0},
    )
    scipy_io.savemat(gt_dir / "ObsMask" / "Plane1.mat", {"P": np.array([0, 0, 1.0, -1.0])})

    r = evaluate_scan(str(tmp_path / "pred" / "scan1.ply"), str(gt_dir), 1)
    # accuracy ≈ 0.1mm (outliers discarded by the 20mm cutoff)
    assert abs(r.acc_mean - 0.1) < 0.02, r
    # completeness ≈ 0.1mm too (GT near-covered; 0.2mm reduction adds noise)
    assert abs(r.comp_mean - 0.1) < 0.05, r
